"""Incremental materialized-view maintenance over the engine's CDC feed.

The reference recomputes its stats by re-reading everything it ever wrote
(results_summary / folder rescan, main_scraper.py:1018-1040); at 100 TB a
"per-format image census" must instead be MAINTAINED: each engine batch
appends O(batch) payload rows, so the view refresh should cost O(batch),
not O(corpus). This module does classic incremental view maintenance for
distributive aggregates (count / sum — self-mergeable by addition) on top
of ``CrawlEngine.changes_between`` (the manifest-diff CDC read):

  refresh = old view  ∪  groupBy(delta)  →  re-aggregate by key

Cursor contract: the CDC feed is append-only between checkpoints; a
maintenance rewrite (compact_state, requeue — requeue RETRACTS payload
rows) makes ``changes_between`` raise, and the view falls back to a full
rebuild with a fresh cursor — the Iceberg-changelog restart semantics,
exercised in tests/test_incremental.py.

Crash contract: the parquet for version n is written to its own subdir
first; ``state.json`` (cursor batch + live data dir) is then swapped via
tmp-file + ``os.replace`` — a crash mid-refresh leaves the previous
consistent (cursor, data) pair visible. Re-running refresh at an
unchanged cursor is a no-op, so the maintenance loop is idempotent.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class MaterializedRollup:
    """Per-format payload census (n_images, total_bytes by fmt) kept
    current against a running engine at O(new rows) per refresh."""

    def __init__(self, view_dir: str, table: str = "payload_out", key: str = "fmt"):
        self.view_dir = view_dir
        self.table = table
        self.key = key
        os.makedirs(view_dir, exist_ok=True)

    # -- state ----------------------------------------------------------
    def _state(self) -> dict | None:
        p = os.path.join(self.view_dir, "state.json")
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _publish(self, df: DataFrame, cursor_batch: int) -> str:
        st = self._state()
        gen = 0 if st is None else st["gen"] + 1
        data_dir = os.path.join(self.view_dir, f"v{gen}")
        df.coalesce(1).write.mode("overwrite").parquet(data_dir)
        tmp = os.path.join(self.view_dir, "state.json.tmp")
        with open(tmp, "w") as f:
            json.dump({"gen": gen, "cursor_batch": cursor_batch}, f)
        os.replace(tmp, os.path.join(self.view_dir, "state.json"))  # atomic
        if st is not None:
            shutil.rmtree(
                os.path.join(self.view_dir, f"v{st['gen']}"), ignore_errors=True
            )
        return data_dir

    # -- aggregation ----------------------------------------------------
    def _agg(self, rows: DataFrame) -> DataFrame:
        return rows.groupBy(F.col(self.key)).agg(
            F.count("*").cast("long").alias("n_images"),
            F.coalesce(F.sum(F.length("bytes")), F.lit(0)).cast("long").alias(
                "total_bytes"
            ),
        )

    def _remerge(self, parts: DataFrame) -> DataFrame:
        return parts.groupBy(self.key).agg(
            F.sum("n_images").cast("long").alias("n_images"),
            F.sum("total_bytes").cast("long").alias("total_bytes"),
        )

    # -- public ---------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame | None:
        st = self._state()
        if st is None:
            return None
        return spark.read.parquet(os.path.join(self.view_dir, f"v{st['gen']}"))

    def refresh(self, spark: SparkSession, engine) -> dict:
        """Advance the view to the engine's latest checkpoint. Returns
        {"mode": "noop"|"delta"|"full", "cursor_batch": int}."""
        latest = engine.checkpoints.latest()
        if latest is None:
            raise RuntimeError("refresh: engine has no checkpoint")
        to_batch = int(latest["batch_id"])
        st = self._state()

        if st is not None and st["cursor_batch"] == to_batch:
            return {"mode": "noop", "cursor_batch": to_batch}

        mode = "full"
        if st is not None:
            try:
                delta = engine.changes_between(
                    spark, self.table, st["cursor_batch"], to_batch
                )
                old = self.read(spark)
                if delta is None:
                    new_view = old
                else:
                    new_view = self._remerge(old.unionByName(self._agg(delta)))
                mode = "delta"
            except ValueError:
                # maintenance rewrote the table (compact/requeue retraction)
                # — the append cursor is void; rebuild and restart it
                st = None
        if st is None:
            t = getattr(engine, self.table)
            ver = int(latest["versions"][self.table])
            rows = t.read(spark, ver)
            empty = self._agg(
                spark.createDataFrame([], f"{self.key} string, bytes binary")
            )
            new_view = self._agg(rows) if rows is not None else empty
        self._publish(new_view, to_batch)
        return {"mode": mode, "cursor_batch": to_batch}
