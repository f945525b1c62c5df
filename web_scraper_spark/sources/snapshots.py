"""Snapshot-committed tables: an Iceberg-style layer over plain parquet.

The production design is Apache Iceberg (snapshot commits, MERGE INTO,
partition pruning, time travel). The Iceberg runtime jar is not in this
sandbox, so this module implements the same *semantics* with manifests over
immutable parquet files — the engine code above it (plans/crawl.py) only
talks to this interface, so swapping in real Iceberg is a one-module change
(see ``ICEBERG_NOTES`` below).

Layout per table::

    root/
      data/<uuid>/...parquet     immutable file groups, never rewritten
      manifests/v{N}.json        {"version": N, "entries": [{"path", "bucket"}]}
      _latest                    text file: latest committed version

Commit protocol (single-writer, like the reference's tmp-file + os.replace
at new/progress_manager.py:99-113, but table-level): write data files →
write manifest vN.json → atomically replace ``_latest``. A crash before the
``_latest`` flip leaves the previous snapshot intact (orphan files are
harmless and collectable).

Three write modes map to the three state-table shapes (SURVEY.md §1.2):

  * ``commit_overwrite`` — full replace (seeding).
  * ``commit_append``    — append-only logs: seen, payload, metrics.
  * ``commit_merge_buckets`` — replace only the named buckets (frontier,
    bucketed by priority): per micro-batch only the touched priority
    buckets are rewritten; every other bucket's files are *referenced*,
    not copied — exactly Iceberg's manifest-reuse. At a 10^10-row frontier
    this is the difference between O(batch) and O(frontier) write cost.

``read`` unions the manifest's file groups. Reads of a log-structured
upsert table (failures) resolve latest-record-wins via a window — Iceberg's
merge-on-read.

ICEBERG_NOTES: with iceberg-spark-runtime on the classpath the equivalents
are ``df.writeTo(t).createOrReplace()`` / ``.append()`` /
``MERGE INTO t USING batch ON t.url_hash = batch.url_hash WHEN MATCHED
UPDATE ... WHEN NOT MATCHED INSERT ...`` with the table partitioned by
``bucket(N, priority)``, and resume = ``spark.read.option("snapshot-id",
...)``.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.root = os.path.join(root, name)
        self.name = name
        # snapshot schemas are commit-invariant (append/merge preserve
        # them), so one inference pays for every subsequent read — an
        # engine micro-batch reads ~8 tables, and each uncached
        # spark.read.parquet costs a footer-inference pass per call
        self._schema_cache = None
        os.makedirs(os.path.join(self.root, "data"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "manifests"), exist_ok=True)

    # ------------------------------------------------------------ versions

    def latest_version(self) -> int:
        p = os.path.join(self.root, "_latest")
        if not os.path.exists(p):
            return 0
        with open(p) as f:
            return int(f.read().strip())

    def _manifest(self, version: int) -> dict:
        if version == 0:
            return {"version": 0, "entries": []}
        with open(os.path.join(self.root, "manifests", f"v{version}.json")) as f:
            return json.load(f)

    def _commit_manifest(self, entries: list[dict]) -> int:
        v = self.latest_version() + 1
        mpath = os.path.join(self.root, "manifests", f"v{v}.json")
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": v, "entries": entries}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, mpath)
        ltmp = os.path.join(self.root, "_latest.tmp")
        with open(ltmp, "w") as f:
            f.write(str(v))
            f.flush()
            os.fsync(f.fileno())
        os.replace(ltmp, os.path.join(self.root, "_latest"))
        return v

    def _write_group(self, df: DataFrame) -> str:
        path = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.mode("errorifexists").parquet(path)
        return path

    # ------------------------------------------------------------- writes

    def commit_overwrite(self, df: DataFrame, origin: str | None = None) -> int:
        return self._commit_manifest(
            [{"path": self._write_group(df), "bucket": None, "origin": origin}]
        )

    def commit_append(
        self, df: DataFrame, base_version: int | None = None, origin: str | None = None
    ) -> int:
        """Append a file group on top of ``base_version`` (default: latest).

        Callers that coordinate multiple tables through a checkpoint MUST
        pass their checkpointed version: after a crash mid-batch the table's
        ``latest`` may be an orphan commit no checkpoint references, and
        appending on top of it would resurrect the orphan's rows.
        """
        base = self.latest_version() if base_version is None else base_version
        entries = list(self._manifest(base)["entries"])
        entries.append({"path": self._write_group(df), "bucket": None, "origin": origin})
        return self._commit_manifest(entries)

    def _write_bucketed(
        self, df: DataFrame, bucket_col: str, origin: str | None = None
    ) -> list[dict]:
        """One ``df.write.partitionBy(bucket)`` job → one manifest entry per
        bucket subdir. The bucket column is directory-encoded (dropped from
        data files), exactly parquet/Iceberg partition layout."""
        base = os.path.join(self.root, "data", uuid.uuid4().hex)
        df.write.partitionBy(bucket_col).parquet(base)
        entries = []
        for d in os.listdir(base):
            if d.startswith(f"{bucket_col}="):
                entries.append(
                    {
                        "path": os.path.join(base, d),
                        "bucket": int(d.split("=", 1)[1]),
                        "origin": origin,
                    }
                )
        return entries

    def commit_overwrite_bucketed(
        self, df: DataFrame, bucket_col: str, origin: str | None = None
    ) -> int:
        return self._commit_manifest(self._write_bucketed(df, bucket_col, origin))

    def commit_merge_buckets(
        self,
        df: DataFrame,
        bucket_col: str,
        bucket_values: list,
        base_version: int | None = None,
        origin: str | None = None,
    ) -> int:
        """Replace the named buckets; re-reference every other file group
        untouched (Iceberg manifest reuse — O(batch) write cost, not
        O(table)). ``df`` must contain exactly the new contents of those
        buckets, including ``bucket_col``. The previous snapshot must be
        bucketed (commit_overwrite_bucketed) — a bucket-less file group
        would silently duplicate rows, so it is an error. Pass the
        checkpointed ``base_version`` when coordinating via a checkpoint
        (see commit_append)."""
        base = self.latest_version() if base_version is None else base_version
        prev = self._manifest(base)["entries"]
        if any(e["bucket"] is None for e in prev):
            raise ValueError(
                f"{self.name}: merge requires a bucketed snapshot; "
                "seed with commit_overwrite_bucketed"
            )
        changed = set(bucket_values)
        entries = [e for e in prev if e["bucket"] not in changed]
        entries.extend(self._write_bucketed(df, bucket_col, origin))
        return self._commit_manifest(entries)

    def truncate(self) -> int:
        """Commit an empty snapshot (zero file groups) — the table reads as
        None afterwards. Metadata-only: no data files are written or
        deleted (vacuum collects the now-unreferenced groups later). Used
        by the filter delta journal: folding the journal into the base
        bitsets truncates the journal in the same checkpoint."""
        return self._commit_manifest([])

    # -------------------------------------------------------- maintenance

    def compact(
        self,
        spark: SparkSession,
        base_version: int | None = None,
        target_partitions: int | None = None,
        origin: str = "compact",
    ) -> int:
        """Small-file compaction (Iceberg's ``rewrite_data_files``): rewrite
        the live snapshot's N file groups into one fresh group and commit it
        as a new version. Row-preserving — the row multiset is unchanged, so
        append-log and merge-on-read (upsert) semantics are identical; only
        the file layout improves. An append log grows one group per
        micro-batch (seen/payload/schedule_log), so after 10^4 batches a
        read unions 10^4 groups of small files — compaction resets that to
        one. Bucketed tables are rejected: ``commit_merge_buckets`` already
        rewrites whole buckets, so each bucket is exactly one group and
        there is nothing to merge. ``target_partitions`` additionally
        coalesces the write (fewer, larger parquet files). Returns the new
        version (or the base version untouched when ≤1 group)."""
        base = self.latest_version() if base_version is None else base_version
        entries = self._manifest(base)["entries"]
        if any(e["bucket"] is not None for e in entries):
            raise ValueError(
                f"{self.name}: bucketed snapshots hold one group per bucket; "
                "compaction targets append logs"
            )
        if len(entries) <= 1:
            return base
        df = spark.read.parquet(*[e["path"] for e in entries])
        if target_partitions is not None:
            df = df.coalesce(target_partitions)
        return self._commit_manifest(
            [{"path": self._write_group(df), "bucket": None, "origin": origin}]
        )

    def vacuum(self, keep_from_version: int) -> dict:
        """Expire snapshots older than ``keep_from_version`` and delete every
        data file group no kept manifest references — including
        crash-orphaned groups that were written but never committed (the
        commit protocol makes those harmless; this is where they are
        collected). Re-referenced groups are safe: a group stays on disk as
        long as ANY kept manifest lists it.

        Single-writer operation, like commits: run it from the quiesced
        writer, and pass a horizon no live checkpoint still needs —
        ``CrawlEngine.vacuum_state`` computes that from its checkpoint log.
        Time travel below the horizon is gone afterwards. Metadata + file
        ops only; no Spark jobs. Returns ``{"dropped_versions": n,
        "removed_groups": n}``."""
        import shutil

        latest = self.latest_version()
        keep_from = max(1, min(keep_from_version, latest))
        kept: set[str] = set()
        for v in range(keep_from, latest + 1):
            # a version inside the keep range may already be gone: an
            # earlier vacuum with a HIGHER horizon expired it (e.g.
            # vacuum_state(keep_checkpoints=1) then later a deeper
            # keep_checkpoints=3). Nothing to reference from it — skip.
            mp = os.path.join(self.root, "manifests", f"v{v}.json")
            if v != 0 and not os.path.exists(mp):
                continue
            kept |= {e["path"] for e in self._manifest(v)["entries"]}
        dropped_versions = 0
        for v in range(1, keep_from):
            mp = os.path.join(self.root, "manifests", f"v{v}.json")
            if os.path.exists(mp):
                os.remove(mp)
                dropped_versions += 1
        removed_groups = 0
        data_root = os.path.join(self.root, "data")
        for d in os.listdir(data_root):
            base = os.path.join(data_root, d)
            if base in kept:
                continue
            # bucketed layout: bucket=K subdirs are referenced individually;
            # drop only the unreferenced ones (keep base-level _SUCCESS etc.)
            subs = (
                [os.path.join(base, s) for s in os.listdir(base) if "=" in s]
                if os.path.isdir(base)
                else []
            )
            live = [s for s in subs if s in kept]
            if live:
                for s in subs:
                    if s not in kept:
                        shutil.rmtree(s)
                        removed_groups += 1
            else:
                shutil.rmtree(base)
                removed_groups += 1
        return {"dropped_versions": dropped_versions, "removed_groups": removed_groups}

    # ------------------------------------------------------------ lineage

    def lineage(self, version: int | None = None) -> list[dict]:
        """Per-partition lineage from snapshot metadata (north star; SURVEY
        ST8): which commit wrote each live file group of ``version``.
        Re-referenced entries keep the origin of the commit that created
        them — exactly Iceberg's manifest provenance. Metadata-only:
        O(entries), no data files touched."""
        v = self.latest_version() if version is None else version
        if v == 0:
            return []
        return [
            {
                "table": self.name,
                "version": v,
                "path": e["path"],
                "bucket": e.get("bucket"),
                "origin": e.get("origin"),
            }
            for e in self._manifest(v)["entries"]
        ]

    # -------------------------------------------------------------- reads

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame | None:
        """Read a snapshot (latest by default; pass ``version`` for time
        travel). Returns None for an empty/never-committed table."""
        v = self.latest_version() if version is None else version
        paths = [e["path"] for e in self._manifest(v)["entries"]]
        if not paths:
            return None
        return self._read_paths(spark, paths)

    def _read_paths(self, spark: SparkSession, paths: list[str]) -> DataFrame:
        if self._schema_cache is not None:
            return spark.read.schema(self._schema_cache).parquet(*paths)
        df = spark.read.parquet(*paths)
        self._schema_cache = df.schema
        return df

    def read_buckets(
        self, spark: SparkSession, buckets: list, version: int | None = None
    ) -> DataFrame | None:
        """Manifest-level partition pruning: read ONLY the named buckets'
        file groups (Iceberg's partition-pruned scan). A bucketed table at
        10^10 rows serves an O(batch-buckets) read here where ``read``
        would union all 64 bucket groups. Returns None when none of the
        buckets have data. Schema matches ``read`` (the bucket column is
        directory-encoded and not part of the data files)."""
        v = self.latest_version() if version is None else version
        wanted = set(buckets)
        paths = [
            e["path"]
            for e in self._manifest(v)["entries"]
            if e["bucket"] is not None and e["bucket"] in wanted
        ]
        if not paths:
            return None
        return self._read_paths(spark, paths)

    def read_changes(
        self, spark: SparkSession, from_version: int, to_version: int
    ) -> DataFrame | None:
        """Incremental (CDC-style) read: the rows of file groups added
        AFTER ``from_version`` up to and including ``to_version`` — the
        append delta, resolved from manifests alone (Iceberg's incremental
        scan). A downstream consumer tailing payload_out reads each
        batch's new rows at O(delta), never rescanning the log.

        Contract: valid only across an append-only span. If any group
        live at ``from_version`` is gone at ``to_version`` (compaction,
        overwrite, requeue rewrote the table), the path diff is no longer
        a row-level append stream — raises ValueError; consumers restart
        their cursor from a fresh full read after maintenance, exactly
        like Iceberg's changelog scan across a rewrite."""
        old = {e["path"] for e in self._manifest(from_version)["entries"]}
        new_entries = self._manifest(to_version)["entries"]
        missing = old - {e["path"] for e in new_entries}
        if missing:
            raise ValueError(
                f"{self.name}: non-append history between v{from_version} and "
                f"v{to_version} ({len(missing)} group(s) rewritten) — restart "
                "the CDC cursor with a full read"
            )
        paths = [e["path"] for e in new_entries if e["path"] not in old]
        if not paths:
            return None
        return self._read_paths(spark, paths)

    def read_upsert_log(
        self, spark: SparkSession, key: str, order_col: str, version: int | None = None
    ) -> DataFrame | None:
        """Merge-on-read for an append-log upsert table: latest record per
        key wins (ordered by ``order_col`` desc)."""
        from pyspark.sql import Window

        df = self.read(spark, version)
        if df is None:
            return None
        w = Window.partitionBy(key).orderBy(F.col(order_col).desc())
        return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


class CheckpointLog:
    """Multi-table atomic checkpoint: one JSON per batch recording every
    table's committed version + scheduler counters. Resume = read the last
    checkpoint and open each table at exactly that version — tables that
    committed after the last checkpoint (crash mid-batch) are simply not
    visible, giving all-or-nothing batch semantics (the reference's resume
    re-reads progress.json, main_scraper.py:219-355; here it is
    transactional)."""

    def __init__(self, root: str):
        self.dir = os.path.join(root, "checkpoints")
        os.makedirs(self.dir, exist_ok=True)

    def latest(self) -> dict | None:
        ids = self._ids()
        if not ids:
            return None
        with open(os.path.join(self.dir, f"ck_{ids[-1]:09d}.json")) as f:
            return json.load(f)

    def all(self) -> list[dict]:
        out = []
        for i in self._ids():
            with open(os.path.join(self.dir, f"ck_{i:09d}.json")) as f:
                out.append(json.load(f))
        return out

    def get(self, batch_id: int) -> dict | None:
        """The checkpoint committed for ``batch_id`` (None if absent —
        never written, or vacuumed past)."""
        path = os.path.join(self.dir, f"ck_{batch_id:09d}.json")
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def _ids(self) -> list[int]:
        return sorted(
            int(f[3:-5]) for f in os.listdir(self.dir) if f.startswith("ck_") and f.endswith(".json")
        )

    def commit(self, batch_id: int, state: dict) -> None:
        path = os.path.join(self.dir, f"ck_{batch_id:09d}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, **state}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)
