"""Streaming seed ingestion: a Structured Streaming bridge feeding new
site-graph rows into a RUNNING crawl.

The reference only ever learns about new pages by being restarted — the
service wrapper re-runs discovery from scratch on every start
(scraper_service.py:105-143, new/main_scraper.py:184-232). At 10^10-URL
scale a crawl never restarts; new work arrives continuously (a sitemap
refresh, a partner feed, another crawler's discoveries). This module is
that arrival path: a file-source stream of site-graph deltas whose every
micro-batch lands in the frontier through ``CrawlEngine.add_seeds``.

Crash contract — effectively-once, two layers:

1. **Lineage-scoped batch-id fence** (fast path): ``add_seeds`` commits
   the frontier append and the (stream query id, batch id) fence in one
   engine checkpoint write. A foreachBatch replay after a crash (Spark
   guarantees only at-least-once for sink functions) observes the SAME
   query lineage id with ``batch_id <= fence`` and skips without
   touching the frontier. The query id comes from the stream
   checkpoint's own ``metadata`` file — within one checkpoint lineage,
   batch ids are monotonic and an id is only ever re-delivered with
   already-committed input, so the skip is sound.
2. **Idempotent fall-through** (safety net): if the stream checkpoint
   directory is lost/recreated, Spark renumbers batches from 0 under a
   NEW query id — a raw batch-id fence would silently drop batches that
   contain genuinely new seed files until the new counter passed the
   stored fence (at-most-once). Instead, a lineage mismatch (or an
   unreadable metadata file) falls through to ``add_seeds``, whose
   url_hash anti-join against the whole frontier makes re-delivered
   rows a no-op (added == 0) while new rows land normally. Frontier
   STATE is exactly-once; only the wasted work on a replay is
   at-least-once.

Interleaving contract: the engine is single-writer by design, so seed
ingestion and crawl batches alternate — ``crawl_with_seed_stream`` drains
newly-arrived files (availableNow trigger), runs the crawl to frontier
exhaustion, and repeats until a round sees neither new seeds nor crawl
work. On a cluster the same loop runs forever with a blocking trigger;
the availableNow form is also exactly what a test can drive
deterministically.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from ..schemas import SITE_GRAPH_SCHEMA


def _stream_query_id(stream_checkpoint_dir: str) -> str | None:
    """The stream checkpoint's query lineage id (its ``metadata`` file,
    written at query start). A fresh/recreated checkpoint dir gets a new
    id — that is the renumbering signal the fence must scope to. Returns
    None when unreadable (non-local checkpoint store, torn write): the
    caller must then take the conservative idempotent path, so an
    unreadable file can never cause data loss."""
    try:
        with open(os.path.join(stream_checkpoint_dir, "metadata")) as f:
            return json.load(f).get("id")
    except (OSError, ValueError):
        return None


def seed_stream_pass(
    spark: SparkSession,
    engine,
    seed_dir: str,
    stream_checkpoint_dir: str,
) -> int:
    """One availableNow pass over ``seed_dir``: every seed file not yet
    consumed by the stream checkpoint is ingested into the frontier,
    effectively-once (see module docstring). Returns URLs actually added
    (post canonicalize/dedup/anti-join), 0 for an empty pass or a pure
    replay."""
    added = {"n": 0}

    def _ingest(batch_df, batch_id: int) -> None:
        ck = engine.checkpoints.latest()
        if ck is None:
            raise RuntimeError("seed_stream: engine not initialized")
        fence = int(ck.get("seed_stream_batch_id", -1))
        qid = _stream_query_id(stream_checkpoint_dir)
        same_lineage = (
            qid is not None and qid == ck.get("seed_stream_query_id")
        )
        if same_lineage and int(batch_id) <= fence:
            return  # same-lineage replay — its frontier commit is already checkpointed
        # New batch, OR a renumbered/unknown lineage (checkpoint dir
        # recreated): fall through — add_seeds' url_hash anti-join makes
        # re-delivered rows a no-op while new files' rows land.
        out = engine.add_seeds(
            batch_df.sparkSession,
            batch_df,
            extra_state={
                "seed_stream_batch_id": int(batch_id),
                "seed_stream_query_id": qid,
            },
        )
        added["n"] += int(out["added"])

    q = (
        spark.readStream.schema(SITE_GRAPH_SCHEMA)
        .parquet(seed_dir)
        .writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", stream_checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return added["n"]


def crawl_with_seed_stream(
    spark: SparkSession,
    engine,
    seed_dir: str,
    stream_checkpoint_dir: str,
    max_rounds: int = 100,
    on_round=None,
) -> list[dict]:
    """Continuous crawl: alternate seed ingestion and crawl batches until
    a round ingests nothing and the frontier is drained. ``on_round`` (if
    given) is called with the round index after each ingest+run cycle —
    the test hook that drops the next seed files "mid-crawl"."""
    rounds = []
    idle = 0
    for i in range(max_rounds):
        n = seed_stream_pass(spark, engine, seed_dir, stream_checkpoint_dir)
        out = engine.run(spark)
        rounds.append({"ingested_urls": n, "crawl_batches": len(out)})
        if on_round is not None:
            on_round(i)
        if n == 0 and not out:
            # one grace round so files dropped by on_round after an idle
            # cycle are still picked up before the loop concludes
            idle += 1
            if idle >= 2 or on_round is None:
                break
        else:
            idle = 0
    return rounds
