"""Streaming seed ingestion: a Structured Streaming bridge feeding new
site-graph rows into a RUNNING crawl.

The reference only ever learns about new pages by being restarted — the
service wrapper re-runs discovery from scratch on every start
(scraper_service.py:105-143, new/main_scraper.py:184-232). At 10^10-URL
scale a crawl never restarts; new work arrives continuously (a sitemap
refresh, a partner feed, another crawler's discoveries). This module is
that arrival path: a file-source stream of site-graph deltas whose every
micro-batch lands in the frontier through ``CrawlEngine.add_seeds``.

Crash contract — exactly-once via batch-id fencing, the same shape as
streaming/sketches.py but with the fence stored IN the engine checkpoint:
``add_seeds`` commits the frontier append and the
``seed_stream_batch_id`` fence in one checkpoint write, so a foreachBatch
replay after a crash (Spark guarantees only at-least-once for sink
functions) observes ``batch_id <= fence`` and skips — the frontier can
never double-append, even if the stream's own checkpoint directory is
lost entirely (the fence survives in engine state, which is the source of
truth).

Interleaving contract: the engine is single-writer by design, so seed
ingestion and crawl batches alternate — ``crawl_with_seed_stream`` drains
newly-arrived files (availableNow trigger), runs the crawl to frontier
exhaustion, and repeats until a round sees neither new seeds nor crawl
work. On a cluster the same loop runs forever with a blocking trigger;
the availableNow form is also exactly what a test can drive
deterministically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..schemas import SITE_GRAPH_SCHEMA


def seed_stream_pass(
    spark: SparkSession,
    engine,
    seed_dir: str,
    stream_checkpoint_dir: str,
) -> int:
    """One availableNow pass over ``seed_dir``: every seed file not yet
    consumed by the stream checkpoint is ingested into the frontier,
    exactly-once (see module docstring). Returns URLs actually added
    (post canonicalize/dedup/anti-join), 0 for an empty pass or a pure
    replay."""
    added = {"n": 0}

    def _ingest(batch_df, batch_id: int) -> None:
        ck = engine.checkpoints.latest()
        if ck is None:
            raise RuntimeError("seed_stream: engine not initialized")
        fence = int(ck.get("seed_stream_batch_id", -1))
        if int(batch_id) <= fence:
            return  # replayed batch — its frontier commit is already checkpointed
        out = engine.add_seeds(
            batch_df.sparkSession,
            batch_df,
            extra_state={"seed_stream_batch_id": int(batch_id)},
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
