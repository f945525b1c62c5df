"""Incrementally-maintained mergeable sketches over a document stream.

The batch sketches (analytics: q_cms_heavy_hitters, q_hll_distinct,
q_quantile_sketch) advertise merge-by-addition as their defining scale
property; this module cashes that property in for a continuously-arriving
corpus: a Structured Streaming ``foreachBatch`` sink folds each
micro-batch's partial count-min sketch into a persistent sketch file, so
"token frequency right now" costs O(d·w) per batch forever — never a
recompute over history. The reference has no streaming surface (its stats
are end-of-run prints, results_summary in main_scraper.py:1018-1040); this
is the shape those stats take when the crawl never ends.

Crash contract — exactly-once via batch-id fencing: foreachBatch may
REPLAY a batch after a failure (Spark guarantees at-least-once for the
sink fn). The sketch state is a single JSON blob holding BOTH the counter
grid and the highest applied batch_id, written via tmp-file + os.replace
(atomic on POSIX): a replayed batch_id ≤ last is skipped, and a crash
between compute and publish leaves the previous consistent state. One
file, one rename — no torn merge is observable.

The per-batch partial sketch is computed DISTRIBUTED (the same
groupBy(row_j, bucket) map-side-combine plan as the batch query) and only
the ≤ d·w = 128 counter rows reach the driver — bounded by sketch
geometry, not by data, the same bounded-by-design collect class as the
engine's cutoff ranges.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..analytics import _CMS_D, _CMS_W, _cms_bucket

_STATE_FILE = "cms_state.json"


def cms_partial_sketch(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(row_j, bucket, c) partial sketch of one batch — identical
    tokenization and salted-md5 bucketing to q_cms_heavy_hitters, so
    streamed and batch sketches are the same mathematical object."""
    toks = docs.select(
        F.explode(F.split(F.col(text_col), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    buckets = F.array(*[_cms_bucket(j, F.col("tok")) for j in range(_CMS_D)])
    return (
        toks.select(F.posexplode(buckets).alias("row_j", "bucket"))
        .groupBy("row_j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def _state_path(state_dir: str) -> str:
    return os.path.join(state_dir, _STATE_FILE)


def read_cms_state(state_dir: str) -> tuple[int, list[int]]:
    """(last applied batch_id, row-major d×w counter grid). (-1, zeros)
    before the first merge."""
    p = _state_path(state_dir)
    if not os.path.exists(p):
        return -1, [0] * (_CMS_D * _CMS_W)
    with open(p) as f:
        st = json.load(f)
    return int(st["batch_id"]), list(st["counters"])


def cms_estimate(state_dir: str, token: str) -> int:
    """Point-frequency estimate from the persisted sketch: min over the d
    rows' counters at the token's salted buckets (driver-side — the
    sketch is 128 ints; no Spark job to answer a lookup)."""
    import hashlib

    _, counters = read_cms_state(state_dir)
    est = None
    for j in range(_CMS_D):
        b = int(hashlib.md5(f"cms{j}:{token}".encode()).hexdigest()[:8], 16) % _CMS_W
        c = counters[j * _CMS_W + b]
        est = c if est is None else min(est, c)
    return int(est)


def cms_foreach_batch(state_dir: str, text_col: str = "text"):
    """foreachBatch sink fn: fold the batch's partial sketch into the
    persistent grid, fenced on batch_id (idempotent under replay)."""
    os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        last, counters = read_cms_state(state_dir)
        if batch_id <= last:
            return  # replayed batch — already folded
        for r in cms_partial_sketch(batch_df, text_col).collect():
            counters[r["row_j"] * _CMS_W + r["bucket"]] += r["c"]
        tmp = _state_path(state_dir) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "counters": counters}, f)
        os.replace(tmp, _state_path(state_dir))  # atomic publish

    return _merge


def run_cms_available_now(
    docs_stream: DataFrame,
    state_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
) -> None:
    """Drain everything currently available into the sketch and stop
    (Trigger.AvailableNow); the streaming checkpoint remembers consumed
    files, the fenced state file remembers applied batches — a restart
    picks up only new data on both axes."""
    q = (
        docs_stream.writeStream.foreachBatch(cms_foreach_batch(state_dir, text_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def cms_state_df(spark: SparkSession, state_dir: str) -> DataFrame:
    """The persisted grid as (row_j, bucket, c) — directly comparable to
    cms_partial_sketch over the full corpus (merge-by-addition means they
    are EQUAL, asserted in tests/test_streaming.py)."""
    _, counters = read_cms_state(state_dir)
    rows = [
        (j, b, counters[j * _CMS_W + b])
        for j in range(_CMS_D)
        for b in range(_CMS_W)
        if counters[j * _CMS_W + b] > 0
    ]
    return spark.createDataFrame(rows, "row_j int, bucket bigint, c long")
