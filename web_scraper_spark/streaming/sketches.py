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


# ---------------------------------------------------------------------
# streaming HyperLogLog — the max-merge counterpart of the CMS's
# merge-by-addition (registers combine by elementwise MAX, the property
# that lets per-batch/per-shard HLLs federate without rescans)
# ---------------------------------------------------------------------

from ..analytics import _HLL_M, _HLL_RHO_CAP, _NIB_BIN  # noqa: E402

_HLL_STATE_FILE = "hll_state.json"


def hll_partial_registers(df: DataFrame, value_col: str) -> DataFrame:
    """(bucket, m_reg) partial registers of one batch — the identical
    md5-nibble construction of analytics.q_hll_distinct (bucket = first
    nibble, rho = first '1' in the next 60 bits, capped), so streamed and
    batch registers are the same mathematical object."""
    hx = df.select(F.md5(F.col(value_col).cast("string")).alias("hx"))

    def _nib(j: int):
        ch = F.substring("hx", j + 1, 1)
        return F.when(ch >= "a", F.ascii(ch) - 87).otherwise(F.ascii(ch) - 48)

    bits = F.concat(
        *[F.substr(F.lit(_NIB_BIN), _nib(j) * 4 + 1, F.lit(4)) for j in range(1, 16)]
    )
    pos = F.instr(bits, "1")
    rho = F.least(F.when(pos == 0, 61).otherwise(pos), F.lit(_HLL_RHO_CAP))
    return (
        hx.select(_nib(0).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("m_reg"))
    )


def read_hll_state(state_dir: str) -> tuple[int, list[int]]:
    p = os.path.join(state_dir, _HLL_STATE_FILE)
    if not os.path.exists(p):
        return -1, [0] * _HLL_M
    with open(p) as f:
        st = json.load(f)
    return int(st["batch_id"]), list(st["registers"])


def hll_estimate(state_dir: str) -> float:
    """Cardinality estimate from the persisted registers — the same
    integer harmonic denominator + linear-counting branch as the batch
    query, computed driver-side (16 ints, no Spark job)."""
    import math

    _, regs = read_hll_state(state_dir)
    num = 0.673 * _HLL_M * _HLL_M * float(2**_HLL_RHO_CAP)
    raw = num / sum(2 ** (_HLL_RHO_CAP - m) for m in regs)
    v_zero = sum(1 for m in regs if m == 0)
    if raw <= 2.5 * _HLL_M and v_zero > 0:
        return _HLL_M * math.log(_HLL_M / v_zero)
    return raw


def hll_foreach_batch(state_dir: str, value_col: str):
    """foreachBatch sink fn: elementwise-MAX the batch's registers into
    the persistent grid, fenced on batch_id (idempotent under replay —
    max-merge is idempotent even without the fence; the fence keeps the
    cursor semantics identical to the CMS sink)."""
    os.makedirs(state_dir, exist_ok=True)

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        last, regs = read_hll_state(state_dir)
        if batch_id <= last:
            return
        for r in hll_partial_registers(batch_df, value_col).collect():
            b = int(r["bucket"])
            regs[b] = max(regs[b], int(r["m_reg"]))
        tmp = os.path.join(state_dir, _HLL_STATE_FILE) + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"batch_id": batch_id, "registers": regs}, f)
        os.replace(tmp, os.path.join(state_dir, _HLL_STATE_FILE))

    return _merge


def run_hll_available_now(
    stream: DataFrame, state_dir: str, checkpoint_dir: str, value_col: str
) -> None:
    q = (
        stream.writeStream.foreachBatch(hll_foreach_batch(state_dir, value_col))
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
