"""Per-host politeness + salted repartitioning (SURVEY.md §2.9 ST2/ST3,
north rule: "per-host politeness budget enforced through salted
repartitioning on host-hash to defeat domain skew").

Reference parity: fixed sleeps — 1-2 s/request (config_manager.py:28),
5 s/page (main_scraper.py:917-932), 2 s/video
(new/video_data_parser.py:337-338) — and bounded worker counts
(main_scraper.py:50-56). In Spark those become:

  * **wave assignment**: within a micro-batch, the i-th request to a host
    (in crawl order) runs in wave ``i // per_host_parallelism``. Waves are
    the politeness clock — a fetch task processes its partition wave by
    wave, inserting ``crawl_delay_ms`` between waves (logical ticks in the
    sandbox store; real sleeps against a live site).
  * **salted repartition**: partition by ``(host, salt)`` where hot hosts
    (row share above ``hot_threshold``) get ``n_salts`` partitions. Without
    salting, one hot host (~50% of rows in the fixture) pins one executor
    while the rest idle; with salting its waves spread across executors
    while per-wave pacing still bounds the *aggregate* request rate because
    wave boundaries are global per host (computed before the salt split).

The skew decision uses a cheap groupBy-count over the micro-batch (bounded
rows), not the whole frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_waves(batch: DataFrame, per_host_parallelism: int = 3) -> DataFrame:
    """Add ``host_rank`` (crawl-order index within host) and ``fetch_wave``.

    ``per_host_parallelism`` mirrors the reference's 3-parallel-downloads
    bound (config_manager.py:27) — at most that many in-flight requests per
    host per wave.

    Ranking is two-level: a window per (host, priority) plus driver-
    cumulated per-host offsets from a (host, priority) count aggregate.
    A plain per-host window would put a hot host's whole batch share in
    ONE task (the 50%-hot-host fixture ⇒ half the batch serial); per
    (host, priority) the hot host splits across its priorities while
    host_rank stays exactly the rank over (priority desc, position, hash)
    within the host.
    """
    # offsets computed wholly JVM-side and TWO-LEVEL, like
    # frontier.priority_offsets: a flat per-host running sum would put
    # every (host, priority) count row of a host in ONE window task —
    # with a batch-scale count table (millions of pairs at bench
    # geometry) that is an n_hosts-way-parallel serial slice. Level 1
    # cumulates per-(host, 256-priority-range) totals (tiny table, its
    # per-host window is over ranges, not priorities); level 2 cumulates
    # within each (host, range) — parallel across hosts × ranges.
    from .frontier import _RANGE_SHIFT

    counts = batch.groupBy("host", "priority").count()
    rng = F.shiftright(F.col("priority"), _RANGE_SHIFT)
    rtot = counts.groupBy("host", rng.alias("__range")).agg(
        F.sum("count").alias("__rtot")
    )
    wr = (
        Window.partitionBy("host")
        .orderBy(F.col("__range").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rbase = rtot.select(
        "host",
        "__range",
        F.coalesce(F.sum("__rtot").over(wr), F.lit(0)).alias("__rbase"),
    )
    win = (
        Window.partitionBy("host", "__range")
        .orderBy(F.col("priority").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        counts.withColumn("__range", rng)
        .join(rbase, ["host", "__range"])  # rbase is tiny → AQE broadcasts
        .select(
            "host",
            "priority",
            (
                F.col("__rbase") + F.coalesce(F.sum("count").over(win), F.lit(0))
            ).alias("__offset"),
        )
    )
    w = Window.partitionBy("host", "priority").orderBy(
        F.col("position").asc(), F.col("url_hash").asc()
    )
    # No forced broadcast on the offsets join: offsets is O(distinct
    # (host, priority) pairs in the batch) — tiny for the engine's
    # bounded micro-batches (AQE converts the join to a runtime broadcast
    # there) but MILLIONS of rows for a bench-scale 32M-row batch, where
    # a forced broadcast serializes a batch-sized table through the
    # driver every batch (measured as the waves phase's non-scaling slice
    # at 256M rows). The shuffle join hash-partitions on exactly the
    # window's keys, so Catalyst reuses one Exchange for join + window.
    return (
        batch.join(offsets, ["host", "priority"])
        .withColumn("host_rank", (F.col("__offset") + F.row_number().over(w) - 1).cast("int"))
        .drop("__offset")
        .withColumn("fetch_wave", (F.col("host_rank") / per_host_parallelism).cast("int"))
    )


def salted_repartition(
    batch: DataFrame,
    n_partitions: int,
    n_salts: int = 8,
    hot_threshold: float = 0.10,
    hot_hosts: list[str] | None = None,
) -> DataFrame:
    """Repartition by (host, salt): hosts holding more than ``hot_threshold``
    of the batch get ``n_salts`` salt values (their waves interleave across
    executors); cold hosts get salt 0 and stay whole.

    Salt is derived from ``fetch_wave`` (not random) so rows of one wave of
    one hot host land in the same partition — pacing stays enforceable —
    while consecutive waves rotate partitions. Deterministic: no
    Math.random, so re-runs produce identical placement.

    ``n_salts`` is a politeness-vs-spread dial, not a free speedup knob:
    a hot host's straggler shrinks by at most ``min(n_salts, cores)``
    (measured: scripts/skew_bench.py), but waves on different salts are
    only serialized within their own partition, so the host's worst-case
    aggregate in-flight rises to ``per_host_parallelism × n_salts``. The
    default 8 keeps a 50%-hot batch off the straggler cliff while staying
    within one order of magnitude of the reference's 3-per-host bound; a
    1000-executor cluster crawling one giant CDN raises it deliberately,
    accepting the politeness dilution (or negotiating a rate with the
    host), rather than silently.
    """
    if "fetch_wave" not in batch.columns:
        batch = assign_waves(batch)
    if hot_hosts is None:
        # standalone use: detect skew with a count over the bounded batch.
        # The crawl engine passes hot_hosts precomputed from its single
        # per-batch stats pass, so no extra jobs run on that path.
        total = batch.count()
        if total == 0:
            return batch.withColumn("salt", F.lit(0))
        hot_hosts = [
            r["host"]
            for r in batch.groupBy("host")
            .count()
            .filter(F.col("count") > hot_threshold * total)
            .collect()
        ]
    salt = F.when(
        F.col("host").isin(hot_hosts), F.pmod(F.col("fetch_wave"), F.lit(n_salts))
    ).otherwise(F.lit(0))
    return batch.withColumn("salt", salt.cast("int")).repartition(
        n_partitions, F.col("host"), F.col("salt")
    )


def host_schedule(batch: DataFrame, per_host_parallelism: int = 3) -> DataFrame:
    """Pure scheduling view (for tests/oracles): (host, url, host_rank,
    fetch_wave) in deterministic order."""
    return assign_waves(batch, per_host_parallelism).select(
        "host", "url", "url_hash", "priority", "position", "host_rank", "fetch_wave"
    )
