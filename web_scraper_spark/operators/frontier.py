"""Frontier priority queue as window-ranked micro-batches (SURVEY.md §2.5
W2, §7 step 4).

Reference parity: the crawl order is page N → N-1 → … → 1, and within a page
items in listing order (main_scraper.py:547-614; batch slicing
new/scrape_orchestrator.py:378-401, new/main_scraper.py:256-259). The
priority queue the reference keeps as a descending loop counter becomes a
rank over ``(priority DESC, position ASC, url_hash ASC)`` — the url_hash
tiebreaker makes batch boundaries deterministic even on duplicate keys.

Scale note: a global ``row_number`` over 10^10 rows is a single-partition
sort — never do that. ``take_batch`` instead ranks only the candidate slice
after a cheap global threshold cut:

  1. compute the batch's priority cutoff from an aggregate (tiny),
  2. filter the frontier to rows at-or-above the cutoff (partition-pruned
     scan when the frontier table is written bucketed/sorted by priority),
  3. rank just that slice (bounded size: batch + one priority level).

For the reference-order-reproduction harness the exact global order matters,
so the ranked slice keeps the same triple sort key the oracle uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def order_cols() -> list:
    """Deterministic global crawl order (highest page first — the reference
    scrapes backwards). Built lazily: Columns need an active session."""
    return [F.col("priority").desc(), F.col("position").asc(), F.col("url_hash").asc()]


def rank_frontier(frontier: DataFrame) -> DataFrame:
    """Attach ``seq`` — the global crawl order. Single-reducer window:
    use only on bounded slices (micro-batches) or in tests; for
    frontier-scale ranking use :func:`rank_frontier_scalable`."""
    w = Window.orderBy(*order_cols())
    return frontier.withColumn("seq", F.row_number().over(w))


def rank_frontier_scalable(frontier: DataFrame) -> DataFrame:
    """Exact global crawl order WITHOUT a single-reducer sort.

    Two-level ranking: rank within each priority (a parallel window — one
    partition per priority level), then add per-priority offsets computed
    from a tiny groupBy-count (distinct priorities only) cumulated on the
    driver and broadcast back. seq values are identical to rank_frontier's;
    the serial work drops from O(slice) to O(distinct priorities).
    """
    import pandas as pd

    spark = frontier.sparkSession
    counts = frontier.groupBy("priority").count().toPandas()
    if counts.empty:
        return frontier.withColumn("seq", F.lit(None).cast("long"))
    counts = counts.sort_values("priority", ascending=False).reset_index(drop=True)
    counts["__offset"] = counts["count"].cumsum().shift(fill_value=0)
    offsets = spark.createDataFrame(
        pd.DataFrame(
            {"priority": counts["priority"], "__offset": counts["__offset"].astype("int64")}
        )
    )
    w = Window.partitionBy("priority").orderBy(
        F.col("position").asc(), F.col("url_hash").asc()
    )
    return (
        frontier.join(F.broadcast(offsets), "priority")
        .withColumn("seq", (F.col("__offset") + F.row_number().over(w)).cast("long"))
        .drop("__offset")
    )


def eligible(frontier: DataFrame, logical_now: F.Column | None = None) -> DataFrame:
    """Rows allowed into the next micro-batch: pending, or failed-retryable
    whose backoff window has elapsed (next_attempt_ts <= logical_now).
    Backoff-as-schedule, replacing the reference's sleeps
    (video_processor.py:237-255)."""
    cond = F.col("status") == "pending"
    retry = (F.col("status") == "failed") & (
        F.col("next_attempt_ts").isNull()
        | (F.col("next_attempt_ts") <= (logical_now if logical_now is not None else F.current_timestamp()))
    )
    return frontier.filter(cond | retry)


#: priorities per cutoff range (2^8): the level-1 aggregate groups 256
#: consecutive priorities per row, so the only serial step runs over
#: distinct_priorities/256 rows. Nest another level for 10^9+ priorities.
_RANGE_SHIFT = 8


def priority_cutoff(frontier: DataFrame, batch_size: int) -> list[tuple[int, int]]:
    """Phase 1 of the two-phase micro-batch: the priorities that contribute
    rows to the next batch, with their global seq offsets.

    Hierarchical, so no step is serial in the distinct-priority count:

      1. per-RANGE counts (range = priority >> 8, monotonic in priority) —
         one parallel aggregate; the driver cumulates range totals in
         descending order and keeps ranges whose preceding total is still
         under ``batch_size`` (the boundary range resolves at level 2);
      2. per-PRIORITY counts restricted to those candidate ranges — the
         filter is a plain ``priority >= lo`` predicate (parquet min/max
         prunable); the collected slice holds at most 256 priorities per
         candidate range, so the driver-side cumulation is bounded by the
         batch's priority spread, not the frontier.

    (An orderBy().limit(batch_size) pre-cut was tried and REVERTED:
    TakeOrderedAndProject merges limit×partitions rows on the driver,
    which anti-scales with parallelism. A single-reducer running-sum
    window over all distinct priorities — the previous design — was
    measured as the schedule leg's Amdahl serial fraction at 166k
    priorities and is exactly what step 1 removes.)

    Returns [(priority, offset), ...] — bounded by batch_size entries.
    The caller can derive exactly which frontier buckets hold these
    priorities and feed :func:`rank_slice` a partition-pruned scan
    (CrawlEngine does: SnapshotTable.read_buckets)."""
    rng = F.shiftright(F.col("priority"), _RANGE_SHIFT)
    range_rows = (
        frontier.groupBy(rng.alias("__range"))
        .count()
        .collect()
    )
    if not range_rows:
        return []
    range_rows.sort(key=lambda r: r["__range"], reverse=True)
    total = 0
    cand_ranges = []
    for r in range_rows:
        if total >= batch_size:
            break
        cand_ranges.append(int(r["__range"]))
        total += int(r["count"])
    lo_priority = min(cand_ranges) << _RANGE_SHIFT
    pri_rows = (
        frontier.filter(F.col("priority") >= lo_priority)
        .groupBy("priority")
        .count()
        .collect()
    )
    pri_rows.sort(key=lambda r: r["priority"], reverse=True)
    out = []
    offset = 0
    for r in pri_rows:
        if offset >= batch_size:
            break
        out.append((int(r["priority"]), offset))
        offset += int(r["count"])
    return out


def priority_offsets(frontier: DataFrame, batch_size: int) -> DataFrame | None:
    """Distributed phase 1: the contributing-priority offset table as a
    DATAFRAME — same rows ``priority_cutoff`` returns as a list, with the
    O(contributing priorities) driver work removed. At a production batch
    (10^5-10^6 contributing priorities) the list form's collect → Python
    cumulation → ``createDataFrame`` round-trip is a multi-second SERIAL
    slice of every batch (measured as the schedule leg's Amdahl floor on
    the 8M-row bench batch); here the driver only ever cumulates RANGE
    totals (≤ distinct-priorities/256 rows):

      1. per-range counts collect + descending cumulation — unchanged,
         bounded by ranges;
      2. per-priority counts of the candidate ranges stay EXECUTOR-side:
         the exclusive offset is the range's base (a broadcast-joined
         ≤256-row table) plus a running sum over a window PARTITIONED BY
         RANGE (parallel across ranges, ≤256 rows per partition);
      3. the early-stop predicate becomes ``__offset < batch_size`` —
         algebraically identical to the loop's "include while the
         preceding total is under batch_size".

    Returns (priority, __offset) localCheckpointed (frozen + reusable for
    the min/bucket/broadcast consumers without re-scanning the frontier),
    or None when no rows are eligible."""
    spark = frontier.sparkSession
    rng = F.shiftright(F.col("priority"), _RANGE_SHIFT)
    range_rows = frontier.groupBy(rng.alias("__range")).count().collect()
    if not range_rows:
        return None
    range_rows.sort(key=lambda r: r["__range"], reverse=True)
    total = 0
    bases = []
    for r in range_rows:
        if total >= batch_size:
            break
        bases.append((int(r["__range"]), total))
        total += int(r["count"])
    lo_priority = min(b for b, _ in bases) << _RANGE_SHIFT
    base_df = spark.createDataFrame(bases, "__range long, __base long")
    w = (
        Window.partitionBy("__range")
        .orderBy(F.col("priority").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        frontier.filter(F.col("priority") >= lo_priority)
        .groupBy("priority")
        .count()
        .withColumn("__range", rng)
        .join(F.broadcast(base_df), "__range")
        .withColumn(
            "__offset",
            (F.col("__base") + F.coalesce(F.sum("count").over(w), F.lit(0))).cast(
                "long"
            ),
        )
        .filter(F.col("__offset") < batch_size)
        .select("priority", "__offset")
        .localCheckpoint(eager=True)
    )


def contributing_buckets(offsets: DataFrame, n_buckets: int) -> list[int]:
    """The frontier buckets holding the contributing priorities — the
    partition-pruning input for the phase-2 snapshot read. Bounded
    collect: ≤ ``n_buckets`` rows regardless of batch or frontier size."""
    return sorted(
        int(r["b"])
        for r in offsets.select(
            F.pmod(F.col("priority"), F.lit(n_buckets)).alias("b")
        )
        .distinct()
        .collect()
    )


def rank_slice(
    frontier: DataFrame,
    contributing: "list[tuple[int, int]] | DataFrame",
    batch_size: int,
) -> DataFrame:
    """Phase 2: rank the contributing-priority slice into the micro-batch.

    ``frontier`` may be (should be, at scale) a bucket-pruned read covering
    at least the contributing priorities. Ranking is a parallel
    per-priority window + broadcast-joined offsets — exact global order
    with no single-reducer sort. ``contributing`` is either the offset
    DataFrame from :func:`priority_offsets` (the at-scale form) or the
    list from :func:`priority_cutoff` (bounded callers, e.g. the discovery
    plan's page selection)."""
    spark = frontier.sparkSession
    if isinstance(contributing, DataFrame):
        offsets = contributing
        cutoff = offsets.agg(F.min("priority")).collect()[0][0]
    else:
        cutoff = min(p for p, _ in contributing)
        offsets = spark.createDataFrame(
            [(p, o) for p, o in contributing], "priority int, __offset long"
        )
    w = Window.partitionBy("priority").orderBy(
        F.col("position").asc(), F.col("url_hash").asc()
    )
    # No forced broadcast: offsets is O(contributing priorities) — a few
    # rows for the engine's bounded micro-batches (AQE converts the join
    # to a runtime broadcast there) but ~batch/24 rows at bench scale,
    # where forcing a driver-built broadcast of a batch-sized table per
    # batch is a serial slice that never scales. Unhinted, the shuffle
    # join hash-partitions on exactly the window's key, so Catalyst
    # reuses one Exchange for join + window.
    ranked = (
        frontier.filter(F.col("priority") >= int(cutoff))
        .join(offsets, "priority")
        .withColumn("seq", (F.col("__offset") + F.row_number().over(w)).cast("long"))
        .drop("__offset")
    )
    return ranked.filter(F.col("seq") <= batch_size)


def take_batch(frontier: DataFrame, batch_size: int) -> DataFrame:
    """The next micro-batch: top ``batch_size`` rows in crawl order —
    priority_offsets + rank_slice over the same (unpruned) frontier. The
    engine calls the two phases separately so phase 2 runs on a
    bucket-pruned snapshot read instead of the full frontier."""
    offsets = priority_offsets(frontier, batch_size)
    if offsets is None:
        return frontier.withColumn("seq", F.lit(None).cast("long"))
    return rank_slice(frontier, offsets, batch_size)


def seed_frontier_from_site(site_graph: DataFrame) -> DataFrame:
    """site_graph rows → frontier rows (status=pending). Priority = page
    number so descending-priority order reproduces the reference's
    last-page-first crawl (main_scraper.py:246-254)."""
    from ..functions.urlnorm import canonicalize_url, url_hash, url_host

    # Two projections on purpose: the canonicalization regex chain is
    # expensive, and inlining it into url/url_hash/host would evaluate it
    # three times per row (and blow up the codegen method size). With a
    # materialized alias, CollapseProject keeps it single because the alias
    # is referenced more than once and the expression is non-cheap.
    canon = site_graph.select(
        canonicalize_url(F.col("url")).alias("url"), "image_id", "page", "position"
    )
    return canon.select(
        F.col("url"),
        url_hash(F.col("url")).alias("url_hash"),
        url_host(F.col("url")).alias("host"),
        F.col("image_id"),
        F.col("page").cast("int").alias("priority"),
        F.col("position").cast("int").alias("position"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("error_class"),
        F.lit(None).cast("timestamp").alias("next_attempt_ts"),
    )
