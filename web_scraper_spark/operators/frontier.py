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
    """Attach ``seq`` — the global crawl order. Full sort: use only on
    bounded slices (see take_batch) or in the correctness harness."""
    w = Window.orderBy(*order_cols())
    return frontier.withColumn("seq", F.row_number().over(w))


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


def take_batch(frontier: DataFrame, batch_size: int) -> DataFrame:
    """The next micro-batch: top ``batch_size`` rows in crawl order.

    Two-phase to avoid a global sort: a cutoff on ``priority`` bounds the
    slice that gets ranked. The rank itself is a single-reducer window over
    ≤ (batch_size + one priority level) rows — bounded, not frontier-sized.
    """
    # Phase 1: find the smallest priority p such that count(priority >= p)
    # >= batch_size — an aggregate over the (small) distinct priority set.
    pri_counts = (
        frontier.groupBy("priority")
        .count()
        .withColumn(
            "running",
            F.sum("count").over(
                Window.orderBy(F.col("priority").desc()).rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    cutoff_row = (
        pri_counts.filter(F.col("running") >= batch_size)
        .orderBy(F.col("priority").desc())
        .select("priority")
        .limit(1)
        .collect()
    )
    if cutoff_row:
        cutoff = cutoff_row[0]["priority"]
        slice_df = frontier.filter(F.col("priority") >= cutoff)
    else:
        slice_df = frontier  # fewer rows than batch_size remain
    # Phase 2: rank the bounded slice, keep the first batch_size.
    return rank_frontier(slice_df).filter(F.col("seq") <= batch_size)


def seed_frontier_from_site(site_graph: DataFrame) -> DataFrame:
    """site_graph rows → frontier rows (status=pending). Priority = page
    number so descending-priority order reproduces the reference's
    last-page-first crawl (main_scraper.py:246-254)."""
    from ..functions.urlnorm import canonicalize_url, url_hash, url_host

    canon = canonicalize_url(F.col("url"))
    return site_graph.select(
        canon.alias("url"),
        url_hash(canon).alias("url_hash"),
        url_host(canon).alias("host"),
        F.col("image_id"),
        F.col("page").cast("int").alias("priority"),
        F.col("position").cast("int").alias("position"),
        F.lit("pending").alias("status"),
        F.lit(0).alias("attempts"),
        F.lit(None).cast("string").alias("error_class"),
        F.lit(None).cast("timestamp").alias("next_attempt_ts"),
    )
