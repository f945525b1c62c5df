"""Frontier growth by link discovery (SURVEY.md §2.1 S1/S2, §3.1 PHASE 1).

The reference grows its work-list by fetching listing pages and extracting
video URLs (page_navigator.py:87-152); the base CrawlEngine starts from a
pre-seeded frontier. ``DiscoveringCrawlEngine`` adds the discovery stage:

  * a ``listing`` snapshot table of pages (page desc = crawl priority),
    bucketed by ``page % 64`` like the frontier;
  * before every detail micro-batch, a top-up step fetches just enough of
    the highest eligible listing pages (HTML via mapInPandas against the
    deterministic synthetic origin), extracts detail URLs with the REAL
    extraction operators (functions/extraction.extract_listing_urls +
    posexplode for listing order), canonicalizes + hashes them, and
    bucket-merges the new rows into the detail frontier.

Ordering invariant: discovery always proceeds in strictly descending page
order and keeps ≥ lookahead×batch_size pending detail rows ahead of the
scheduler, so ``take_batch`` sees every row the reference-order oracle
would pick — the schedule trace is identical to the pre-seeded engine's
(tests/test_discovery.py asserts both).

Listing pages retry and tombstone exactly like detail rows (the reference
retries listing pages and records ``permanent_failed_pages`` —
new/scrape_orchestrator.py:262-346, new/progress_manager.py:302-314):
a failed listing fetch classifies its error, re-enters the listing table
as ``failed`` with the shared exponential backoff, lands in the failures
log, and flips to ``permanent`` once its class budget is spent. The
engine's clock-jump wakeup considers listing retry times too, so a crawl
whose only remaining work is a backing-off listing page does not
terminate early.

Page selection is the frontier's own two-phase machinery
(operators/frontier.priority_cutoff): a hierarchical aggregate over the
3-column listing metadata picks the contributing pages, then only their
buckets are read. No ``orderBy().limit().collect()`` anywhere — the
driver never merges a TakeOrderedAndProject of the listing table (at 10^7
listing pages that merge is the same anti-scaling driver sort the
frontier cutoff exists to avoid).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.errors import backoff_seconds, classify_error, should_retry
from ..functions.extraction import extract_listing_urls
from ..functions.urlnorm import canonicalize_url, extract_item_id, url_hash, url_host
from ..operators.frontier import eligible, priority_cutoff
from ..sources.snapshots import SnapshotTable
from .crawl import TICK_SECONDS, CrawlEngine, _bucket

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("error_class", T.StringType(), True),
        T.StructField("next_attempt_ts", T.TimestampType(), True),
    ]
)

_HTML_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("html", T.StringType(), True),
        T.StructField("error_msg", T.StringType(), True),
    ]
)


def _listing_url(page_col: F.Column) -> F.Column:
    """Canonical URL of a listing page (the reference's
    /latest-updates/{page}/ route — page_navigator.py:87) — gives listing
    failures a real (url, url_hash) identity in the failures log."""
    from ..datagen import HOT_HOST

    return F.concat(
        F.lit(f"https://{HOT_HOST}/latest-updates/"),
        page_col.cast("string"),
        F.lit("/"),
    )


class DiscoveringCrawlEngine(CrawlEngine):
    def __init__(self, root: str, lookahead: int = 2, **kw):
        super().__init__(root, **kw)
        self.lookahead = lookahead
        self.listing = self._make_table("listing")
        #: {page: (error_msg, fail_count)} — fail the page's first
        #: ``fail_count`` fetch attempts with ``error_msg`` (-1 = always).
        #: The listing-side mirror of attach_store's detail fault plan.
        self._listing_fault_plan: dict[int, tuple[str, int]] = {}

    # ------------------------------------------------------------- init

    def init_discovery(
        self,
        spark: SparkSession,
        n_pages: int,
        videos_per_page: int = 24,
        robots: DataFrame | None = None,
        seed: int = 42,
        seen_seed: DataFrame | None = None,
    ) -> None:
        """Seed ONLY the listing pages (the reference's start state:
        last-page number from S1 discovery); the detail frontier begins
        empty and grows by extraction. ``seen_seed``: prior-crawl
        (url_hash, image_id) rows imported exactly as in
        ``CrawlEngine.init`` — discovered URLs already in the import are
        skipped_seen, never fetched."""
        listing = spark.createDataFrame(
            [(p, "pending", 0, None, None) for p in range(1, n_pages + 1)],
            schema=LISTING_SCHEMA,
        ).withColumn("bucket", _bucket(F.col("page")))
        lv = self.listing.commit_overwrite_bucketed(listing, "bucket", origin="init")
        # empty (but valid, bucketed) frontier manifest
        empty = spark.createDataFrame([], schema=self._frontier_bucketed_schema())
        fv = self.frontier.commit_overwrite_bucketed(empty, "bucket", origin="init")
        rv = self.robots.commit_overwrite(robots, origin="init") if robots is not None else 0
        sv, seed_count, bv = self._init_seen_filter(
            spark, n_pages * videos_per_page, seen_seed
        )
        self.checkpoints.commit(
            0,
            {
                "versions": {
                    "frontier": fv,
                    "seen": sv,
                    "failures": 0,
                    "payload_out": 0,
                    "schedule_log": 0,
                    "robots": rv,
                    "bloom": bv,
                    "bloom_delta": 0,
                    "listing": lv,
                },
                "next_seq": 1,
                "logical_s": 0.0,
                "seen_count": seed_count,
                "pending_detail": 0,
                "site": {"n_pages": n_pages, "vpp": videos_per_page, "seed": seed},
            },
        )

    def attach_listing_faults(self, fault_plan: dict[int, tuple[str, int]]) -> None:
        """Fault-inject listing-page fetches: {page: (error_msg,
        fail_count)} — the page's first ``fail_count`` attempts fail with
        ``error_msg`` (−1 = every attempt; the page tombstones permanent
        once its error class's retry budget is spent)."""
        self._listing_fault_plan = dict(fault_plan)
        self._drop_listing_fault_bc()

    _listing_fault_bc_cache = None  # (broadcast, SparkContext)

    def _listing_fault_bc(self, spark):
        """One broadcast per attach, reused every discovery step — a fresh
        broadcast per step is an O(batches) block leak serviced only by the
        lagging ContextCleaner (same class as run_batch's RDD release)."""
        cached = self._listing_fault_bc_cache
        if cached is not None and cached[1] is spark.sparkContext:
            return cached[0]
        self._drop_listing_fault_bc()
        bc = spark.sparkContext.broadcast(self._listing_fault_plan)
        self._listing_fault_bc_cache = (bc, spark.sparkContext)
        return bc

    def _drop_listing_fault_bc(self) -> None:
        cached = getattr(self, "_listing_fault_bc_cache", None)
        if cached is not None:
            try:
                cached[0].destroy(blocking=False)
            except Exception:  # context already stopped
                pass
        self._listing_fault_bc_cache = None

    def _frontier_bucketed_schema(self):
        from .. import schemas

        return T.StructType(
            schemas.FRONTIER_SCHEMA.fields + [T.StructField("bucket", T.IntegerType(), True)]
        )

    # -------------------------------------------------------- discovery

    def _discover_step(self, spark: SparkSession) -> bool:
        """Top up the detail frontier from eligible listing pages (highest
        first) until ≥ lookahead×batch_size rows are pending. Returns True
        if any page was attempted (listing state advanced)."""
        ck = self.checkpoints.latest()
        v = ck["versions"]
        if "listing" not in v:
            return False
        site = ck["site"]
        batch_id = ck["batch_id"] + 1
        now = self._logical_ts(float(ck["logical_s"]) + TICK_SECONDS)
        # pending-detail count is maintained in the checkpoint (seeded 0 at
        # init, +discovered here, −consumed in run_batch) — the per-batch
        # full-frontier count() this replaces was an O(frontier) scan per
        # micro-batch. Fallback to counting only for pre-counter checkpoints.
        if "pending_detail" in ck:
            n_pending_detail = int(ck["pending_detail"])
        else:
            frontier_full = self.frontier.read(spark, v["frontier"])
            n_pending_detail = (
                0
                if frontier_full is None
                else frontier_full.filter(F.col("status") == "pending").count()
            )
        need = self.lookahead * self.batch_size - n_pending_detail
        if need <= 0:
            return False
        d_pages = math.ceil(need / site["vpp"])

        # -- page selection: the frontier's own two-phase cutoff ------------
        # phase 1: hierarchical aggregate over 3-column listing metadata —
        # bounded driver work, no TakeOrderedAndProject limit-merge
        listing_meta = self.listing.read(spark, v["listing"]).select(
            F.col("page").alias("priority"), "status", "next_attempt_ts"
        )
        contributing = priority_cutoff(
            eligible(listing_meta, logical_now=now), d_pages
        )
        if not contributing:
            return False
        pages = [p for p, _ in contributing[:d_pages]]
        # phase 2: read ONLY the buckets holding the contributing pages
        page_buckets = sorted({p % 64 for p in pages})
        pruned = self.listing.read_buckets(spark, page_buckets, v["listing"])
        sel = eligible(pruned, logical_now=now).filter(F.col("page").isin(pages))

        # -- "fetch" the listing pages ---------------------------------------
        # deterministic synthetic origin HTML generated inside the Arrow
        # batch, with fault injection (a live deployment swaps this
        # mapInPandas body for batched HTTP — same shape as the payload
        # fetch stage in sources/store.py)
        n_pages_total, vpp, seed = site["n_pages"], site["vpp"], site["seed"]
        fault_bc = self._listing_fault_bc(spark)

        def _fetch_listing(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..datagen import listing_html_for

            faults = fault_bc.value
            for pdf in it:
                htmls, errs = [], []
                for p, att in zip(pdf["page"], pdf["attempts"]):
                    fault = faults.get(int(p))
                    if fault is not None and (fault[1] < 0 or int(att) < fault[1]):
                        htmls.append(None)
                        errs.append(fault[0])
                    else:
                        htmls.append(listing_html_for(int(p), n_pages_total, vpp, seed))
                        errs.append(None)
                yield pd.DataFrame(
                    {
                        "page": pdf["page"],
                        "attempts": pdf["attempts"],
                        "html": htmls,
                        "error_msg": errs,
                    }
                )

        fetched = (
            sel.select("page", "attempts")
            .repartition(min(len(pages), self.n_partitions))
            .mapInPandas(_fetch_listing, schema=_HTML_SCHEMA)
            .localCheckpoint(eager=True)  # consumed by extraction AND status
        )
        ok_html = fetched.filter(F.col("error_msg").isNull())
        failed = (
            fetched.filter(F.col("error_msg").isNotNull())
            .withColumn("error_class", classify_error("error_msg"))
            .withColumn("attempts_new", F.col("attempts") + 1)
            .withColumn("retry", should_retry("error_class", "attempts_new"))
        )

        # extract → canonicalize → frontier rows (REAL operators: S2 + F6/F7)
        hits = ok_html.select(
            "page", F.posexplode(extract_listing_urls(F.col("html"))).alias("position", "raw_url")
        )
        canon = hits.select(
            "page", "position", canonicalize_url(F.col("raw_url")).alias("url")
        )
        new_rows = canon.select(
            F.col("url"),
            url_hash(F.col("url")).alias("url_hash"),
            url_host(F.col("url")).alias("host"),
            extract_item_id(F.col("url")).alias("image_id"),
            F.col("page").cast("int").alias("priority"),
            F.col("position").cast("int").alias("position"),
            F.lit("pending").alias("status"),
            F.lit(0).alias("attempts"),
            F.lit(None).cast("string").alias("error_class"),
            F.lit(None).cast("timestamp").alias("next_attempt_ts"),
        )
        frontier = self.frontier.read(spark, v["frontier"])
        if frontier is not None:
            new_rows = new_rows.join(
                frontier.select("url_hash"), "url_hash", "left_anti"
            )
        new_rows = new_rows.withColumn("bucket", _bucket(F.col("priority"))).localCheckpoint(
            eager=True
        )
        bucket_counts = new_rows.groupBy("bucket").count().collect()
        touched = [r["bucket"] for r in bucket_counts]
        n_new = sum(r["count"] for r in bucket_counts)
        if not touched:
            fv = v["frontier"]  # everything already known — nothing to merge
        else:
            if frontier is not None:
                old = frontier.withColumn("bucket", _bucket(F.col("priority"))).filter(
                    F.col("bucket").isin(touched)
                )
                merged = old.unionByName(new_rows)
            else:
                merged = new_rows
            fv = self.frontier.commit_merge_buckets(
                merged, "bucket", touched, base_version=v["frontier"],
                origin=f"discover:{batch_id}",
            )

        # -- listing failures → failures log (reference parity:
        #    new/progress_manager.py:302-314 permanent_failed_pages) --------
        fv2 = v["failures"]
        new_failures = failed.select(
            url_hash(_listing_url(F.col("page"))).alias("url_hash"),
            _listing_url(F.col("page")).alias("url"),
            F.concat(F.lit("page:"), F.col("page").cast("string")).alias("image_id"),
            "error_class",
            F.col("attempts_new").alias("attempts"),
            (~F.col("retry")).alias("permanent"),
            # int like the detail rows' lit(next_seq+n) — the failures log's
            # file groups must agree on the column type
            F.lit(batch_id).alias("last_attempt_seq"),
        ).localCheckpoint(eager=True)
        n_failed = new_failures.count()
        if n_failed > 0:
            fv2 = self.failures.commit_append(
                new_failures, base_version=v["failures"],
                origin=f"discover:{batch_id}",
            )

        # -- listing state merge: done / failed+backoff / permanent ---------
        null_str = F.lit(None).cast("string")
        null_ts = F.lit(None).cast("timestamp")
        updates = ok_html.select(
            "page",
            F.lit("done").alias("status"),
            (F.col("attempts") + 1).alias("attempts"),
            null_str.alias("error_class"),
            null_ts.alias("next_attempt_ts"),
        ).unionByName(
            failed.select(
                "page",
                F.when(F.col("retry"), "failed").otherwise("permanent").alias("status"),
                F.col("attempts_new").alias("attempts"),
                F.col("error_class"),
                F.when(
                    F.col("retry"),
                    now
                    + F.make_dt_interval(
                        secs=backoff_seconds("error_class", "attempts_new")
                    ),
                ).otherwise(null_ts).alias("next_attempt_ts"),
            )
        ).withColumn("bucket", _bucket(F.col("page")))
        untouched = pruned.withColumn("bucket", _bucket(F.col("page"))).join(
            F.broadcast(updates.select("page")), "page", "left_anti"
        )
        lv = self.listing.commit_merge_buckets(
            untouched.unionByName(updates.select(*untouched.columns)),
            "bucket", page_buckets, base_version=v["listing"],
            origin=f"discover:{batch_id}",
        )

        self.checkpoints.commit(
            batch_id,
            {
                **self._carry_state(ck),
                **{k: ck[k] for k in ("next_seq", "logical_s", "seen_count", "site")},
                "versions": {**v, "frontier": fv, "failures": fv2, "listing": lv},
                "pending_detail": n_pending_detail + n_new,
            },
        )
        return True

    # ------------------------------------------------------------ batch

    def _run_batch(self, spark: SparkSession) -> dict | None:
        # overrides the inner hook, not run_batch itself, so the base
        # class's checkpoint-block release wraps the discovery step too
        discovered = self._discover_step(spark)
        stats = super()._run_batch(spark)
        if stats is None and discovered:
            return {"discovery_only": True, "scheduled": 0}
        return stats

    def _next_retry_ts(self, spark: SparkSession, v: dict):
        """Clock-jump wakeup must see listing retries too: a crawl whose
        only remaining work is a backing-off listing page is not done."""
        nxt = super()._next_retry_ts(spark, v)
        if "listing" in v:
            listing = self.listing.read(spark, int(v["listing"]))
            if listing is not None:
                lst = (
                    listing.filter(F.col("status") == "failed")
                    .agg(F.min("next_attempt_ts").alias("t"))
                    .collect()[0]["t"]
                )
                if lst is not None and (nxt is None or lst < nxt):
                    nxt = lst
        return nxt

    # ---------------------------------------------------------- queries

    def discovered_urls(self, spark: SparkSession) -> DataFrame | None:
        """Every URL ever inserted into the detail frontier (any status) —
        the discovered-URL set the north rule compares."""
        f = self.frontier.read(spark)
        return None if f is None else f.select("url", "url_hash", "image_id")
