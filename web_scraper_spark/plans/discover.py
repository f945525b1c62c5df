"""Frontier growth by link discovery (SURVEY.md §2.1 S1/S2, §3.1 PHASE 1).

The reference grows its work-list by fetching listing pages and extracting
video URLs (page_navigator.py:87-152); the base CrawlEngine starts from a
pre-seeded frontier. ``DiscoveringCrawlEngine`` adds the discovery stage:

  * a ``listing`` snapshot table of pages (page desc = crawl priority);
  * before every detail micro-batch, a top-up step fetches just enough of
    the highest pending listing pages (HTML via mapInPandas against the
    deterministic synthetic origin), extracts detail URLs with the REAL
    extraction operators (functions/extraction.extract_listing_urls +
    posexplode for listing order), canonicalizes + hashes them, and
    bucket-merges the new rows into the detail frontier.

Ordering invariant: discovery always proceeds in strictly descending page
order and keeps ≥ lookahead×batch_size pending detail rows ahead of the
scheduler, so ``take_batch`` sees every row the reference-order oracle
would pick — the schedule trace is identical to the pre-seeded engine's
(tests/test_discovery.py asserts both).

Listing fetches are assumed reliable in this plan (the reference retries
listing pages too — new/scrape_orchestrator.py:262-346 — which here would
mean routing listing rows through the same failures table; detail-side
retry already covers that machinery).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.extraction import extract_listing_urls
from ..functions.urlnorm import canonicalize_url, extract_item_id, url_hash, url_host
from ..sources.snapshots import SnapshotTable
from .crawl import CrawlEngine, _bucket

LISTING_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
    ]
)

_HTML_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("html", T.StringType(), False),
    ]
)


class DiscoveringCrawlEngine(CrawlEngine):
    def __init__(self, root: str, lookahead: int = 2, **kw):
        super().__init__(root, **kw)
        self.lookahead = lookahead
        self.listing = SnapshotTable(root, "listing")

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
            [(p, "pending") for p in range(1, n_pages + 1)], schema=LISTING_SCHEMA
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
                    "listing": lv,
                },
                "next_seq": 1,
                "logical_s": 0.0,
                "seen_count": seed_count,
                "pending_detail": 0,
                "site": {"n_pages": n_pages, "vpp": videos_per_page, "seed": seed},
            },
        )

    def _frontier_bucketed_schema(self):
        from .. import schemas

        return T.StructType(
            schemas.FRONTIER_SCHEMA.fields + [T.StructField("bucket", T.IntegerType(), True)]
        )

    # -------------------------------------------------------- discovery

    def _discover_step(self, spark: SparkSession) -> bool:
        """Top up the detail frontier from pending listing pages (highest
        first) until ≥ lookahead×batch_size rows are pending. Returns True
        if anything was discovered."""
        ck = self.checkpoints.latest()
        v = ck["versions"]
        if "listing" not in v:
            return False
        site = ck["site"]
        listing = self.listing.read(spark, v["listing"])
        pending_pages = listing.filter(F.col("status") == "pending")
        frontier = self.frontier.read(spark, v["frontier"])
        # pending-detail count is maintained in the checkpoint (seeded 0 at
        # init, +discovered here, −consumed in run_batch) — the per-batch
        # full-frontier count() this replaces was an O(frontier) scan per
        # micro-batch. Fallback to counting only for pre-counter checkpoints.
        if "pending_detail" in ck:
            n_pending_detail = int(ck["pending_detail"])
        else:
            n_pending_detail = (
                0 if frontier is None else frontier.filter(F.col("status") == "pending").count()
            )
        need = self.lookahead * self.batch_size - n_pending_detail
        if need <= 0:
            return False
        d_pages = math.ceil(need / site["vpp"])
        pages = [
            r["page"]
            for r in pending_pages.orderBy(F.col("page").desc()).limit(d_pages).collect()
        ]
        if not pages:
            return False

        # "fetch" the listing pages: deterministic synthetic origin HTML
        # generated inside the Arrow batch (a live deployment swaps this
        # mapInPandas body for batched HTTP — same shape as the payload
        # fetch stage in sources/store.py)
        n_pages_total, vpp, seed = site["n_pages"], site["vpp"], site["seed"]

        def _fetch_listing(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from ..datagen import listing_html_for

            for pdf in it:
                yield pd.DataFrame(
                    {
                        "page": pdf["page"],
                        "html": [
                            listing_html_for(int(p), n_pages_total, vpp, seed)
                            for p in pdf["page"]
                        ],
                    }
                )

        pages_df = spark.createDataFrame([(p,) for p in pages], "page int")
        html = pages_df.repartition(min(len(pages), self.n_partitions)).mapInPandas(
            _fetch_listing, schema=_HTML_SCHEMA
        )

        # extract → canonicalize → frontier rows (REAL operators: S2 + F6/F7)
        hits = html.select(
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
                origin=f"discover:{ck['batch_id'] + 1}",
            )

        # listing pages → done (bucket merge on the touched page buckets)
        page_buckets = sorted({p % 64 for p in pages})
        lst_b = listing.withColumn("bucket", _bucket(F.col("page"))).filter(
            F.col("bucket").isin(page_buckets)
        )
        pages_lit = spark.createDataFrame([(p,) for p in pages], "page int")
        updated = (
            lst_b.join(F.broadcast(pages_lit.withColumn("__done", F.lit(True))), "page", "left")
            .withColumn(
                "status",
                F.when(F.col("__done"), F.lit("done")).otherwise(F.col("status")),
            )
            .drop("__done")
            .select("page", "status", "bucket")
        )
        lv = self.listing.commit_merge_buckets(
            updated, "bucket", page_buckets, base_version=v["listing"],
            origin=f"discover:{ck['batch_id'] + 1}",
        )

        self.checkpoints.commit(
            ck["batch_id"] + 1,
            {
                **self._carry_state(ck),
                **{k: ck[k] for k in ("next_seq", "logical_s", "seen_count", "site")},
                "versions": {**v, "frontier": fv, "listing": lv},
                "pending_detail": n_pending_detail + n_new,
            },
        )
        return True

    # ------------------------------------------------------------ batch

    def run_batch(self, spark: SparkSession) -> dict | None:
        discovered = self._discover_step(spark)
        stats = super().run_batch(spark)
        if stats is None and discovered:
            return {"discovery_only": True, "scheduled": 0}
        return stats

    # ---------------------------------------------------------- queries

    def discovered_urls(self, spark: SparkSession) -> DataFrame | None:
        """Every URL ever inserted into the detail frontier (any status) —
        the discovered-URL set the north rule compares."""
        f = self.frontier.read(spark)
        return None if f is None else f.select("url", "url_hash", "image_id")
