"""Discovery plan: frontier growth via listing-page link extraction must
reproduce the pre-seeded engine's exact trace + seen set, discover exactly
the site graph's URL set, and survive restart."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.plans.crawl import CrawlEngine
from web_scraper_spark.plans.discover import DiscoveringCrawlEngine

N_PAGES, VPP, BATCH = 5, 24, 20


def _fixture(spark, tmp_root):
    robots = datagen.robots_df(spark)
    ppath = os.path.join(tmp_root, "origin_payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(N_PAGES * VPP), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    fpdf = datagen.gen_fault_plan_pdf(N_PAGES * VPP)
    faults = {r.image_id: (r.fail_mode, int(r.fail_count)) for r in fpdf.itertuples()}
    return robots, ppath, faults


def test_discovery_matches_preseeded_engine(spark, tmp_path):
    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)

    seeded = CrawlEngine(os.path.join(tmp_root, "seeded"), batch_size=BATCH, n_partitions=8)
    seeded.attach_store(ppath, faults)
    seeded.init(datagen.site_graph_df(spark, N_PAGES, VPP), robots)
    seeded.run(spark, max_batches=200)

    disc = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "disc"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    disc.attach_store(ppath, faults)
    disc.init_discovery(spark, N_PAGES, VPP, robots)
    disc.run(spark, max_batches=200)

    a = [tuple(r) for r in seeded.crawl_order(spark).collect()]
    b = [tuple(r) for r in disc.crawl_order(spark).collect()]
    assert a == b
    sa = {tuple(r) for r in seeded.seen_set(spark).collect()}
    sb = {tuple(r) for r in disc.seen_set(spark).collect()}
    assert sa == sb

    # discovered-URL set == the site graph's canonical URL set, exactly
    from web_scraper_spark.operators.frontier import seed_frontier_from_site

    want = {
        (r["url"], r["url_hash"], r["image_id"])
        for r in seed_frontier_from_site(datagen.site_graph_df(spark, N_PAGES, VPP))
        .select("url", "url_hash", "image_id")
        .collect()
    }
    got = {tuple(r) for r in disc.discovered_urls(spark).collect()}
    assert got == want

    # every listing page consumed
    listing = disc.listing.read(spark)
    assert listing.filter(F.col("status") == "pending").count() == 0


def test_discovery_resumes_after_restart(spark, tmp_path):
    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)

    disc = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "d"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    disc.attach_store(ppath, faults)
    disc.init_discovery(spark, N_PAGES, VPP, robots)
    disc.run_batch(spark)
    disc.run_batch(spark)

    resumed = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "d"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    resumed.attach_store(ppath, faults)
    resumed.run(spark, max_batches=200)

    full = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "full"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    full.attach_store(ppath, faults)
    full.init_discovery(spark, N_PAGES, VPP, robots)
    full.run(spark, max_batches=200)

    assert [tuple(r) for r in resumed.crawl_order(spark).collect()] == [
        tuple(r) for r in full.crawl_order(spark).collect()
    ]
