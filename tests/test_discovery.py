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


def test_listing_page_tombstones_after_retry_budget(spark, tmp_path):
    """A listing page that always fails retries with backoff, lands in the
    failures log, tombstones permanent once its class budget is spent —
    and the crawl still completes with the oracle-predicted trace for the
    SURVIVING pages (reference: new/scrape_orchestrator.py:262-346,
    new/progress_manager.py:302-314 permanent_failed_pages)."""
    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)
    bad_page = N_PAGES  # the highest-priority page never delivers

    disc = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "disc"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    disc.attach_store(ppath, faults)
    disc.attach_listing_faults({bad_page: ("HTTP 503 service unavailable", -1)})
    disc.init_discovery(spark, N_PAGES, VPP, robots)
    disc.run(spark, max_batches=300)

    # oracle: the pre-seeded engine over the site graph WITHOUT the dead page
    seeded = CrawlEngine(
        os.path.join(tmp_root, "seeded"), batch_size=BATCH, n_partitions=8
    )
    seeded.attach_store(ppath, faults)
    seeded.init(
        datagen.site_graph_df(spark, N_PAGES, VPP).filter(F.col("page") != bad_page),
        robots,
    )
    seeded.run(spark, max_batches=300)

    assert [tuple(r) for r in disc.crawl_order(spark).collect()] == [
        tuple(r) for r in seeded.crawl_order(spark).collect()
    ]
    assert {tuple(r) for r in disc.seen_set(spark).collect()} == {
        tuple(r) for r in seeded.seen_set(spark).collect()
    }

    # the dead page: permanent in the listing table, budget-spent attempts,
    # and a permanent record in the failures log under its page URL
    lst = {r["page"]: r for r in disc.listing.read(spark).collect()}
    assert lst[bad_page]["status"] == "permanent"
    assert lst[bad_page]["error_class"] == "temporary"
    assert lst[bad_page]["attempts"] == 4  # RETRY_BUDGET["temporary"]
    assert all(r["status"] == "done" for p, r in lst.items() if p != bad_page)
    fs = {
        r["image_id"]: (r["error_class"], r["attempts"], r["permanent"])
        for r in disc.failure_state(spark).collect()
    }
    assert fs[f"page:{bad_page}"] == ("temporary", 4, True)


def test_listing_page_retries_then_succeeds(spark, tmp_path):
    """A listing page that fails its first two fetches is retried after
    backoff and eventually delivers: the discovered-URL set, seen set and
    per-page listing state all converge to the fault-free crawl's (the
    trace ORDER legitimately differs — lower pages schedule while the top
    page backs off)."""
    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)
    flaky_page = N_PAGES

    disc = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "disc"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    disc.attach_store(ppath, faults)
    disc.attach_listing_faults({flaky_page: ("connection reset by peer", 2)})
    disc.init_discovery(spark, N_PAGES, VPP, robots)
    disc.run(spark, max_batches=300)

    clean = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "clean"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    clean.attach_store(ppath, faults)
    clean.init_discovery(spark, N_PAGES, VPP, robots)
    clean.run(spark, max_batches=300)

    assert {tuple(r) for r in disc.discovered_urls(spark).collect()} == {
        tuple(r) for r in clean.discovered_urls(spark).collect()
    }
    assert {tuple(r) for r in disc.seen_set(spark).collect()} == {
        tuple(r) for r in clean.seen_set(spark).collect()
    }
    lst = {r["page"]: r for r in disc.listing.read(spark).collect()}
    assert all(r["status"] == "done" for r in lst.values())
    assert lst[flaky_page]["attempts"] == 3  # 2 failures + the success


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


def test_first_listing_page_failure_does_not_end_crawl(spark, tmp_path):
    """Regression: with an EMPTY frontier (nothing discovered yet) and the
    only listing page backing off, run_batch must clock-jump to the listing
    retry time instead of declaring the crawl complete — the single-page
    flaky crawl must converge to the fault-free one."""
    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)

    disc = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "disc"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    disc.attach_store(ppath, faults)
    disc.attach_listing_faults({1: ("timeout fetching listing", 2)})
    disc.init_discovery(spark, 1, VPP, robots)  # ONE page, fails twice
    disc.run(spark, max_batches=100)

    clean = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "clean"), batch_size=BATCH, n_partitions=8, lookahead=1
    )
    clean.attach_store(ppath, faults)
    clean.init_discovery(spark, 1, VPP, robots)
    clean.run(spark, max_batches=100)

    assert [tuple(r) for r in disc.crawl_order(spark).collect()] == [
        tuple(r) for r in clean.crawl_order(spark).collect()
    ]
    lst = {r["page"]: r for r in disc.listing.read(spark).collect()}
    assert lst[1]["status"] == "done" and lst[1]["attempts"] == 3


def test_refresh_robots_keeps_discovery_pending_counter(spark, tmp_path):
    """refresh_robots on the discovery plan: pending rows gated out by the
    tightened rules leave the checkpoint's pending_detail counter in the
    same commit, and the crawl completes with the counter at 0 (a drifting
    counter would end the crawl early or go permanently negative)."""
    from pyspark.sql import functions as F

    tmp_root = str(tmp_path)
    robots, ppath, faults = _fixture(spark, tmp_root)
    eng = DiscoveringCrawlEngine(
        os.path.join(tmp_root, "rrd"), batch_size=BATCH, n_partitions=8, lookahead=2
    )
    eng.attach_store(ppath, faults)
    eng.init_discovery(spark, N_PAGES, VPP, robots)
    for _ in range(3):
        eng.run_batch(spark)
    pd0 = int(eng.checkpoints.latest()["pending_detail"])

    tightened = datagen.gen_robots_pdf()
    tightened.loc[
        tightened["host"] == datagen.HOT_HOST, "disallow_prefixes"
    ] = [["/video/"]]
    new_robots = spark.createDataFrame(tightened, schema=schemas.ROBOTS_SCHEMA)
    stats = eng.refresh_robots(spark, new_robots)
    assert stats["blocked_pending"] > 0
    assert (
        int(eng.checkpoints.latest()["pending_detail"])
        == pd0 + stats["unblocked"] - stats["blocked_pending"]
    )

    eng.run(spark, max_batches=200)
    assert int(eng.checkpoints.latest()["pending_detail"]) == 0
    fr = eng.frontier.read(spark)
    assert fr.filter(F.col("status") == "pending").count() == 0
