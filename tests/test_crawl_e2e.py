"""End-to-end: the Spark engine must reproduce the pure-Python oracle's
crawl order, discovered-URL set, and failure state under the same seed
list + politeness budget + fault plan (SURVEY.md §5 rebuild test plan),
and resume from a snapshot checkpoint mid-crawl."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.plans.crawl import CrawlEngine

from .oracle import Item, run_oracle

N_PAGES, VPP = 5, 24
BATCH = 50


def _fixture(spark, tmp_root, with_faults=True):
    site = datagen.site_graph_df(spark, N_PAGES, VPP)
    robots = datagen.robots_df(spark)
    ppath = os.path.join(tmp_root, "origin_payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(N_PAGES * VPP), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    faults = {}
    if with_faults:
        fpdf = datagen.gen_fault_plan_pdf(N_PAGES * VPP, fail_rate=0.15)
        faults = {r.image_id: (r.fail_mode, int(r.fail_count)) for r in fpdf.itertuples()}
    return site, robots, ppath, faults


def _oracle_inputs(spark, site, robots_df):
    """Build oracle Items with the engine's own canonical url/hash/host
    (the oracle tests ordering semantics, not the hash function)."""
    from web_scraper_spark.operators.frontier import seed_frontier_from_site

    rows = seed_frontier_from_site(site).collect()
    items = [
        Item(
            url=r["url"],
            url_hash=r["url_hash"],
            host=r["host"],
            image_id=r["image_id"],
            priority=r["priority"],
            position=r["position"],
        )
        for r in rows
    ]
    robots = {
        r["host"]: {"disallow_prefixes": list(r["disallow_prefixes"])}
        for r in robots_df.collect()
    }
    return items, robots


def _run_engine(spark, tmp_root, site, robots, ppath, faults, name, **kw):
    eng = CrawlEngine(os.path.join(tmp_root, name), batch_size=BATCH, n_partitions=8, **kw)
    eng.attach_store(ppath, faults)
    eng.init(site, robots)
    eng.run(spark, max_batches=100)
    return eng


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    """One engine+oracle crawl, shared by the comparison tests."""
    tmp_root = str(tmp_path_factory.mktemp("e2e"))
    site, robots_df, ppath, faults = _fixture(spark, tmp_root)
    eng = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "state")
    items, robots = _oracle_inputs(spark, site, robots_df)
    oracle = run_oracle(items, robots, faults, BATCH)
    return eng, oracle, faults


def test_crawl_order_matches_oracle(spark, crawl):
    eng, oracle, _ = crawl
    got = [(r["seq"], r["url"], r["image_id"]) for r in eng.crawl_order(spark).collect()]
    assert got == oracle.schedule


def test_seen_set_matches_oracle(spark, crawl):
    eng, oracle, _ = crawl
    got = {
        r["url_hash"]: (r["image_id"], r["committed_seq"])
        for r in eng.seen_set(spark).collect()
    }
    assert got == oracle.seen


def test_failure_state_matches_oracle(spark, crawl):
    eng, oracle, _ = crawl
    fs = eng.failure_state(spark)
    got = (
        {}
        if fs is None
        else {
            r["url_hash"]: (r["error_class"], r["attempts"], r["permanent"])
            for r in fs.collect()
        }
    )
    want = {
        it.url_hash: (
            it.error_class,
            it.attempts,
            it.status == "permanent",
        )
        for it in oracle.final_status.values()
        if it.status in ("permanent",) or it.attempts > 0
    }
    # engine logs a failure row for every row that ever failed; compare the
    # terminal record per url
    assert got == want


def test_frontier_terminal_statuses(spark, crawl):
    eng, oracle, _ = crawl
    frontier = eng.frontier.read(spark)
    got = {r["url_hash"]: r["status"] for r in frontier.collect()}
    want = {it.url_hash: it.status for it in oracle.final_status.values()}
    assert got == want


def test_payload_out_validated_rows_only(spark, crawl):
    eng, oracle, _ = crawl
    out = eng.payload_out.read(spark)
    ids = {r["image_id"] for r in out.select("image_id").collect()}
    assert ids == {img for img, _ in oracle.seen.values()}
    # every committed payload decodes + round-trips its phash
    assert out.filter(F.col("bytes").isNull()).count() == 0
    assert out.filter(F.col("phash").isNull()).count() == 0


def test_payload_matches_origin_row_for_row(spark, crawl):
    """North-star per-row invariant (BASELINE.json input_hint): every
    fetched payload row equals its origin row — caption STRING EQUALITY
    and phash-over-decoded-pixels equality (the decoded-pixel allclose /
    PSNR>=40dB check ran in fetch_and_validate; a pixel drift beyond it
    would flip the phash compared here)."""
    eng, _, _ = crawl
    out = eng.payload_out.read(spark).select("image_id", "caption", "phash")
    origin = spark.read.parquet(eng._payload_path).select(
        "image_id",
        F.col("caption").alias("o_caption"),
        F.col("phash").alias("o_phash"),
    )
    joined = out.join(origin, "image_id", "left")
    n = joined.count()
    assert n == out.count()
    assert joined.filter(F.col("o_caption").isNull()).count() == 0
    mism = joined.filter(
        (F.col("caption") != F.col("o_caption")) | (F.col("phash") != F.col("o_phash"))
    )
    assert mism.count() == 0, mism.limit(5).collect()


def test_metrics_present(spark, crawl):
    eng, _, _ = crawl
    m = eng.metrics(spark)
    assert m is not None
    names = {r["metric"] for r in m.select("metric").distinct().collect()}
    assert {"scheduled", "fetched_ok", "failed", "bytes"} <= names


def test_resume_from_checkpoint_matches_uninterrupted(spark, tmp_path):
    """Stop after 2 batches, build a NEW engine object on the same root
    (simulated restart), finish, and compare full trace + seen set against
    an uninterrupted run (ST8 semantics, reference main_scraper.py:219-355)."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root)

    full = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "full")

    part = CrawlEngine(os.path.join(tmp_root, "part"), batch_size=BATCH, n_partitions=8)
    part.attach_store(ppath, faults)
    part.init(site, robots_df)
    part.run_batch(spark)
    part.run_batch(spark)
    # restart: fresh object, same root — state comes from snapshots only
    resumed = CrawlEngine(os.path.join(tmp_root, "part"), batch_size=BATCH, n_partitions=8)
    resumed.attach_store(ppath, faults)
    resumed.run(spark, max_batches=100)

    a = [tuple(r) for r in full.crawl_order(spark).collect()]
    b = [tuple(r) for r in resumed.crawl_order(spark).collect()]
    assert a == b
    sa = {tuple(r) for r in full.seen_set(spark).collect()}
    sb = {tuple(r) for r in resumed.seen_set(spark).collect()}
    assert sa == sb


def test_bloom_and_exact_paths_agree(spark, tmp_path):
    """Force the bloom pre-filter on (bloom_min_seen=0) and verify the
    crawl is identical to the exact-join path."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    a = _run_engine(
        spark, tmp_root, site, robots_df, ppath, faults, "exact", use_bloom=False
    )
    b = _run_engine(
        spark, tmp_root, site, robots_df, ppath, faults, "bloom",
        use_bloom=True, bloom_min_seen=0,
    )
    assert [tuple(r) for r in a.crawl_order(spark).collect()] == [
        tuple(r) for r in b.crawl_order(spark).collect()
    ]
    assert {tuple(r) for r in a.seen_set(spark).collect()} == {
        tuple(r) for r in b.seen_set(spark).collect()
    }


def test_storage_gate_stops_crawl_on_byte_budget(spark, tmp_path):
    """P9: with a byte budget the crawl stops admitting batches once
    cumulative validated payload bytes reach it — partial progress, clean
    checkpoint, and resumable if the budget is raised."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = CrawlEngine(
        os.path.join(tmp_root, "gated"),
        batch_size=BATCH,
        n_partitions=8,
        max_storage_bytes=1,  # one successful batch blows the budget
    )
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)
    stats = eng.run(spark, max_batches=100)
    # first batch commits (gate checks BEFORE each batch), nothing after
    assert len(stats) == 1
    assert stats[0]["bytes"] > 1
    seen = eng.seen_set(spark)
    n_after_gate = 0 if seen is None else seen.count()
    assert 0 < n_after_gate < N_PAGES * VPP
    # raising the budget resumes from the checkpoint and finishes
    eng2 = CrawlEngine(
        os.path.join(tmp_root, "gated"), batch_size=BATCH, n_partitions=8
    )
    eng2.attach_store(ppath, faults)
    eng2.run(spark, max_batches=100)
    assert eng2.seen_set(spark).count() > n_after_gate


def test_head_probe_annotates_expected_bytes(spark, tmp_path):
    """S8: the HEAD content-length probe adds the origin's advertised size
    (null where the origin 404s) without transferring bodies."""
    from web_scraper_spark.operators.frontier import seed_frontier_from_site
    from web_scraper_spark.sources.store import head_content_length

    tmp_root = str(tmp_path)
    site, _, ppath, _ = _fixture(spark, tmp_root, with_faults=False)
    batch = seed_frontier_from_site(site).limit(30)
    payload = spark.read.parquet(ppath)
    probed = head_content_length(batch, payload)
    rows = probed.collect()
    assert len(rows) == 30
    sizes = {r["image_id"]: len(bytes(r["bytes"])) for r in payload.collect()}
    for r in rows:
        want = sizes.get(r["image_id"])
        assert r["expected_bytes"] == want
    # pruned variant agrees on the covered range
    ids = sorted(r["image_id"] for r in rows)
    pruned = head_content_length(batch, payload, id_range=(ids[0], ids[-1]))
    assert {(r["image_id"], r["expected_bytes"]) for r in pruned.collect()} == {
        (r["image_id"], r["expected_bytes"]) for r in rows
    }


def test_audit_payload_clean_and_detects_tampering(spark, crawl):
    """S15 engine-level audit: a finished crawl reconciles clean; doctored
    tables surface each discrepancy category."""
    eng, oracle, _ = crawl
    audit = eng.audit_payload(spark)
    cats = {r["category"] for r in audit.collect()}
    assert cats == {"ok"}
    assert audit.count() == eng.seen_set(spark).count()

    # doctored: drop one payload row (seen_no_payload), truncate another's
    # bytes (invalid_payload), add an orphan payload row (payload_not_seen)
    payload = eng.payload_out.read(spark)
    rows = payload.orderBy("image_id").limit(3).collect()
    drop_id, corrupt_id = rows[0]["image_id"], rows[1]["image_id"]
    doctored = (
        payload.filter(F.col("image_id") != drop_id)
        .withColumn(
            "bytes",
            F.when(
                F.col("image_id") == corrupt_id,
                F.expr("substring(bytes, 1, 10)"),
            ).otherwise(F.col("bytes")),
        )
    )
    orphan = payload.limit(1).withColumn("image_id", F.lit("99999999"))
    doctored = doctored.unionByName(orphan)
    audit2 = eng.audit_payload(spark, payload_df=doctored)
    by_cat = {
        r["image_id"]: r["category"]
        for r in audit2.filter(F.col("category") != "ok").collect()
    }
    assert by_cat[drop_id] == "seen_no_payload"
    assert by_cat[corrupt_id] == "invalid_payload"
    assert by_cat["99999999"] == "payload_not_seen"
    assert len(by_cat) == 3


def test_lineage_tracks_commit_provenance(spark, crawl):
    """Every live file group of every state table names its creating
    commit (per-partition lineage, ST8 / north star)."""
    eng, oracle, _ = crawl
    rows = eng.lineage(spark).collect()
    assert rows and all(r["origin"] for r in rows)
    by_table: dict[str, set] = {}
    for r in rows:
        by_table.setdefault(r["table"], set()).add(r["origin"])
    assert by_table["robots"] == {"init"}
    # payload/seen commit together: identical batch provenance
    assert by_table["payload_out"] == by_table["seen"]
    assert all(o.startswith("batch:") for o in by_table["payload_out"])
    # the frontier merged at least one batch's buckets
    assert any(o.startswith("batch:") for o in by_table["frontier"])


def test_run_retries_transient_midbatch_failure(spark, tmp_path):
    """The batch is the engine's unit of recovery IN-PROCESS too: a batch
    that dies AFTER some table commits (payload/seen/bloom_delta are
    durable, the checkpoint is not) is re-run by run()'s transient-retry
    loop, the orphaned versions are superseded by base_version commits,
    and the finished crawl is indistinguishable from an uninterrupted one
    — the same contract test_resume_from_checkpoint proves across
    processes, exercised here without a restart."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root)
    clean = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "clean")

    eng = CrawlEngine(os.path.join(tmp_root, "flaky"), batch_size=BATCH, n_partitions=8)
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)
    # inject a mid-batch fault: schedule_log commits AFTER payload_out,
    # seen and bloom_delta (plans/crawl.py batch commit order), so the
    # first two attempts of batch 0 leave real orphan versions behind
    real_commit = eng.schedule_log.commit_append
    boom = {"left": 2}

    def flaky(df, base_version=None, origin=None):
        if boom["left"] > 0:
            boom["left"] -= 1
            raise RuntimeError("injected mid-batch transient fault")
        return real_commit(df, base_version=base_version, origin=origin)

    eng.schedule_log.commit_append = flaky
    eng.run(spark, max_batches=100)  # transient_retries=2 absorbs both
    assert boom["left"] == 0

    def trace(e):
        return [
            (r["seq"], r["url"], r["image_id"])
            for r in e.crawl_order(spark).collect()
        ]

    assert trace(eng) == trace(clean)
    a = {r["url_hash"] for r in clean.seen_set(spark).collect()}
    b = {r["url_hash"] for r in eng.seen_set(spark).collect()}
    assert a == b
    # the retried batch's payload is single-copy (orphans superseded,
    # never unioned): one row per fetched image
    pay = eng.payload_out.read(spark)
    assert pay.groupBy("image_id").count().filter(F.col("count") > 1).count() == 0


def test_run_raises_after_retry_budget(spark, tmp_path):
    """A DETERMINISTIC failure must surface, not loop: with the injected
    fault outliving transient_retries, run() re-raises."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = CrawlEngine(os.path.join(tmp_root, "state"), batch_size=BATCH, n_partitions=8)
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)

    def always_boom(df, base_version=None, origin=None):
        raise RuntimeError("deterministic fault")

    eng.schedule_log.commit_append = always_boom
    with pytest.raises(RuntimeError, match="deterministic fault"):
        eng.run(spark, max_batches=100, transient_retries=1)


def _robots_from_pdf(spark, pdf):
    return spark.createDataFrame(pdf, schema=schemas.ROBOTS_SCHEMA)


def test_refresh_robots_unblocks_allowed_urls(spark, tmp_path):
    """Mid-crawl robots refresh, unblock direction: rules relaxed after the
    crawl finished → previously robots_blocked rows flip to pending and a
    rerun fetches exactly them; history (done rows) untouched."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = _run_engine(spark, tmp_root, site, robots_df, ppath, faults, "rr")
    fr0 = eng.frontier.read(spark)
    n_blocked0 = fr0.filter(F.col("status") == "robots_blocked").count()
    n_done0 = fr0.filter(F.col("status") == "done").count()
    n_seen0 = eng.seen_set(spark).count()
    assert n_blocked0 > 0

    permissive = datagen.gen_robots_pdf()
    permissive["disallow_prefixes"] = [[] for _ in range(len(permissive))]
    stats = eng.refresh_robots(spark, _robots_from_pdf(spark, permissive))
    assert stats == {"unblocked": n_blocked0, "blocked_pending": 0, "blocked_failed": 0}

    runs = eng.run(spark, max_batches=50)
    assert sum(s.get("fetched_ok", 0) for s in runs) == n_blocked0
    fr1 = eng.frontier.read(spark)
    assert fr1.filter(F.col("status") == "robots_blocked").count() == 0
    assert fr1.filter(F.col("status") == "done").count() == n_done0 + n_blocked0
    assert eng.seen_set(spark).count() == n_seen0 + n_blocked0


def test_refresh_robots_blocks_pending_mid_crawl(spark, tmp_path):
    """Block direction: rules tightened after 2 batches → every unfetched
    URL the new rules disallow flips to robots_blocked (gated immediately,
    not at schedule time), none of them is ever fetched afterwards, and the
    crawl still completes."""
    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    eng = CrawlEngine(os.path.join(tmp_root, "rb"), batch_size=BATCH, n_partitions=8)
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)
    for _ in range(2):
        eng.run_batch(spark)
    trace_pre = {r["url"] for r in eng.crawl_order(spark).collect()}

    tightened = datagen.gen_robots_pdf()
    tightened.loc[
        tightened["host"] == datagen.HOT_HOST, "disallow_prefixes"
    ] = [["/video/"]]
    new_rules = {r.host: list(r.disallow_prefixes) for r in tightened.itertuples()}

    def disallowed(url, host):
        from urllib.parse import urlparse

        path = urlparse(url).path or "/"
        return any(path.startswith(p) for p in new_rules.get(host, []))

    pending_rows = (
        eng.frontier.read(spark)
        .filter(F.col("status").isin("pending", "failed"))
        .select("url", "host")
        .collect()
    )
    expect_blocked = sum(1 for r in pending_rows if disallowed(r["url"], r["host"]))
    assert expect_blocked > 0

    stats = eng.refresh_robots(spark, _robots_from_pdf(spark, tightened))
    assert stats["blocked_pending"] + stats["blocked_failed"] == expect_blocked

    eng.run(spark, max_batches=50)
    fr = eng.frontier.read(spark)
    blocked_urls = {
        r["url"] for r in fr.filter(F.col("status") == "robots_blocked").collect()
    }
    # nothing blocked at refresh time was fetched afterwards
    trace_post = {r["url"] for r in eng.crawl_order(spark).collect()}
    assert not (trace_post - trace_pre) & blocked_urls
    # every unfetched hot-host URL ended robots_blocked
    hot_unfetched = {
        r["url"]
        for r in fr.filter(
            (F.col("host") == datagen.HOT_HOST) & (F.col("status") != "done")
        ).collect()
    }
    assert hot_unfetched <= blocked_urls
