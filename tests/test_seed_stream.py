"""Streaming seed ingestion (streaming/seeds.py + CrawlEngine.add_seeds):
a crawl that receives its site graph INCREMENTALLY over a Structured
Streaming file source must converge to the same final state as a crawl
seeded with everything at init — same seen set, same terminal statuses,
same validated payload rows — and frontier state must stay
effectively-once under stream-checkpoint loss: the (query id, batch id)
fence lives in the ENGINE checkpoint, scoped to the stream lineage, and
renumbered/new-lineage batches fall through to add_seeds' idempotent
anti-join (replays add 0; genuinely new files land)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from web_scraper_spark import datagen, schemas
from web_scraper_spark.plans.crawl import CrawlEngine
from web_scraper_spark.streaming.seeds import crawl_with_seed_stream, seed_stream_pass

N_PAGES, VPP, BATCH = 5, 24, 50


def _fixture(spark, tmp_root):
    site = datagen.site_graph_df(spark, N_PAGES, VPP)
    robots = datagen.robots_df(spark)
    ppath = os.path.join(tmp_root, "origin_payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(N_PAGES * VPP), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)
    fpdf = datagen.gen_fault_plan_pdf(N_PAGES * VPP, fail_rate=0.15)
    faults = {r.image_id: (r.fail_mode, int(r.fail_count)) for r in fpdf.itertuples()}
    return site, robots, ppath, faults


def _final_state(spark, eng):
    frontier = eng.frontier.read(spark)
    statuses = {
        r["status"]: r["n"]
        for r in frontier.groupBy("status").agg(F.count("*").alias("n")).collect()
    }
    seen = {
        (r["url_hash"], r["image_id"])
        for r in eng.seen_set(spark).select("url_hash", "image_id").collect()
    }
    pay_ids = sorted(
        r["image_id"] for r in eng.payload_out.read(spark).select("image_id").collect()
    )
    return statuses, seen, pay_ids


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    """Reference run (all pages at init) + streamed run (2 pages at init,
    the rest arriving as parquet drops between crawl rounds)."""
    tmp_root = str(tmp_path_factory.mktemp("seedstream"))
    site, robots, ppath, faults = _fixture(spark, tmp_root)

    ref = CrawlEngine(os.path.join(tmp_root, "ref"), batch_size=BATCH, n_partitions=8)
    ref.attach_store(ppath, faults)
    ref.init(site, robots)
    ref.run(spark, max_batches=100)

    seed_dir = os.path.join(tmp_root, "seed_feed")
    ck_dir = os.path.join(tmp_root, "seed_ck")
    os.makedirs(seed_dir, exist_ok=True)
    init_part = site.filter(F.col("page") <= 2)
    # capacity must cover the whole crawl, not just the init slice — the
    # documented add_seeds contract (filter geometry is fixed at init)
    eng = CrawlEngine(
        os.path.join(tmp_root, "streamed"),
        batch_size=BATCH,
        n_partitions=8,
        bloom_capacity=4 * N_PAGES * VPP,
    )
    eng.attach_store(ppath, faults)
    eng.init(init_part, robots)

    drops = {0: [3], 1: [4, 5]}  # round index -> pages dropped AFTER that round

    def on_round(i):
        for pg in drops.get(i, []):
            # append part-files into the flat feed dir — the file-source
            # stream discovers exactly the new files next pass
            site.filter(F.col("page") == pg).write.mode("append").parquet(seed_dir)

    rounds = crawl_with_seed_stream(spark, eng, seed_dir, ck_dir, on_round=on_round)
    return spark, ref, eng, rounds, site, seed_dir, ck_dir


def test_streamed_crawl_converges_to_reference_state(streamed):
    spark, ref, eng, rounds, *_ = streamed
    assert sum(r["ingested_urls"] for r in rounds) == 3 * VPP
    r_stat, r_seen, r_pay = _final_state(spark, ref)
    s_stat, s_seen, s_pay = _final_state(spark, eng)
    assert s_stat == r_stat
    assert s_seen == r_seen
    assert s_pay == r_pay


def test_streamed_crawl_interleaved_work(streamed):
    """The drops really arrived mid-crawl: later rounds both ingested and
    crawled (this is not an everything-at-init rerun in disguise)."""
    _, _, _, rounds, *_ = streamed
    assert len(rounds) >= 3
    assert rounds[1]["ingested_urls"] > 0 and rounds[1]["crawl_batches"] > 0


def test_replay_after_stream_checkpoint_loss_is_noop(streamed):
    """Losing the stream's own checkpoint directory forces a full replay
    of every file under a NEW query lineage. The raw batch-id fence no
    longer applies (ids renumber from 0 — see ADVICE r3: skipping here
    silently dropped genuinely-new batches); instead the replay falls
    through to add_seeds, whose url_hash anti-join makes frontier STATE a
    no-op: zero added, frontier version unchanged, pending unchanged. A
    maintenance checkpoint adopting the new lineage id IS written."""
    spark, _, eng, _, site, seed_dir, ck_dir = streamed
    before = eng.checkpoints.latest()
    shutil.rmtree(ck_dir)
    n = seed_stream_pass(spark, eng, seed_dir, ck_dir + "_replay")
    assert n == 0
    after = eng.checkpoints.latest()
    assert after["versions"]["frontier"] == before["versions"]["frontier"]
    assert after.get("pending_detail") == before.get("pending_detail")
    # the fence re-anchored to the new stream lineage
    assert after.get("seed_stream_query_id") is not None
    assert after.get("seed_stream_query_id") != before.get("seed_stream_query_id")


def test_new_files_after_stream_checkpoint_loss_are_ingested(spark, tmp_path):
    """The ADVICE r3 scenario end-to-end: consume a seed drop, lose the
    stream checkpoint (ids renumber from 0), drop genuinely NEW files —
    they must land in the frontier, not be fenced out as 'replays'."""
    tmp_root = str(tmp_path)
    site, robots, ppath, faults = _fixture(spark, tmp_root)
    eng = CrawlEngine(
        os.path.join(tmp_root, "lossy"), batch_size=BATCH, n_partitions=8,
        bloom_capacity=4 * N_PAGES * VPP,
    )
    eng.attach_store(ppath, faults)
    eng.init(site.filter(F.col("page") <= 2), robots)
    seed_dir = os.path.join(tmp_root, "feed")
    ck_dir = os.path.join(tmp_root, "ck")
    os.makedirs(seed_dir, exist_ok=True)
    site.filter(F.col("page") == 3).write.mode("append").parquet(seed_dir)
    n1 = seed_stream_pass(spark, eng, seed_dir, ck_dir)
    assert n1 == VPP
    fence_before = int(eng.checkpoints.latest()["seed_stream_batch_id"])
    shutil.rmtree(ck_dir)  # stream checkpoint gone — batch ids restart at 0
    site.filter(F.col("page").isin(4, 5)).write.mode("append").parquet(seed_dir)
    n2 = seed_stream_pass(spark, eng, seed_dir, ck_dir)
    assert n2 == 2 * VPP, (
        f"new seed files fenced out after checkpoint loss (fence was "
        f"{fence_before}) — at-most-once regression"
    )
    # and a THIRD pass with nothing new is a pure no-op again
    assert seed_stream_pass(spark, eng, seed_dir, ck_dir) == 0


def test_add_seeds_idempotent_and_counted(spark, tmp_path):
    """Direct add_seeds: new rows append once; a replayed delta adds 0;
    already-crawled urls are not re-opened."""
    tmp_root = str(tmp_path)
    site, robots, ppath, faults = _fixture(spark, tmp_root)
    eng = CrawlEngine(
        os.path.join(tmp_root, "st"), batch_size=BATCH, n_partitions=8,
        bloom_capacity=4 * N_PAGES * VPP,
    )
    eng.attach_store(ppath, faults)
    eng.init(site.filter(F.col("page") <= 4), robots)
    eng.run(spark, max_batches=100)
    delta = site.filter(F.col("page") >= 4)  # page 4 already crawled, 5 new
    out1 = eng.add_seeds(spark, delta)
    assert out1["added"] == VPP  # only page 5
    out2 = eng.add_seeds(spark, delta)
    assert out2["added"] == 0
    eng.run(spark, max_batches=100)
    done = (
        eng.frontier.read(spark)
        .filter(F.col("status").isin("done", "robots_blocked", "permanent", "skipped_seen"))
        .count()
    )
    assert done == N_PAGES * VPP
