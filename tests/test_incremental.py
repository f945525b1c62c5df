"""Incremental view maintenance (operators/incremental.py): the per-format
payload census must equal a from-scratch groupBy after every refresh mode —
full build, O(batch) delta merges, idempotent no-op, and the
cursor-restart fallback across a maintenance rewrite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_scraper_spark.operators.incremental import MaterializedRollup
from web_scraper_spark.plans.crawl import CrawlEngine


def _census(spark, eng):
    rows = eng.payload_out.read(spark)
    return {
        (r["fmt"], r["n_images"], r["total_bytes"])
        for r in rows.groupBy("fmt")
        .agg(
            F.count("*").cast("long").alias("n_images"),
            F.sum(F.length("bytes")).cast("long").alias("total_bytes"),
        )
        .collect()
    }


def _view(spark, mv):
    return {
        (r["fmt"], r["n_images"], r["total_bytes"])
        for r in mv.read(spark).collect()
    }


def test_materialized_rollup_tracks_engine(spark, tmp_path):
    from tests.test_crawl_e2e import BATCH, _fixture

    tmp_root = str(tmp_path)
    site, robots_df, ppath, faults = _fixture(spark, tmp_root, with_faults=False)
    # small batches so the 5×24 fixture still has frontier left for the
    # post-compaction delta leg (BATCH=50 exhausts it in 3 batches)
    eng = CrawlEngine(
        os.path.join(tmp_root, "eng"), batch_size=BATCH // 2, n_partitions=8
    )
    eng.attach_store(ppath, faults)
    eng.init(site, robots_df)
    mv = MaterializedRollup(os.path.join(tmp_root, "view"))

    eng.run_batch(spark)
    assert mv.refresh(spark, eng)["mode"] == "full"
    assert _view(spark, mv) == _census(spark, eng)

    # delta merges batch-by-batch, always equal to the recompute
    for _ in range(2):
        eng.run_batch(spark)
        assert mv.refresh(spark, eng)["mode"] == "delta"
        assert _view(spark, mv) == _census(spark, eng)

    # unchanged cursor → no-op, view untouched
    assert mv.refresh(spark, eng)["mode"] == "noop"
    assert _view(spark, mv) == _census(spark, eng)

    # maintenance rewrite voids the append cursor → full rebuild fallback,
    # then delta maintenance resumes on the fresh cursor
    eng.compact_state(spark)
    assert mv.refresh(spark, eng)["mode"] == "full"
    assert _view(spark, mv) == _census(spark, eng)
    eng.run_batch(spark)
    assert mv.refresh(spark, eng)["mode"] == "delta"
    assert _view(spark, mv) == _census(spark, eng)
