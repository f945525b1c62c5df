"""Cuckoo seen-set properties: no false negatives, tight FPR, incremental
insert equivalence, DELETE support (the capability Bloom can't provide),
probe-path duality, and a numpy-local high-load eviction exercise."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.cuckoo import (
    SLOTS,
    _delete_from,
    _fp_index,
    _insert_into,
    build_cuckoo_shards,
    cuckoo_params,
    cuckoo_probe,
    delete_cuckoo_shards,
    empty_cuckoo_shards,
    update_cuckoo_shards,
)


def _keys(spark, start, n, salt="k"):
    return spark.range(start, start + n).select(
        F.xxhash64(F.concat(F.lit(salt), F.col("id"))).alias("url_hash")
    )


def test_cuckoo_no_false_negatives(spark):
    seen = _keys(spark, 0, 5000)
    shards = build_cuckoo_shards(seen, n_shards=8)
    probed = cuckoo_probe(seen, shards, n_shards=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_cuckoo_fpr_tighter_than_bloom(spark):
    seen = _keys(spark, 0, 5000)
    unseen = _keys(spark, 0, 20000, salt="other")
    shards = build_cuckoo_shards(seen, n_shards=8)
    fp = cuckoo_probe(unseen, shards, n_shards=8).filter(F.col("maybe_seen")).count()
    # theoretical FPR ≈ 2·SLOTS/2^16 ≈ 0.012%; allow a wide margin
    assert fp / 20000 < 0.005


def test_incremental_equals_batch_build(spark):
    a = _keys(spark, 0, 2000)
    b = _keys(spark, 2000, 2000)
    inc = update_cuckoo_shards(
        update_cuckoo_shards(
            empty_cuckoo_shards(spark, 8, capacity=8000), a, n_shards=8
        ),
        b,
        n_shards=8,
    )
    both = a.unionByName(b)
    assert cuckoo_probe(both, inc, n_shards=8).filter(~F.col("maybe_seen")).count() == 0
    geom = inc.select("m_buckets").distinct().collect()
    assert len(geom) == 1  # geometry fixed at init, never resized


def test_delete_removes_membership_and_keeps_the_rest(spark):
    """The reason cuckoo exists next to Bloom: retracting keys."""
    keep = _keys(spark, 0, 3000)
    gone = _keys(spark, 3000, 1000)
    shards = update_cuckoo_shards(
        empty_cuckoo_shards(spark, 8, capacity=8000),
        keep.unionByName(gone),
        n_shards=8,
    )
    after = delete_cuckoo_shards(shards, gone, n_shards=8)
    # deleted keys: no longer members (up to fingerprint-collision FPR)
    still = cuckoo_probe(gone, after, n_shards=8).filter(F.col("maybe_seen")).count()
    assert still / 1000 < 0.005
    # kept keys: never disturbed — zero false negatives after the delete
    assert (
        cuckoo_probe(keep, after, n_shards=8).filter(~F.col("maybe_seen")).count() == 0
    )


def test_aligned_probe_equals_broadcast_probe(spark):
    seen = _keys(spark, 0, 4000)
    mixed = _keys(spark, 0, 2000).unionByName(_keys(spark, 0, 2000, salt="other"))
    shards = build_cuckoo_shards(seen, n_shards=8)
    bcast = {
        r["url_hash"]: r["maybe_seen"]
        for r in cuckoo_probe(
            mixed, shards, n_shards=8, partition_aligned=False
        ).collect()
    }
    aligned = {
        r["url_hash"]: r["maybe_seen"]
        for r in cuckoo_probe(
            mixed, shards, n_shards=8, partition_aligned=True
        ).collect()
    }
    assert bcast == aligned


def test_high_load_insert_and_eviction_numpy_local():
    """Fill one table to 90% of slots — far past the vectorized fast path —
    and verify every key is still found (the eviction walk must relocate,
    never drop)."""
    rng = np.random.default_rng(7)
    m = cuckoo_params(4000)  # sized for 4000 at 84% load
    table = np.zeros((m, SLOTS), np.uint16)
    n = int(m * SLOTS * 0.90)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    _insert_into(table, keys)
    f, i = _fp_index(np.unique(keys.view(np.uint64)), m)
    from web_scraper_spark.operators.cuckoo import _contains

    assert bool(_contains(table, f, i).all())


def test_over_capacity_raises_not_drops():
    m = 4  # 16 slots total
    table = np.zeros((m, SLOTS), np.uint16)
    keys = np.arange(1, 200, dtype=np.int64)  # ~12× over capacity
    with pytest.raises(ValueError, match="over capacity"):
        _insert_into(table, keys)


def test_mark_seen_cuckoo_matches_exact(spark):
    from web_scraper_spark.operators.dedup import mark_seen

    seen = _keys(spark, 0, 3000)
    batch = _keys(spark, 0, 1500).unionByName(_keys(spark, 0, 1500, salt="new"))
    shards = build_cuckoo_shards(seen, n_shards=8)
    got = {
        r["url_hash"]: r["is_seen"]
        for r in mark_seen(
            batch, seen, bloom_shards=shards, n_shards=8, filter_kind="cuckoo"
        ).collect()
    }
    truth = {r["url_hash"] for r in seen.collect()}
    assert all(got[h] == (h in truth) for h in got)


def test_engine_cuckoo_trace_equals_bloom(spark, tmp_path):
    """A full crawl with seen_filter='cuckoo' must reproduce the bloom
    engine's schedule trace and seen set exactly (both filters are
    no-false-negative pre-filters in front of the same exact join)."""
    import os

    from web_scraper_spark import datagen, schemas
    from web_scraper_spark.plans.crawl import CrawlEngine

    n_pages, vpp, batch = 3, 12, 30
    site = datagen.site_graph_df(spark, n_pages, vpp)
    robots = datagen.robots_df(spark)
    ppath = os.path.join(str(tmp_path), "origin_payload")
    spark.createDataFrame(
        datagen.gen_payload_pdf(n_pages * vpp), schema=schemas.PAYLOAD_SCHEMA
    ).write.parquet(ppath)

    traces = {}
    for kind in ("bloom", "cuckoo"):
        eng = CrawlEngine(
            os.path.join(str(tmp_path), kind),
            batch_size=batch,
            n_partitions=8,
            bloom_min_seen=0,
            seen_filter=kind,
        )
        eng.attach_store(ppath, {})
        eng.init(site, robots)
        eng.run(spark, max_batches=50)
        order = [(r["seq"], r["url"]) for r in eng.crawl_order(spark).collect()]
        seen = sorted(r["url_hash"] for r in eng.seen_set(spark).collect())
        traces[kind] = (order, seen)
    assert traces["cuckoo"] == traces["bloom"]


def test_colliding_keys_survive_each_others_delete_numpy_local():
    """Two DISTINCT keys that collide on (fingerprint, bucket-pair) must
    each hold their own stored copy (Fan et al. delete-support rule), so
    deleting one never false-negatives the other. Regression for the
    round-2 advisory: the old insert skipped already-present fingerprints,
    sharing one copy between colliding keys."""
    from web_scraper_spark.operators.cuckoo import _alt, _contains

    m = 2  # tiny bucket space so a (fp, pair) collision is findable fast
    groups: dict[tuple, list[int]] = {}
    pair = None
    for k in range(1, 2_000_000):
        h = np.asarray([k], np.int64)
        f, i = _fp_index(h.view(np.uint64), m)
        i2 = _alt(i, f, m)
        sig = (int(f[0]), min(int(i[0]), int(i2[0])), max(int(i[0]), int(i2[0])))
        groups.setdefault(sig, []).append(k)
        if len(groups[sig]) == 2:
            pair = groups[sig]
            break
    assert pair is not None, "no (fp, bucket-pair) collision found in scan"
    a, b = pair
    table = np.zeros((m, SLOTS), np.uint16)
    _insert_into(table, np.asarray([a], np.int64))
    _insert_into(table, np.asarray([b], np.int64))
    f_sig = np.uint16(_fp_index(np.asarray([a], np.uint64), m)[0][0])
    assert int((table == f_sig).sum()) == 2  # one copy per key, not shared
    _delete_from(table, np.asarray([a], np.int64))
    fb, ib = _fp_index(np.asarray([b], np.int64).view(np.uint64), m)
    assert bool(_contains(table, fb, ib).all())  # b never disturbed


def test_delete_then_reinsert_roundtrip_numpy_local():
    table = np.zeros((cuckoo_params(1000), SLOTS), np.uint16)
    keys = np.arange(10_000, 11_000, dtype=np.int64)
    _insert_into(table, keys)
    _delete_from(table, keys)
    assert int((table != 0).sum()) == 0  # every fingerprint cleared
    _insert_into(table, keys)
    f, i = _fp_index(keys.view(np.uint64), table.shape[0])
    from web_scraper_spark.operators.cuckoo import _contains

    assert bool(_contains(table, f, i).all())
