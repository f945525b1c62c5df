"""Bloom seen-set properties: no false negatives ever, bounded FPR, and
incremental maintenance equivalence (north rule: the filter is maintained,
not rebuilt)."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.operators.dedup import (
    bloom_probe,
    build_bloom_shards,
    dedup_against_seen,
    empty_bloom_shards,
    exact_anti_join_seen,
    mark_seen,
    update_bloom_shards,
)


def _keys(spark, start, n, salt="k"):
    return spark.range(start, start + n).select(
        F.xxhash64(F.concat(F.lit(salt), F.col("id"))).alias("url_hash")
    )


def test_bloom_no_false_negatives(spark):
    seen = _keys(spark, 0, 5000)
    shards = build_bloom_shards(seen, n_shards=8)
    probed = bloom_probe(seen, shards, n_shards=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0


def test_bloom_fpr_bounded(spark):
    seen = _keys(spark, 0, 5000)
    unseen = _keys(spark, 0, 5000, salt="other")
    shards = build_bloom_shards(seen, n_shards=8, fpr=0.01)
    probed = bloom_probe(unseen, shards, n_shards=8)
    fp = probed.filter(F.col("maybe_seen")).count()
    assert fp / 5000 < 0.05  # target 1%, generous bound


def test_incremental_equals_batch_build(spark):
    """empty + k updates must accept exactly what one full build accepts
    (same geometry → identical bit patterns)."""
    a = _keys(spark, 0, 2000)
    b = _keys(spark, 2000, 2000)
    inc = update_bloom_shards(
        update_bloom_shards(empty_bloom_shards(spark, 8, capacity=4000), a, n_shards=8),
        b,
        n_shards=8,
    )
    both = a.unionByName(b)
    probed = bloom_probe(both, inc, n_shards=8)
    assert probed.filter(~F.col("maybe_seen")).count() == 0
    # geometry check: all shards share one (m_bits, k)
    geom = inc.select("m_bits", "k").distinct().collect()
    assert len(geom) == 1


def test_mark_seen_with_prebuilt_shards_matches_exact(spark):
    seen = _keys(spark, 0, 3000)
    batch = _keys(spark, 0, 6000).withColumn("x", F.lit(1))  # half seen
    shards = update_bloom_shards(
        empty_bloom_shards(spark, 8, capacity=6000), seen, n_shards=8
    )
    flagged = mark_seen(batch, seen, bloom_shards=shards, n_shards=8)
    exact = exact_anti_join_seen(batch, seen)
    assert flagged.filter(~F.col("is_seen")).count() == exact.count()
    assert flagged.filter(F.col("is_seen")).count() == 6000 - exact.count()


def test_dedup_against_seen_bloom_equals_exact(spark):
    seen = _keys(spark, 0, 4000)
    frontier = _keys(spark, 0, 8000)
    via_bloom = dedup_against_seen(frontier, seen, use_bloom=True, n_shards=8)
    via_exact = dedup_against_seen(frontier, seen, use_bloom=False)
    assert {r["url_hash"] for r in via_bloom.collect()} == {
        r["url_hash"] for r in via_exact.collect()
    }


def test_aligned_probe_equals_broadcast_probe(spark):
    """The partition-aligned (cogroup, executor-resident) probe must flag
    exactly the same rows as the broadcast probe — same filter, same keys,
    no driver collect of shard bytes on the aligned path."""
    seen = _keys(spark, 0, 5000)
    frontier = _keys(spark, 0, 2000).unionByName(_keys(spark, 0, 3000, salt="new"))
    shards = build_bloom_shards(seen, n_shards=8)
    bcast = {
        (r["url_hash"], r["maybe_seen"])
        for r in bloom_probe(
            frontier, shards, n_shards=8, partition_aligned=False
        ).collect()
    }
    aligned = {
        (r["url_hash"], r["maybe_seen"])
        for r in bloom_probe(
            frontier, shards, n_shards=8, partition_aligned=True
        ).collect()
    }
    assert aligned == bcast
    # and still no false negatives through the aligned path
    seen_hashes = {r["url_hash"] for r in seen.collect()}
    assert all(maybe for h, maybe in aligned if h in seen_hashes)


def test_aligned_probe_handles_missing_and_empty_shards(spark):
    """Keys whose shard has no bitset row (or an all-zero one) must come
    back definitely-new, not error."""
    seen = _keys(spark, 0, 1000)
    # build over 8 shards but drop half the shard rows
    shards = build_bloom_shards(seen, n_shards=8).filter(F.col("shard") < 4)
    probed = bloom_probe(seen, shards, n_shards=8, partition_aligned=True)
    rows = probed.collect()
    assert len(rows) == 1000
    # shards 4-7 are missing -> their keys read as not-seen
    for r in rows:
        shard = r["url_hash"] % 8
        if shard >= 4:
            assert not r["maybe_seen"]


def test_dedup_against_seen_aligned_equals_exact(spark):
    frontier = _keys(spark, 0, 3000).unionByName(_keys(spark, 0, 3000, salt="x"))
    seen = _keys(spark, 0, 3000)
    got = {
        r["url_hash"]
        for r in dedup_against_seen(
            frontier, seen, bloom_partition_aligned=True
        ).collect()
    }
    want = {r["url_hash"] for r in exact_anti_join_seen(frontier, seen).collect()}
    assert got == want


def test_bloom_semi_join_equals_plain_join(spark):
    """bloom_semi_join is exactly inner-join semantics (false positives die
    in the final join) while the bloom prefilter genuinely sheds the
    non-matching fact rows before the shuffle."""
    from web_scraper_spark.operators.dedup import bloom_probe as _probe
    from web_scraper_spark.operators.dedup import bloom_semi_join, build_bloom_shards

    big = spark.range(0, 20_000).select(
        (F.col("id") % 4096).alias("k"), (F.col("id") * 7).alias("v")
    )
    small = spark.range(0, 4096).filter(F.col("id") % 37 == 0).select(
        F.col("id").alias("sk"), F.lit("dim").alias("tag")
    )
    got = bloom_semi_join(big, small, big_key="k", small_key="sk")
    want = big.join(small, big.k == small.sk)
    assert got.count() == want.count()
    g = {tuple(r) for r in got.select("k", "v", "sk", "tag").collect()}
    w = {tuple(r) for r in want.select("k", "v", "sk", "tag").collect()}
    assert g == w

    # the prefilter sheds most of the fact side: ~111/4096 keys match, so
    # survivors ≈ matches + fpr·big ≪ big even with generous fpr slack
    keys = small.select(F.col("sk").cast("long").alias("k"))
    shards = build_bloom_shards(keys, key="k", n_shards=8)
    survivors = (
        _probe(big, shards, key="k", n_shards=8).filter(F.col("maybe_seen")).count()
    )
    assert survivors >= want.count()  # no false negatives
    assert survivors < big.count() * 0.2
