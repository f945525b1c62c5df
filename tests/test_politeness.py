"""Politeness operators: two-level wave ranking must equal the naive
per-host window; salting splits only hot hosts and is deterministic."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from web_scraper_spark import datagen
from web_scraper_spark.operators.frontier import seed_frontier_from_site
from web_scraper_spark.operators.politeness import assign_waves, salted_repartition


def _batch(spark, n_pages=4, vpp=12):
    return seed_frontier_from_site(datagen.site_graph_df(spark, n_pages, vpp))


def test_waves_match_naive_window(spark):
    batch = _batch(spark)
    got = {
        r["url_hash"]: (r["host_rank"], r["fetch_wave"])
        for r in assign_waves(batch, 3).collect()
    }
    w = Window.partitionBy("host").orderBy(
        F.col("priority").desc(), F.col("position").asc(), F.col("url_hash").asc()
    )
    naive = batch.withColumn("hr", F.row_number().over(w) - 1)
    want = {
        r["url_hash"]: (r["hr"], r["hr"] // 3) for r in naive.collect()
    }
    assert got == want


def test_waves_bound_per_host_parallelism(spark):
    waved = assign_waves(_batch(spark), per_host_parallelism=3)
    per_wave = waved.groupBy("host", "fetch_wave").count().collect()
    assert all(r["count"] <= 3 for r in per_wave)


def test_salting_splits_only_hot_hosts(spark):
    # explicit hot list (the engine path: hot hosts precomputed in its
    # stats pass): only the listed host splits, everything else salt 0
    waved = assign_waves(_batch(spark), 3)
    placed = salted_repartition(
        waved, n_partitions=8, n_salts=4, hot_hosts=[datagen.HOT_HOST]
    )
    salts = placed.groupBy("host").agg(F.countDistinct("salt").alias("n_salts")).collect()
    by_host = {r["host"]: r["n_salts"] for r in salts}
    assert by_host[datagen.HOT_HOST] > 1
    assert all(v == 1 for h, v in by_host.items() if h != datagen.HOT_HOST)


def test_salting_autodetect_respects_threshold(spark):
    # standalone path: hosts are salted iff their batch share exceeds the
    # threshold — computed from the fixture, not assumed (in the 48-row
    # fixture some cold hosts legitimately cross 10%)
    waved = assign_waves(_batch(spark), 3)
    total = waved.count()
    shares = {
        r["host"]: r["count"] / total for r in waved.groupBy("host").count().collect()
    }
    placed = salted_repartition(waved, n_partitions=8, n_salts=4, hot_threshold=0.10)
    by_host = {
        r["host"]: r["n_salts"]
        for r in placed.groupBy("host")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .collect()
    }
    for host, share in shares.items():
        if share <= 0.10:
            assert by_host[host] == 1, host
    assert by_host[datagen.HOT_HOST] > 1  # ~50% share is always hot


def test_salting_deterministic(spark):
    waved = assign_waves(_batch(spark), 3)
    a = {(r["url_hash"], r["salt"]) for r in salted_repartition(waved, 8).collect()}
    b = {(r["url_hash"], r["salt"]) for r in salted_repartition(waved, 8).collect()}
    assert a == b
