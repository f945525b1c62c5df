"""Bucketed (pre-shuffled) tables → co-located join evidence.

The 100 TB claim "co-locate the big joins via bucketing" made in
BENCH.md/SURVEY §4 is checked here against the actual physical plan:
two tables bucketed by the join key at the same bucket count join with
NO Exchange on either side (the scan's HashPartitioning(k, n) already
satisfies the join's distribution requirement), and a point predicate on
the bucket key prunes the scan to 1 of n buckets at planning time.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

N = 20_000
BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    """Two bucketed tables sharing key space, written once per module."""
    base = tmp_path_factory.mktemp("bucketed")
    a = spark.range(N).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(0, N, 2).select(
        F.col("id").alias("k"), (F.col("id") % 89).alias("vb")
    )
    for name, df in (("t_bkt_a", a), ("t_bkt_b", b)):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .option("path", str(base / name))
            .bucketBy(BUCKETS, "k")
            .sortBy("k")
            .format("parquet")
            .saveAsTable(name)
        )
    yield "t_bkt_a", "t_bkt_b"
    for name in ("t_bkt_a", "t_bkt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def _executed(df) -> str:
    df.collect()  # let AQE finalize
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_shuffle_free(spark, bucketed):
    ta, tb = bucketed
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table(ta).join(spark.table(tb), "k")
        plan = _executed(j)
        assert "SortMergeJoin" in plan
        # the whole point: no shuffle anywhere — both scans already
        # report HashPartitioning(k, BUCKETS)
        assert "Exchange" not in plan, plan
        assert j.count() == N // 2
        # identical result to the plain (shuffled) join
        pa = spark.table(ta)
        pb = spark.table(tb)
        plain = (
            pa.join(pb.hint("shuffle_merge"), "k")
            .select("k", "va", "vb")
            .collect()
        )
        assert sorted(map(tuple, j.select("k", "va", "vb").collect())) == sorted(
            map(tuple, plain)
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_is_shuffle_free(spark, bucketed):
    """Aggregation on the bucket key reuses the table's clustering too —
    the same property that makes per-host frontier rollups exchange-free
    on a host-bucketed layout."""
    ta, _ = bucketed
    agg = spark.table(ta).groupBy("k").agg(F.sum("va").alias("s"))
    plan = _executed(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == N


def test_bucket_pruning_on_point_predicate(spark, bucketed):
    """k = const prunes the scan to 1 of BUCKETS buckets at planning time
    (the FileSourceScan reports SelectedBucketsCount)."""
    ta, _ = bucketed
    # a bare filter doesn't need the bucketed distribution, so Spark's
    # auto-bucketed-scan would fall back to a plain file scan and forfeit
    # the pruning — pin the bucketed read for this check
    prev = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        q = spark.table(ta).filter(F.col("k") == 12345)
        plan = _executed(q)
        assert f"SelectedBucketsCount: 1 out of {BUCKETS}" in plan, plan
        assert q.count() == 1
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", prev)
