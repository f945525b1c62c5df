"""Z-order layout: the pruning claim, measured on real files.

q_zorder_layout's gate oracle pins the Morton math; this test pins the
REASON to z-order — write the same events two ways (time-sorted, the
default layout any append-by-arrival table converges to, vs z-ordered on
(user, time)) as 16 real parquet files each, recompute each file's
min/max user-bucket from the files themselves (what a parquet footer /
Iceberg manifest stores), and count files a user-scoped point query must
read under min/max pruning. Time-sorted files each span ~the whole user
range (every query reads everything); z-ordered files are rectangles, so
a point query reads ~√F of F files.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from web_scraper_spark.analytics import _t, _zorder_interleave8

SF_DIR = os.environ.get("WSS_TEST_SF_DIR", "/root/testdata/sf0.001")
N_FILES = 16


def _keyed(spark):
    ev = _t(spark, SF_DIR, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    base = ev.select("event_id", F.col("user_id").alias("uid"), us.alias("us"))
    rng = base.agg(
        F.min("uid").alias("umin"),
        F.max("uid").alias("umax"),
        F.min("us").alias("smin"),
        F.max("us").alias("smax"),
    )
    j = base.crossJoin(F.broadcast(rng))
    return j.select(
        "event_id",
        F.expr("(uid - umin) * 256 div (umax - umin + 1)").alias("a8"),
        F.expr("(us - smin) * 256 div (smax - smin + 1)").alias("b8"),
    ).withColumn("zkey", _zorder_interleave8(F.col("a8"), F.col("b8")))


def _files_touched(spark, path, points):
    """Files a point query on the user dimension reads under min/max
    pruning, averaged over the probe points — from the written files'
    own stats (input_file_name), not the planner's bookkeeping."""
    stats = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("a8").alias("lo"), F.max("a8").alias("hi"))
        .collect()
    )
    assert len(stats) == N_FILES
    return sum(
        sum(1 for r in stats if r["lo"] <= p <= r["hi"]) for p in points
    ) / len(points)


def test_zorder_layout_prunes_user_scoped_scans(spark, tmp_path):
    keyed = _keyed(spark)
    zp, tp = str(tmp_path / "z"), str(tmp_path / "t")
    # production write path: range exchange on the sort key (no global
    # sort), one file per partition
    keyed.repartitionByRange(N_FILES, "zkey").sortWithinPartitions(
        "zkey"
    ).write.parquet(zp)
    keyed.repartitionByRange(N_FILES, "b8", "event_id").sortWithinPartitions(
        "b8"
    ).write.parquet(tp)

    points = [3, 40, 77, 115, 152, 190, 228, 250]  # spread across 0..255
    z_avg = _files_touched(spark, zp, points)
    t_avg = _files_touched(spark, tp, points)
    # time-sorted files each span ~the full user range → ~all 16 touched;
    # z-order folds the curve so a user slice lives in ~√16 of them
    assert t_avg > 0.8 * N_FILES
    assert z_avg <= 0.5 * t_avg
