"""Local replica of the driver's correctness gate: run each analytics query
in Spark AND its oracle SQL in DuckDB on the same parquet tables, compare
row count + column names + order-insensitive values (columns sorted by
name, rows sorted, values normalized)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from web_scraper_spark import analytics

SF_DIR = os.environ.get("WSS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows(df_rows, cols):
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df_rows)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


ALL_ORACLES = analytics.get_oracles()


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_query_matches_oracle(spark, ddb, name):
    sdf = analytics.QUERIES[name](spark, SF_DIR)
    spark_rows = [r.asDict() for r in sdf.collect()]
    odf = ddb.sql(ALL_ORACLES[name]).df()
    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns), f"{name}: column names differ"
    orows = odf.to_dict("records")
    assert len(spark_rows) == len(orows), f"{name}: row count differs"
    assert _rows(spark_rows, cols) == _rows(orows, cols), f"{name}: values differ"


@pytest.mark.parametrize("name", sorted(set(analytics.QUERIES) - set(ALL_ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = analytics.QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_cms_never_underestimates(spark):
    """Count-min's one-sided error guarantee, checked over the FULL
    vocabulary (the gate query only surfaces the top-10): every token's
    min-over-rows estimate is >= its true count, and at this vocabulary
    vs a 4x32 sketch at least one token genuinely collides (so the gate's
    `overest` column exercises real sketch behavior, not an identity)."""
    from pyspark.sql import functions as F

    from web_scraper_spark.analytics import _CMS_D, _cms_bucket, _t

    d = _t(spark, SF_DIR, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    buckets = F.array(*[_cms_bucket(j, F.col("tok")) for j in range(_CMS_D)])
    sketch = (
        toks.select(F.posexplode(buckets).alias("row_j", "bucket"))
        .groupBy("row_j", "bucket")
        .agg(F.count("*").alias("c"))
    )
    exact = toks.groupBy("tok").agg(F.count("*").alias("n_exact"))
    lk = exact.select("tok", "n_exact", F.posexplode(buckets).alias("row_j", "bucket"))
    est = (
        lk.join(F.broadcast(sketch), ["row_j", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("c").alias("cms_est"))
    )
    assert est.filter(F.col("cms_est") < F.col("n_exact")).count() == 0
    assert est.filter(F.col("cms_est") > F.col("n_exact")).count() > 0


def test_quantile_sketch_error_bound_every_percentile(spark):
    """The log₂/16-sub-bucket sketch's guarantee, checked at EVERY integer
    percentile (the gate query surfaces only p50/p95/p99): the bucket
    midpoint is within (upper−lower)/2 = lower/32 of any value in the
    bucket, so |est/exact − 1| ≤ 1/32 must hold for all 99 ranks in every
    group."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from web_scraper_spark.analytics import _t

    li = _t(spark, SF_DIR, "lineitem")
    v = li.select(
        "l_returnflag", (F.col("l_extendedprice") * 100).cast("long").alias("cents")
    )
    e = F.length(F.bin(F.col("cents"))) - 1
    b = v.select(
        "l_returnflag",
        "cents",
        (e * 16 + F.expr("shiftright(cents, length(bin(cents)) - 5)") - 16).alias(
            "bucket_id"
        ),
    )
    est = (F.col("bucket_id") % 16 + 16.5) * F.pow(
        F.lit(2.0), (F.floor(F.col("bucket_id") / 16) - 4).cast("double")
    )
    worst = b.select(
        (F.abs(est - F.col("cents")) / F.col("cents")).alias("rel_err")
    ).agg(F.max("rel_err").alias("m")).collect()[0]["m"]
    # per-VALUE bound subsumes the per-quantile bound (the estimate for any
    # rank is the midpoint of the bucket holding that rank's exact value)
    assert worst <= 1.0 / 32 + 1e-12

    # and the extraction itself: sketch quantile vs exact at all 99 ranks
    sk = b.groupBy("l_returnflag", "bucket_id").agg(F.count("*").alias("c"))
    cum = sk.withColumn(
        "cum", F.sum("c").over(Window.partitionBy("l_returnflag").orderBy("bucket_id"))
    )
    n = v.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    qs = spark.createDataFrame(
        [(i, i / 100.0) for i in range(1, 100)], "pct int, q double"
    )
    ranks = n.crossJoin(F.broadcast(qs)).select(
        "l_returnflag", "pct", F.floor(F.col("q") * (F.col("n") - 1)).alias("rk")
    )
    hit = (
        ranks.join(F.broadcast(cum), "l_returnflag")
        .filter(F.col("cum") > F.col("rk"))
        .groupBy("l_returnflag", "pct", "rk")
        .agg(F.min("bucket_id").alias("bucket_id"))
    )
    ranked = v.withColumn(
        "rn", F.row_number().over(Window.partitionBy("l_returnflag").orderBy("cents"))
    )
    both = hit.join(ranked, ["l_returnflag"]).filter(
        F.col("rn") == F.col("rk") + 1
    )
    bad = both.select(
        (F.abs(est - F.col("cents")) / F.col("cents")).alias("rel_err")
    ).filter(F.col("rel_err") > 1.0 / 32 + 1e-12)
    assert bad.count() == 0


def test_weighted_sample_inclusion_tracks_weight():
    """A-ES draws ARE length-weighted: replaying the exact key formula
    (same md5 idiom Spark evaluates) over 64 independent salts, the
    longest-quartile docs must be included far more often than the
    shortest quartile — the property that distinguishes u^(1/w) from a
    uniform top-k. Pure driver-side math: the Spark plumbing is already
    value-gated against the DuckDB oracle."""
    import hashlib

    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, length(text) AS w FROM '{SF_DIR}/documents.parquet' "
        "WHERE length(text) > 0"
    ).fetchall()
    ws = sorted(w for _, w in rows)
    q1, q3 = ws[len(ws) // 4], ws[3 * len(ws) // 4]
    k = 25
    lo_hits = hi_hits = 0
    for salt in range(64):
        keyed = [
            (
                (
                    (int(hashlib.md5(f"s{salt}:{d}".encode()).hexdigest()[:8], 16) + 0.5)
                    / 2**32
                )
                ** (1.0 / w),
                w,
            )
            for d, w in rows
        ]
        for _, w in sorted(keyed, reverse=True)[:k]:
            if w <= q1:
                lo_hits += 1
            elif w >= q3:
                hi_hits += 1
    # uniform sampling would land ≈1:1 (equal quartile sizes); the
    # length-weighted draw lands ≈3.9:1 at this corpus's ~4× quartile
    # weight ratio — 2.5× is comfortably between the two hypotheses
    assert hi_hits > 2.5 * max(lo_hits, 1)


def test_jaccard_max_df_noop_when_cap_above_all(spark):
    """DF capping with a cap above every shingle's document frequency must
    be a pure no-op (same pairs, same jaccard values)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n_docs = d.count()
    base = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in analytics.jaccard_pairs(d).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in analytics.jaccard_pairs(d, max_df=n_docs).collect()
    }
    assert capped == base
    analytics.release_caches()


def test_jaccard_max_df_keeps_near_dup_recall(spark):
    """With an aggressive stop-shingle cap the hottest join keys are
    bounded, yet the corpus's true near-duplicate pairs (which share RARE
    shingles) must all still surface."""
    from pyspark.sql import functions as F

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    exact = {
        (r["doc_a"], r["doc_b"]) for r in analytics.jaccard_pairs(d).collect()
    }
    assert exact  # fixture contains planted near-dups
    # choose a cap BELOW the corpus's hottest shingle frequency so the
    # stop-shingle filter provably drops keys at this scale factor
    sh = analytics._shingle_df(d)
    max_seen = sh.groupBy("shingle").count().agg(F.max("count")).collect()[0][0]
    assert max_seen > 1
    cap = max(1, max_seen - 1)
    n_dropped = (
        sh.groupBy("shingle").count().filter(F.col("count") > cap).count()
    )
    assert n_dropped > 0  # the cap bites
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in analytics.jaccard_pairs(d, max_df=cap).collect()
    }
    # near-dup pairs ride on rare shared shingles; dropping the hottest
    # (boilerplate) keys must not lose them on this corpus
    assert exact <= capped
    analytics.release_caches()


def test_dataset_split_append_stable(spark, tmp_path):
    """The salted-md5 split must depend only on doc_id: splitting a PREFIX
    of the corpus assigns every doc the same bucket as splitting the whole
    corpus (append-stability — growing the corpus never moves an existing
    doc across train/val/test), and the three buckets partition the corpus
    at roughly 80/10/10."""
    from pyspark.sql import functions as F

    full = {
        r["doc_id"]: r["split"]
        for r in analytics.q_dataset_split(spark, SF_DIR).collect()
    }
    n = len(full)
    assert set(full.values()) == {"train", "val", "test"}
    n_train = sum(1 for v in full.values() if v == "train")
    assert 0.7 * n <= n_train <= 0.9 * n  # binomial around 0.8·n
    # replay the split over only the first half of the corpus (a smaller
    # "yesterday" snapshot of the same table): assignments must agree
    half_ids = sorted(full)[: n // 2]
    (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter(F.col("doc_id").isin(half_ids))
        .write.parquet(f"{tmp_path}/documents.parquet")
    )
    half = {
        r["doc_id"]: r["split"]
        for r in analytics.q_dataset_split(spark, str(tmp_path)).collect()
    }
    assert half == {k: full[k] for k in half_ids}


def test_decontaminate_flags_planted_near_dups(spark):
    """Every flagged (doc, bench) pair must be a genuine high-overlap pair:
    containment is within (0.5, 1.0], n_overlap ≤ bench_sz, and no flagged
    doc is itself in the eval slice."""
    rows = analytics.q_decontaminate(spark, SF_DIR).collect()
    assert rows  # fixture's planted near-dups include eval-slice docs
    for r in rows:
        assert r["bench_id"] % 20 == 7
        assert r["doc_id"] % 20 != 7
        assert 0 < r["n_overlap"] <= r["bench_sz"]
        assert 0.5 <= r["containment"] <= 1.0
    analytics.release_caches()
