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
