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
