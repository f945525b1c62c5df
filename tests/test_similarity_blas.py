"""The BLAS-blocked SemDeDup scorer (operators/similarity.py
``scorer="blas"``) must make exactly the decisions the SQL zip_with path
makes — same kept set, same cells — on the real embeddings fixture. The
flag exists so corpus-scale runs can swap the |cell|² expression-row
quadratic for one E@Eᵀ matmul per cell without changing semantics."""

from __future__ import annotations

import pytest

from web_scraper_spark.operators.similarity import semdedup_prune

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (int(r["vec_id"]), int(r["cell"]), bool(r["kept"])) for r in df.collect()
    )


@pytest.mark.parametrize("tau", [0.45, 0.2])
def test_semdedup_blas_equals_sql(spark, tau):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    sql = _rows(semdedup_prune(emb, dim=64, tau=tau, scorer="sql"))
    blas = _rows(semdedup_prune(emb, dim=64, tau=tau, scorer="blas"))
    assert sql == blas
    assert any(not kept for _id, _c, kept in sql) or tau > 0.4  # prunes exist at low tau


def test_semdedup_bad_scorer_raises(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    with pytest.raises(ValueError):
        semdedup_prune(emb, dim=64, scorer="gpu")
