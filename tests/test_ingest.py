"""Schema-enforced JSONL/CSV ingestion with corrupt-record quarantine
(sources/ingest.py): valid rows equal the parquet ground truth, malformed
records land in quarantine instead of aborting or vanishing."""

from __future__ import annotations

import json
import os

import pytest

from web_scraper_spark.sources.ingest import (
    DOCUMENTS_SCHEMA,
    read_documents,
    read_with_quarantine,
    release_ingest_caches,
)


@pytest.fixture(autouse=True)
def _release():
    yield
    release_ingest_caches()

SF = "/root/testdata/sf0.001"


def _doc_rows(spark, n=20):
    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .limit(n)
        .collect()
    )


def test_jsonl_roundtrip_and_quarantine(spark, tmp_root):
    rows = _doc_rows(spark)
    p = os.path.join(tmp_root, "docs.jsonl")
    with open(p, "w") as f:
        for r in rows[:10]:
            f.write(json.dumps(r.asDict()) + "\n")
        f.write("{this is not json\n")
        f.write('{"doc_id": "NOT_A_NUMBER", "text": "x"}\n')
        for r in rows[10:]:
            f.write(json.dumps(r.asDict()) + "\n")

    valid, quarantine = read_documents(spark, p, fmt="jsonl")
    # JSON sources mark every column nullable; names+types must match
    assert [(f.name, f.dataType) for f in valid.schema.fields] == [
        (f.name, f.dataType) for f in DOCUMENTS_SCHEMA.fields
    ]
    got = {r["doc_id"]: r["text"] for r in valid.collect()}
    want = {r["doc_id"]: r["text"] for r in rows}
    assert got == want
    q = [r["raw"] for r in quarantine.collect()]
    assert any("not json" in s for s in q)
    assert any("NOT_A_NUMBER" in s for s in q)
    assert len(q) == 2


def test_csv_roundtrip_and_quarantine(spark, tmp_root):
    rows = _doc_rows(spark)
    p = os.path.join(tmp_root, "docs.csv")
    with open(p, "w") as f:
        f.write("doc_id,text,lang,source,n_chars\n")
        for r in rows:
            text = (r["text"] or "").replace('"', "'")
            f.write(f'{r["doc_id"]},"{text}",{r["lang"]},{r["source"]},{r["n_chars"]}\n')
        f.write('oops,"bad row",en,web,notanint\n')

    valid, quarantine = read_documents(spark, p, fmt="csv")
    assert valid.count() == len(rows)
    assert {r["doc_id"] for r in valid.collect()} == {r["doc_id"] for r in rows}
    assert quarantine.count() == 1
    assert "notanint" in quarantine.collect()[0]["raw"]


def test_parquet_passthrough(spark):
    valid, quarantine = read_documents(spark, f"{SF}/documents.parquet", fmt="parquet")
    assert [(f.name, f.dataType) for f in valid.schema.fields] == [
        (f.name, f.dataType) for f in DOCUMENTS_SCHEMA.fields
    ]
    assert quarantine.count() == 0
    assert valid.count() == spark.read.parquet(f"{SF}/documents.parquet").count()


def test_analytics_runs_on_ingested_jsonl(spark, tmp_root):
    """The valid side is a drop-in documents table: an analytics query
    produces identical results from JSONL and parquet inputs."""
    from pyspark.sql import functions as F

    rows = _doc_rows(spark, n=50)
    p = os.path.join(tmp_root, "docs.jsonl")
    with open(p, "w") as f:
        for r in rows:
            f.write(json.dumps(r.asDict()) + "\n")
    valid, _ = read_documents(spark, p, fmt="jsonl")
    a = (
        valid.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    pq = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    b = (
        pq.groupBy("lang")
        .agg(F.count("*").alias("n"), F.sum("n_chars").alias("chars"))
        .collect()
    )
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_unknown_format_raises(spark):
    with pytest.raises(ValueError):
        read_with_quarantine(spark, "/nonexistent", DOCUMENTS_SCHEMA, fmt="xml")
