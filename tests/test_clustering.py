"""Connected-components / canonical-doc clustering (operators/clustering.py)
and the deterministic stratified sampler.

The gate-level value check (Spark ≡ DuckDB recursive CTE) lives in
test_analytics_oracle.py; these tests pin the operator semantics on
crafted graphs where the right answer is known by construction —
especially transitivity through chains, which the pairwise dedup queries
cannot express.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.clustering import connected_components, dedup_clusters


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a string, doc_b string")


def test_chain_is_transitive(spark):
    # a-b, b-c, c-d: one component even though a-d was never a pair
    cc = connected_components(_pairs(spark, [("b", "a"), ("b", "c"), ("c", "d")]))
    got = {r["doc_id"]: r["canonical_id"] for r in cc.collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_separate_components_stay_separate(spark):
    cc = connected_components(
        _pairs(spark, [("a", "b"), ("x", "y"), ("y", "z"), ("m", "n")])
    )
    got = {r["doc_id"]: r["canonical_id"] for r in cc.collect()}
    assert got == {"a": "a", "b": "a", "x": "x", "y": "x", "z": "x", "m": "m", "n": "m"}


def test_long_chain_converges(spark):
    # worst-case diameter: a path graph; exercises multiple propagation
    # rounds and the lineage-cut loop
    n = 12
    edges = [(f"d{i:02d}", f"d{i + 1:02d}") for i in range(n)]
    cc = connected_components(_pairs(spark, edges))
    rows = cc.collect()
    assert len(rows) == n + 1
    assert {r["canonical_id"] for r in rows} == {"d00"}


def test_dedup_clusters_sizes_and_canonical_flags(spark):
    out = dedup_clusters(
        _pairs(spark, [("a", "b"), ("b", "c"), ("x", "y")])
    ).collect()
    by_doc = {r["doc_id"]: r for r in out}
    assert by_doc["a"]["cluster_size"] == 3
    assert by_doc["x"]["cluster_size"] == 2
    canons = {d for d, r in by_doc.items() if r["is_canonical"]}
    assert canons == {"a", "x"}
    # exactly one canonical per cluster
    assert sum(r["is_canonical"] for r in out) == 2


def test_singletons_not_returned(spark):
    # nodes only exist through pairs; a doc with no near-dup pair has no row
    out = dedup_clusters(_pairs(spark, [("a", "b")]))
    assert {r["doc_id"] for r in out.collect()} == {"a", "b"}


def test_not_converged_raises(spark):
    with pytest.raises(RuntimeError):
        connected_components(
            _pairs(spark, [("a", "b"), ("b", "c"), ("c", "d")]), max_iter=1
        )


def test_random_graphs_match_union_find(spark):
    """Property check: on seeded random edge lists, distributed min-label
    propagation equals a plain union-find computed in the test."""
    import random

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = 40
        edges = [
            (f"n{rng.randrange(n):02d}", f"n{rng.randrange(n):02d}")
            for _ in range(35)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        roots = {}
        for v in list(parent):
            roots.setdefault(find(v), []).append(v)
        expected = {v: min(vs) for r, vs in roots.items() for v in vs}

        cc = connected_components(_pairs(spark, edges))
        got = {r["doc_id"]: r["canonical_id"] for r in cc.collect()}
        assert got == expected, f"seed {seed}"


def test_hash_threshold_sampler_properties(spark):
    """Deterministic, shuffle-free, nested-by-rate, and rate-accurate on
    the documents table."""
    from web_scraper_spark import analytics

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    n = d.count()
    s20 = analytics.sample_hash_threshold(d, 0.2)
    s50 = analytics.sample_hash_threshold(d, 0.5)
    ids20 = {r["doc_id"] for r in s20.select("doc_id").collect()}
    ids50 = {r["doc_id"] for r in s50.select("doc_id").collect()}
    # deterministic across runs
    assert ids20 == {
        r["doc_id"]
        for r in analytics.sample_hash_threshold(d, 0.2).select("doc_id").collect()
    }
    # nested: the 20% sample is a subset of the 50% sample
    assert ids20 <= ids50
    # binomial tolerance around the rate (n is small at sf0.001)
    assert 0.10 * n <= len(ids20) <= 0.32 * n
    assert 0.38 * n <= len(ids50) <= 0.62 * n
    # pure filter: no exchange in the physical plan
    plan = s20._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_stratified_sample_deterministic_and_exact(spark):
    from web_scraper_spark import analytics

    sf = "/root/testdata/sf0.001"
    a = analytics.QUERIES["sample_stratified"](spark, sf).toPandas()
    b = analytics.QUERIES["sample_stratified"](spark, sf).toPandas()
    key = ["doc_id", "lang"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True)
    )
    # exact per-stratum quota: ceil(0.2 * stratum_n) rows per lang
    import math

    per = a.groupby("lang").agg(n=("doc_id", "count"), tot=("stratum_n", "first"))
    for _, row in per.iterrows():
        assert row["n"] == math.ceil(0.2 * row["tot"])
