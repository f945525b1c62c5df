"""operators/graph.py: PageRank vs a NumPy power-iteration reference."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from web_scraper_spark.operators.graph import pagerank


def _numpy_pagerank(n, edges, n_iter=8, damping=0.85):
    deg = np.zeros(n)
    for s, _ in edges:
        deg[s] += 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += pr[s] / deg[s]
        pr = (1.0 - damping) / n + damping * contrib
    return pr


@pytest.mark.parametrize("n_iter", [1, 8])
def test_pagerank_matches_numpy(spark, n_iter):
    rng = np.random.default_rng(7)
    n = 60
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, n, size=(400, 2)) if a != b}
    )
    # operator contract: every node has out-degree >= 1
    srcs = {s for s, _ in edges}
    edges += [(s, (s + 1) % n) for s in range(n) if s not in srcs]
    edges = sorted(set(edges))

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["node_id"]: r["pr"]
        for r in pagerank(nodes, edf, n_iter=n_iter).collect()
    }
    want = _numpy_pagerank(n, edges, n_iter=n_iter)
    assert set(got) == set(range(n))
    for i in range(n):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_pagerank_mass_conserved(spark):
    # no dangling nodes -> total rank mass stays exactly 1 per round
    n = 25
    edges = [(i, (i * 3 + 1) % n) for i in range(n)] + [
        (i, (i * 7 + 2) % n) for i in range(n) if (i * 7 + 2) % n != i
    ]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    edf = spark.createDataFrame(sorted(set(edges)), "src long, dst long")
    total = (
        pagerank(nodes, edf, n_iter=5)
        .agg(F.sum("pr").alias("s"))
        .collect()[0]["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_site_graph_from_pagerank_feeds_engine_init(spark, tmp_path):
    """Link authority drives the frontier: PageRank over a URL graph,
    quantized onto the priority axis, runs through the unmodified engine
    and schedules the most-linked URL first."""
    from pyspark.sql import functions as F

    from web_scraper_spark.operators.graph import site_graph_from_pagerank
    from web_scraper_spark.plans.crawl import CrawlEngine

    n = 10
    urls = [(i, f"https://g.example.test/video/{i:04d}/") for i in range(n)]
    # star-ish graph: everyone links to node 0, plus a ring for out-degree
    edges = [(i, 0) for i in range(1, n)] + [(i, (i + 1) % n) for i in range(n)]
    edges = sorted(set(e for e in edges if e[0] != e[1]))

    nodes = spark.createDataFrame([(i,) for i in range(n)], "node_id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    pr = pagerank(nodes, edf, n_iter=8)
    ranked = pr.join(
        spark.createDataFrame(urls, "node_id long, url string"), "node_id"
    ).select("url", "pr")

    site = site_graph_from_pagerank(ranked, scale=100)
    rows = {r["url"]: r for r in site.collect()}
    assert rows[urls[0][1]]["image_id"] == "0000"
    # quantization matches the numpy reference
    want = _numpy_pagerank(n, edges, n_iter=8)
    for i, u in urls:
        assert rows[u]["page"] == round(want[i] * n * 100)
    # the hub out-ranks every spoke
    assert rows[urls[0][1]]["page"] > max(rows[u]["page"] for _, u in urls[1:])

    eng = CrawlEngine(str(tmp_path / "prg"), batch_size=5, n_partitions=4)
    eng.init(site)
    fr = eng.frontier.read(spark)
    assert fr.count() == n
    top = fr.orderBy(F.col("priority").desc()).first()
    assert top["image_id"] == "0000"
