"""ANN quality-at-scale: recall/latency of the bucketed similarity paths
measured on an sf1-sized embedding corpus (r3 verdict item 6).

The LSH/IVF recall numbers in tests run at fixture scale; this table
measures them where bucketing matters, against exact brute-force ground
truth, so the "bucketed candidates, exact re-rank of the slice" claims
are numbers, not derivation.

Corpus: sf0.1's 2,000 × dim-64 embeddings replicated 10× (deterministic
per-replica jitter, unit-normalized — replicas are near-dups of their
source, strangers stay strangers; the same shape an embedded crawl
corpus has after near-dup inflation). Queries: 500 held-out jittered
probes. All synthesis is distributed (one mapInPandas pass); no external
data.

For each method: wall time (full top-10 retrieval for all 500 queries,
best of 2) + recall@10 vs the exact brute answer. SemDeDup is not a
top-k retrieval — recorded as prune rate + wall time at its default tau
over the same corpus (its scale guarantee is "quadratic never leaves a
cell", so the interesting number is the cost of the cell pass).

Emits ONE JSON line; the table in BENCH.md is generated from it.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections.abc import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
N_QUERIES = 500
K = 10


def synthesize(spark):
    """corpus (2000·REPLICAS rows) + queries (N_QUERIES rows), both
    unit-normalized float64 arrays, deterministic."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    base = spark.read.parquet(os.path.join(SRC, "embeddings.parquet")).select(
        "vec_id", "embedding"
    )

    def _replicate(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(np.int64)
            mat = np.array(list(pdf["embedding"]), np.float64)
            out_ids, out_vecs = [], []
            for r in range(REPLICAS):
                rng = np.random.RandomState(1234 + r)
                # jitter grows with replica index: r=0 is the source
                jit = mat + (0.05 * r) * rng.standard_normal(mat.shape)
                jit /= np.maximum(np.linalg.norm(jit, axis=1, keepdims=True), 1e-12)
                out_ids.append(ids * REPLICAS + r)
                out_vecs.append(jit)
            allv = np.vstack(out_vecs)
            yield pd.DataFrame(
                {
                    "vec_id": np.concatenate(out_ids),
                    "embedding": [row for row in allv],
                }
            )

    corpus = base.repartition(16).mapInPandas(
        _replicate, "vec_id long, embedding array<double>"
    )
    queries = (
        corpus.filter(F.col("vec_id") % (2000 * REPLICAS // N_QUERIES) == 3)
        .limit(N_QUERIES)
        .select((F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding")
    )
    return corpus, queries


def _topk_sets(df) -> dict[int, set]:
    out: dict[int, set] = {}
    for r in df.collect():
        out.setdefault(r["q_id"], set()).add(r["neighbor_id"])
    return out


def recall_at_k(approx: dict[int, set], exact: dict[int, set]) -> float:
    num = den = 0
    for q, truth in exact.items():
        num += len(approx.get(q, set()) & truth)
        den += len(truth)
    return round(num / den, 4) if den else 0.0


def timed(fn, reps: int = 2):
    """best-of-N (sandbox host noise — see BENCH.md)"""
    best, out = None, None
    for _ in range(reps):
        t0 = time.time()
        out = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, out


def main() -> None:
    from web_scraper_spark.operators import similarity as S
    from web_scraper_spark.session import get_spark

    spark = get_spark(
        app_name="wss-ann-recall", master="local[16]", shuffle_partitions=16
    )
    corpus, queries = synthesize(spark)
    corpus = corpus.localCheckpoint(eager=True)
    queries = queries.localCheckpoint(eager=True)
    n = corpus.count()
    dim = 64

    results: dict = {"corpus": n, "queries": N_QUERIES, "k": K, "dim": dim}

    brute_s, exact_df = timed(
        lambda: S.cosine_topk(corpus, queries, k=K).localCheckpoint(eager=True)
    )
    exact = _topk_sets(exact_df)
    results["brute"] = {"s": round(brute_s, 2), "recall": 1.0}

    for tables, bits in ((4, 6), (8, 6), (16, 6), (8, 8)):
        s, df = timed(
            lambda t=tables, b=bits: S.lsh_topk(
                corpus, queries, dim, k=K, tables=t, bits=b
            ).localCheckpoint(eager=True)
        )
        results[f"lsh_t{tables}_b{bits}"] = {
            "s": round(s, 2),
            "recall": recall_at_k(_topk_sets(df), exact),
        }

    for n_cells, nprobe in ((32, 2), (32, 4), (32, 8)):
        s, df = timed(
            lambda c=n_cells, p=nprobe: S.ivf_topk(
                corpus, queries, dim, k=K, n_cells=c, nprobe=p
            ).localCheckpoint(eager=True)
        )
        results[f"ivf_c{n_cells}_p{nprobe}"] = {
            "s": round(s, 2),
            "recall": recall_at_k(_topk_sets(df), exact),
        }

    # n_cells sized so cells stay bounded (~300 vectors/cell here) — the
    # operator's own scale guidance; the default 8 cells is fixture-sized
    s, pruned = timed(
        lambda: S.semdedup_prune(corpus, dim, n_cells=64).localCheckpoint(eager=True)
    )
    kept = pruned.filter("kept").count()
    results["semdedup_c64"] = {"s": round(s, 2), "prune_rate": round(1 - kept / n, 4)}

    print(json.dumps(results))


if __name__ == "__main__":
    main()
