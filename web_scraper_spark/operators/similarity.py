"""Similarity search over embedding columns (training-data pipeline ops):
brute-force cosine top-k baseline + multi-table random-hyperplane LSH as
the scale path.

Everything is pure column expressions (zip_with / aggregate in double
precision) — no UDFs. Scale shapes:
  * brute force: broadcast the bounded query block, one corpus scan,
    per-partition top-k then global top-k (row_number over q_id) — never
    an n² shuffle;
  * LSH: each vector hashes to ``tables`` bucket ids (sign patterns of
    ``bits`` fixed random projections); candidates share a bucket in ANY
    table. Expected scan per query drops to tables·n/2^bits; recall for
    near-duplicates (cosine ≥ 0.95) is 1-(1-p^bits)^tables with
    p = 1 - angle/π ≈ 0.95 ⇒ ~0.99+ at (4 tables, 6 bits).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(col, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def _dot(a, b) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of each query over the corpus
    (self-matches by id excluded). Returns (q_id, neighbor_id, rank, cos).

    Physical plan: the bounded query block broadcasts as a dense float64
    matrix; the corpus streams through mapInPandas where each Arrow batch
    is ONE BLAS ``Q @ C.T`` followed by a per-batch top-k prune (value
    threshold at the k-th largest, so exact ties at the boundary are all
    kept — no candidate that could win the global rank is dropped). The
    global rank is a window over ≤ k·n_batches candidate rows, never the
    n_q×n_corpus similarity matrix. Replaced a zip_with/aggregate
    expression plan (~30× slower on the sandbox block)."""
    from collections.abc import Iterator

    import pandas as pd

    spark = corpus.sparkSession
    qrows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[id_col] for r in qrows], np.int64)
    qmat = np.array([r[vec_col] for r in qrows], np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((qids, qmat))

    def _scan(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, qm = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            cid = pdf[id_col].to_numpy(np.int64)
            cmat = np.array([np.asarray(v, np.float64) for v in pdf[vec_col]])
            cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-12)
            sims = qm @ cmat.T  # (n_q, n_batch) — one BLAS call
            sims[qi[:, None] == cid[None, :]] = -np.inf  # self-match
            nb = sims.shape[1]
            if nb > k:
                kth = np.partition(sims, nb - k, axis=1)[:, nb - k]
                keep = sims >= kth[:, None]  # ties at the boundary survive
            else:
                keep = np.isfinite(sims)
            keep &= np.isfinite(sims)
            iq, ic = np.nonzero(keep)
            yield pd.DataFrame(
                {"q_id": qi[iq], "neighbor_id": cid[ic], "cos": sims[iq, ic]}
            )

    cand = corpus.select(id_col, vec_col).mapInPandas(
        _scan, schema="q_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cos", 5).alias("cos"))
    )


def lsh_signatures(
    df: DataFrame,
    dim: int,
    tables: int = 4,
    bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, table, bucket) — one bucket id per hash table per vector.
    Projections are fixed by ``seed``; bucketing is pure expressions, so
    the signature computation is one codegen'd scan."""
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((tables, bits, dim))
    dbl = _as_double(vec_col)
    rows = []
    for t in range(tables):
        sig = None
        for b in range(bits):
            proj = _dot(dbl, F.array(*[F.lit(float(v)) for v in planes[t, b]]))
            bit = F.when(proj > 0, F.lit(1)).otherwise(F.lit(0))
            sig = bit if sig is None else sig * 2 + bit
        rows.append(F.struct(F.lit(t).alias("table"), sig.alias("bucket")))
    return df.select(
        F.col(id_col).alias("id"), F.explode(F.array(*rows)).alias("tb")
    ).select("id", F.col("tb.table").alias("table"), F.col("tb.bucket").alias("bucket"))


def ivf_centroids(dim: int, n_cells: int = 8, seed: int = 7) -> np.ndarray:
    """Deterministic unit-norm coarse-quantizer centroids (the IVF "cell"
    centers). In production these come from a k-means pass over a sample;
    here they are seeded random directions so every run — Spark query,
    DuckDB oracle, tests — shares the exact same quantizer."""
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((n_cells, dim))
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _cell_scores(vec_dbl: Column, cents: np.ndarray) -> Column:
    """array<struct<dot,cell>>: dot of the vector with every centroid.
    Centroids are unit-norm, so argmax dot == argmax cosine — the |v|
    denominator is constant per row and drops out."""
    return F.array(
        *[
            F.struct(
                _dot(vec_dbl, F.array(*[F.lit(float(v)) for v in c])).alias("dot"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(cents)
        ]
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 3,
    n_cells: int = 8,
    nprobe: int = 2,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: each corpus vector lives in exactly one cell
    (nearest centroid); each query probes its ``nprobe`` nearest cells and
    exact-cosine re-ranks only the vectors in those cells.

    Scale shape: cell assignment is a per-row argmax over ``n_cells``
    codegen'd dot products — no shuffle, no UDF (array_max over
    struct<dot,cell> is the argmax; ties break to the higher cell id,
    mirrored by the oracle's ORDER BY dot DESC, cell DESC). The candidate
    join is an equi-join on ``cell``, so per-query work drops to
    nprobe·n/n_cells expected rows vs the brute-force n. At corpus scale,
    partition the corpus by cell at write time and the probe prunes to
    nprobe partitions per query block."""
    cents = ivf_centroids(dim, n_cells, seed)
    c = (
        corpus.select(F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("ce"))
        .withColumn("cn", _norm(F.col("ce")))
        .withColumn("cell", F.array_max(_cell_scores(F.col("ce"), cents)).getField("cell"))
    )
    q = (
        queries.select(F.col(id_col).alias("q_id"), _as_double(vec_col).alias("qe"))
        .withColumn("qn", _norm(F.col("qe")))
        .withColumn(
            "cell",
            F.explode(
                F.slice(
                    F.sort_array(_cell_scores(F.col("qe"), cents), asc=False), 1, nprobe
                ).getField("cell")
            ),
        )
    )
    sim = (
        F.broadcast(q)
        .join(c, "cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            (_dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cos", 5).alias("cos"))
    )


def _semdedup_prune_blas(c: DataFrame, tau: float) -> DataFrame:
    """Arrow-batched per-cell SemDeDup scorer: one ``G = E @ E.T`` BLAS
    call per cell instead of |cell|² zip_with expression rows. Same
    shuffle shape as the SQL self-join (one exchange on ``cell``) and
    the same decision semantics — cosine rounded HALF-UP to 6 dp before
    the ``>= tau`` compare, a lower-id cell-mate above the threshold
    prunes the higher id. The norm column computed by the caller is
    reused so the denominator is bit-identical to the SQL path."""
    import pandas as pd
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("cell", T.IntegerType()),
            T.StructField("kept", T.BooleanType()),
        ]
    )

    def _one_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        E = np.asarray(
            [np.asarray(v, np.float64) for v in pdf["e"].to_numpy()[order]]
        )
        nn = pdf["n"].to_numpy()[order]
        G = (E @ E.T) / np.outer(nn, nn)
        G = np.floor(G * 1e6 + 0.5) / 1e6  # ROUND HALF_UP, like Spark SQL
        pruned = np.tril(G >= tau, -1).any(axis=1)
        return pd.DataFrame(
            {"vec_id": ids, "cell": pdf["cell"].to_numpy()[order], "kept": ~pruned}
        )

    return c.groupBy("cell").applyInPandas(_one_cell, schema=schema)


def semdedup_prune(
    corpus: DataFrame,
    dim: int,
    tau: float = 0.45,
    n_cells: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "sql",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest coarse cell, compute pairwise cosine only
    WITHIN each cell, and prune a vector when a lower-id cell-mate sits
    above the ``tau`` similarity threshold (greedy keep-first — the
    published method's "keep one random member per semantic-duplicate
    group" with the deterministic id order standing in for random).

    Returns one row per corpus vector: (vec_id, cell, kept).

    Scale shape: the quadratic never leaves a cell — candidates per
    vector are |cell| not n, and in production n_cells is sized so cells
    stay bounded (SemDeDup uses ~10^5 k-means clusters for ~10^8 docs);
    the self-join is an equi-join on ``cell`` so it shuffles once and
    SMJ/AQE handle skewed cells.

    ``scorer``: "sql" (default) scores pairs with the zip_with fold —
    pure column expressions, the oracle-replayable reference;
    ``scorer="blas"`` routes each cell through _semdedup_prune_blas
    (one E@Eᵀ matmul per cell in an Arrow batch) — same decision
    semantics and shuffle shape, pinned equal by
    tests/test_similarity.py, and the path to pick once |cell| makes
    the expression-row quadratic the bottleneck."""
    if scorer not in ("sql", "blas"):
        raise ValueError(f"scorer must be 'sql' or 'blas', got {scorer!r}")
    cents = ivf_centroids(dim, n_cells, seed)
    c = (
        corpus.select(F.col(id_col).alias("vec_id"), _as_double(vec_col).alias("e"))
        .withColumn("n", _norm(F.col("e")))
        .withColumn("cell", F.array_max(_cell_scores(F.col("e"), cents)).getField("cell"))
    )
    if scorer == "blas":
        return _semdedup_prune_blas(c, tau)
    a = c.select("cell", F.col("vec_id").alias("a_id"), F.col("e").alias("ae"), F.col("n").alias("an"))
    b = c.select("cell", F.col("vec_id").alias("b_id"), F.col("e").alias("be"), F.col("n").alias("bn"))
    pruned = (
        a.join(b, "cell")
        .filter(F.col("b_id") < F.col("a_id"))
        # round BEFORE the threshold compare so the keep/prune boundary is
        # bit-identical to the SQL oracle's round(...) >= tau
        .filter(F.round(_dot("ae", "be") / (F.col("an") * F.col("bn")), 6) >= tau)
        .select(F.col("a_id").alias("vec_id"))
        .distinct()
        .withColumn("pruned", F.lit(True))
    )
    return c.join(pruned, "vec_id", "left").select(
        "vec_id", "cell", F.coalesce(~F.col("pruned"), F.lit(True)).alias("kept")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    tables: int = 4,
    bits: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates = ids sharing a bucket with the query
    in ANY table; exact cosine + rank on the candidate slice only."""
    corpus_sig = lsh_signatures(corpus, dim, tables, bits, seed, id_col, vec_col)
    query_sig = lsh_signatures(queries, dim, tables, bits, seed, id_col, vec_col)
    cand = (
        query_sig.select(F.col("id").alias("q_id"), "table", "bucket")
        .join(
            corpus_sig.select(F.col("id").alias("neighbor_id"), "table", "bucket"),
            ["table", "bucket"],
        )
        .filter(F.col("q_id") != F.col("neighbor_id"))
        .select("q_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(vec_col).alias("qe")
    ).withColumn("qn", _norm(F.col("qe")))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("ce")
    ).withColumn("cn", _norm(F.col("ce")))
    sim = (
        cand.join(F.broadcast(q), "q_id")
        .join(c, "neighbor_id")
        .select(
            "q_id",
            "neighbor_id",
            (_dot("qe", "ce") / (F.col("qn") * F.col("cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        sim.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "rank", F.round("cos", 5).alias("cos"))
    )


def cosine_pairs_blocked(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.45,
    round_to: int = 5,
) -> DataFrame:
    """Exact all-pairs cosine near-duplicate pairs via a BLAS-blocked
    matrix product: one (bounded) side is collected and broadcast as a
    dense float64 matrix; the corpus streams through mapInPandas where
    each Arrow batch performs ONE ``B @ A.T`` against the broadcast block
    — the vectorized-pandas-UDF shape for embedding dot products. On the
    2M-pair/5k-vector sandbox block this replaced a 34 s zip_with/
    aggregate expression plan with a sub-second matmul.

    Exactness and rounding semantics match the expression form: the
    numpy side pre-filters with a small epsilon slack and the final
    ``round(cos, round_to) >= threshold`` runs as Spark column exprs, so
    boundary behaviour is identical to the DuckDB oracle.

    Scale ladder: this is the EXACT path for one bounded block (the
    broadcast side must fit an executor, ~0.5 GB/10^6×64-dim doubles).
    At corpus scale the LSH/IVF bucket paths prune candidates first and
    re-rank with the same arithmetic; or run this blockwise over a grid
    of id ranges (each block pair is an independent matmul task)."""
    from collections.abc import Iterator

    import pandas as pd

    spark = emb.sparkSession
    side = emb.select(id_col, vec_col).collect()
    ids_a = np.array([r[id_col] for r in side], np.int64)
    mat_a = np.array([r[vec_col] for r in side], np.float64)
    mat_a /= np.maximum(np.linalg.norm(mat_a, axis=1, keepdims=True), 1e-12)
    bc = spark.sparkContext.broadcast((ids_a, mat_a))
    pre = threshold - 10.0 ** (-round_to) / 2 - 1e-9  # keep rounding-boundary rows

    def _block(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        aid, amat = bc.value
        for pdf in it:
            if pdf.empty:
                continue
            bid = pdf[id_col].to_numpy(np.int64)
            bmat = np.array([np.asarray(v, np.float64) for v in pdf[vec_col]])
            bmat /= np.maximum(np.linalg.norm(bmat, axis=1, keepdims=True), 1e-12)
            sims = bmat @ amat.T  # (nb, na) — one BLAS call per Arrow batch
            keep_b, keep_a = np.nonzero((sims >= pre) & (aid[None, :] > bid[:, None]))
            yield pd.DataFrame(
                {
                    "id_a": bid[keep_b],
                    "id_b": aid[keep_a],
                    "cos": sims[keep_b, keep_a],
                }
            )

    pairs = emb.select(id_col, vec_col).mapInPandas(
        _block, schema="id_a long, id_b long, cos double"
    )
    return pairs.withColumn("cos", F.round("cos", round_to)).filter(
        F.col("cos") >= threshold
    )
