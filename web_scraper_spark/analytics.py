"""Operator-parity queries over the driver testdata tables.

Each entry re-expresses one operator family from SURVEY.md §2 (the crawl
engine's building blocks) or a large-scale training-data-pipeline operation
(dedup / similarity / text analysis) as a standalone DataFrame query over
the TPC-H-ish tables in ``sf_dir``, paired with an ANSI/DuckDB oracle SQL
string in ``ORACLES`` for the driver's correctness gate.

Conventions:
  * every computed column is aliased identically in Spark and SQL;
  * float aggregates are rounded on BOTH sides (value-hash compare);
  * math that feeds a comparison runs in double precision on both sides.

Scale notes ride on each query: these run at sf0.01 for correctness, but
the plan shapes (broadcast sides, shuffle keys, window partitioners) are
chosen for the 100 TB / 10^10-row versions of the same tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.errors import backoff_seconds, should_retry
from .operators.clustering import dedup_clusters


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# =====================================================================
# Crawl-operator parity (SURVEY §2.2-2.5, §2.9)
# =====================================================================


def q_frontier_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness scheduling (ST2/ST3 + salted repartition): events as a
    frontier, user_id as host. Per-host rank in time order → fetch wave
    (per_host_parallelism=3) → deterministic salt (wave % 8).

    Scale: one shuffle on the host key; the wave/salt columns are what the
    fetch stage partitions by, so a hot host spreads over 8 partitions
    while intra-wave pacing stays enforceable (operators/politeness.py).
    """
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        (F.row_number().over(w) - 1).alias("host_rank"),
    ).withColumns(
        {
            "fetch_wave": (F.col("host_rank") / 3).cast("int"),
            "salt": F.pmod((F.col("host_rank") / 3).cast("int"), F.lit(8)).cast("int"),
        }
    )


def q_ranked_microbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-ranked micro-batch (W2 / operators/frontier.take_batch):
    newest-first global order, top 100 with their seq.

    Scale: a global top-K never global-sorts — Spark's sort+limit does
    per-partition top-K then merges K·P rows (TakeOrderedAndProject)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.orderBy(F.col("ts").desc(), F.col("event_id").asc())
    return (
        ev.select("event_id", "ts", F.row_number().over(w).alias("seq"))
        .filter(F.col("seq") <= 100)
    )


def q_anti_join_seen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seen-set dedup (J1/P2): orders with no lineitem = frontier rows not
    yet fetched. Scale: left-anti on the key, bloom-prefiltered at 10^10
    (operators/dedup.py); here Catalyst picks broadcast/SMJ via AQE."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_anti").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


def q_top1_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-variant selection (W1, reference video_info_extractor.py:
    1489-1553): top-1 lineitem per order by price, deterministic tiebreak.
    Scale: one shuffle on the key; AQE splits skewed keys."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


def q_left_join_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata merge (J2, listing ⟕ detail with blank-override): orders ⟕
    customer, missing names defaulted. Scale: customer is the dimension →
    broadcast; fact table never shuffles."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left").select(
        "o_orderkey",
        F.coalesce("c_name", F.lit("unknown")).alias("cust_name"),
        "o_totalprice",
    )


def q_reconcile_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State reconciliation (J5, progress ⟗ folder-scan): customers seen in
    finished ('F') vs open ('O') orders, classified both/left/right.
    Scale: both sides pre-aggregated to distinct keys before the join."""
    o = _t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k")).distinct()
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k")).distinct()
    joined = f.withColumn("in_f", F.lit(1)).join(
        op.withColumn("in_o", F.lit(1)), "k", "full_outer"
    )
    cat = (
        F.when(F.col("in_f").isNotNull() & F.col("in_o").isNotNull(), "both")
        .when(F.col("in_f").isNotNull(), "f_only")
        .otherwise("o_only")
    )
    return joined.groupBy(cat.alias("category")).agg(F.count("*").alias("n"))


def q_set_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set ops (SO4, jpg∩json∩mp4 folder audit): customers that both placed
    a big order and hold a positive balance."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = o.filter(F.col("o_totalprice") > 50000).select(
        F.col("o_custkey").alias("custkey")
    ).distinct()
    pos = c.filter(F.col("c_acctbal") > 0).select(
        F.col("c_custkey").alias("custkey")
    ).distinct()
    return big.intersect(pos)


def q_group_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run statistics (A2/A3/A5/A7): per-event-type counters — the Spark
    form of the reference's per-page/global stats dicts. Partial (map-side)
    aggregation is free; one shuffle on the group key."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.round(F.avg("value"), 4).alias("avg_value"),
        F.max("ts").alias("max_ts"),
    )


def q_validators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field validators (P5/P8 as boolean columns): metadata-vs-content
    consistency checks on documents."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        (F.length("text") == F.col("n_chars")).alias("len_ok"),
        (F.col("n_chars") >= 100).alias("min_len_ok"),
        F.col("lang").isin("en", "de", "fr", "es", "zh").alias("lang_ok"),
    )


def q_retry_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry budget + exponential backoff as columns (F12/F13, reference
    video_processor.py:94-112,237-255): error events classified by value
    band, attempts derived deterministically."""
    ev = _t(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    cls = (
        F.when(F.col("value") < 5, "network")
        .when(F.col("value") < 10, "rate_limit")
        .otherwise("temporary")
    )
    attempts = F.pmod(F.col("event_id"), F.lit(10)).cast("int")
    return ev.select(
        "event_id",
        cls.alias("error_class"),
        attempts.alias("attempts"),
        should_retry(cls, attempts).alias("retry"),
        F.round(backoff_seconds(cls, attempts), 2).alias("backoff_s"),
    )


def q_storage_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global storage-limit gate (P9/A1): one full-table aggregate, the
    micro-batch admission check. Scale: partial agg → single tiny row."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        F.round(F.sum("l_quantity"), 1).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
    )


def q_recent_window_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scoped dedup window (W4/P4, reference new/duplicate_detection.py:
    109-136): first event per (user, type) in time order."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts")
    )


# =====================================================================
# Training-data pipeline: deduplication
# =====================================================================


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup (hash-groupBy): canonical doc per identical text.

    Scale: group on xxhash64(text) first so the shuffle moves 8-byte keys,
    not document bodies; the full text only breaks hash collisions. Here
    the text column is small enough to group directly — the oracle-visible
    result (min doc_id per text group) is identical either way."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.xxhash64("text").alias("h"), "text")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_dups"))
        .select("canonical_id", "n_dups")
    )


#: DataFrames persisted by the current query (shingle sets, simhash band
#: tables) — released on the next _register_cache cycle (queries run
#: sequentially) or explicitly via release_caches(). Without this, every
#: dedup query leaked one cached RDD into the shared session (executor
#: storage memory grows unbounded across a gate run + bench loop).
_PERSISTED_SHINGLES: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist any cache left behind by the last dedup query."""
    while _PERSISTED_SHINGLES:
        _PERSISTED_SHINGLES.pop().unpersist()


def _shingle_df(d: DataFrame, n: int = 3, max_df: int | None = None) -> DataFrame:
    """(doc_id, shingle) — one row per DISTINCT word n-gram per document.

    The token array is materialized as a column BEFORE the n-gram lambda:
    inlining split() into each element_at would re-split the text once per
    gram per position (~3·len re-splits per row — measured 30× slower).
    Documents shorter than n tokens produce no shingles (matches the
    oracle's range() semantics; also keeps element_at in bounds under ANSI
    mode). The result is persisted — every caller fans out into several
    join branches and must not recompute the explode per branch. The
    previous query's cache is released here (see _PERSISTED_SHINGLES).

    ``max_df``: drop stop-shingles present in more than ``max_df``
    documents before any pair join. This is the scale valve for the exact
    self-join path — a shingle shared by 10^6 docs would otherwise emit
    10^12 candidate pairs on one join key; boilerplate shingles carry no
    dedup signal, so capping bounds the hottest key at max_df² pairs while
    near-duplicate recall rides on the rare shingles that remain. Omit for
    the oracle-exact result."""
    release_caches()
    toks = d.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    idx = F.sequence(F.lit(0), F.size(w) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(w, i + k + 1) for k in range(n)])
    )
    empty = F.array().cast("array<string>")
    shingles = F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(empty)
    sh = toks.select("doc_id", F.explode(shingles).alias("shingle"))
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(keep, "shingle")
    out = sh.persist()
    _PERSISTED_SHINGLES.append(out)
    return out


def jaccard_pairs(
    d: DataFrame, threshold: float = 0.8, max_df: int | None = None
) -> DataFrame:
    """Near-dup pairs by exact n-gram Jaccard ≥ threshold over a documents
    DataFrame. ``max_df`` engages stop-shingle capping (see _shingle_df) —
    the knob that keeps the shingle self-join's hottest key bounded at
    scale; Jaccard is then computed over the capped shingle universe
    (sizes and intersections from the same filtered set, so the ratio
    stays internally consistent)."""
    sh = _shingle_df(d, max_df=max_df)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select(
            "doc_a", "doc_b", "n_common", "size_a", "size_b",
            F.round(jac, 4).alias("jaccard"),
        )
    )


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs by exact 3-gram Jaccard ≥ 0.8 (n-gram dedup).

    Plan: explode distinct shingles → self-equi-join on shingle → count
    common per pair → Jaccard from set sizes. Scale: the shingle join
    shuffles on the shingle hash; ``jaccard_pairs(max_df=...)`` bounds the
    hottest keys via stop-shingle capping, and the pair aggregation is a
    second bounded shuffle. (MinHash below is the at-scale fast path; this
    is the exact ground truth, so the gate query runs uncapped.)"""
    return jaccard_pairs(_t(spark, sf_dir, "documents"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive duplicate clusters + canonical doc per cluster.

    Pairwise dedup (the queries above) emits edges; a pipeline needs the
    transitive closure — A~B, B~C collapses {A,B,C} to one kept document
    even though the A-C pair was never emitted.  Plan: exact-Jaccard pairs
    → distributed min-label propagation (operators/clustering.py) → size +
    canonical flag per cluster.  Scale: each round is one node-keyed join
    + groupBy-min, lineage cut per round; rounds = component diameter,
    which for LSH-banded near-dup graphs (quasi-cliques) is 2-3
    independent of corpus size.  Oracle: recursive CTE reachability in
    DuckDB over the identical pair set."""
    pairs = jaccard_pairs(_t(spark, sf_dir, "documents")).select("doc_a", "doc_b")
    # pair source: exact Jaccard here so the oracle replays the identical
    # edge set; at corpus scale feed the MinHash/LSH candidate pairs
    # (q_dedup_minhash_lsh's plan) — dedup_clusters takes any (a, b) edges
    return dedup_clusters(pairs).select(
        "doc_id", "canonical_id", "cluster_size", "is_canonical"
    )


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: exactly ⌈20%·n⌉ docs per language.

    Training-data pipelines subsample corpora with per-stratum quotas
    (language, source, quality band); the selection must be deterministic
    so re-runs and audits agree.  Rule: rank docs within each stratum by
    md5(doc_id) (engine-agnostic uniform order) and keep the first
    ⌈rate·n⌉.  Scale note: a per-stratum window sorts each stratum inside
    one task — fine for language-count strata (≤ a few hundred, each
    shuffle-partition-sized); for a skewed giant stratum, switch to the
    two-pass hash-threshold variant (count per stratum, then filter
    md5 < rate-quantile) which needs no per-stratum total order."""
    d = _t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wc = Window.partitionBy("lang")
    return (
        d.select(
            "doc_id",
            "lang",
            F.row_number().over(w).cast("long").alias("sample_rank"),
            F.count("*").over(wc).cast("long").alias("stratum_n"),
        )
        .filter(F.col("sample_rank") <= F.ceil(F.col("stratum_n") * 0.2))
    )


def sample_hash_threshold(
    d: DataFrame, rate: float, key_col: str = "doc_id"
) -> DataFrame:
    """Skew-proof deterministic sampler: keep a row iff the first 8 hex
    digits of md5(key) fall under ``rate``·16^8. The scale path the
    stratified window sampler's docstring points at — a pure filter, no
    window, no shuffle, no per-stratum total order, so one giant stratum
    costs nothing extra; the trade is an approximate per-stratum rate
    (binomial around ``rate``) instead of the window's exact ⌈r·n⌉ quota.
    Selection depends only on (key, rate): re-runs, different partitioning,
    and different engines agree row-for-row, and the kept set for rate r is
    a SUBSET of the kept set for r' > r (nested samples — raising the rate
    only adds rows, the property audits rely on)."""
    bucket = F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10)
    return d.filter(bucket.cast("long") < F.lit(int(rate * 16**8)))


def q_dim_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup through a chain of dimension joins (TPC-H Q5 shape):
    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, one-year date slice,
    grouped by region and nation.

    The at-scale join-strategy demonstration: the two fact-side joins
    shuffle on their keys, while nation (25 rows) and region (5 rows) are
    explicit ``broadcast()`` sides — no shuffle for dimension lookup, the
    pattern every 100 TB star-schema query lives on. The date predicate
    sits directly on the orders scan so Catalyst pushes it into the
    parquet reader (PushedFilters) before any join. Revenue is rounded to
    2 decimals on both engines per the float convention."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.round(F.sum(rev), 2).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def q_brand_price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median/p90 retail price per brand — distribution stats the
    quality-banding pipeline needs (size/score cutoffs per group).

    EXACT percentile (Spark's ``percentile``, linear interpolation ≡
    DuckDB's ``quantile_cont``) rather than ``percentile_approx``: the
    sketch's answer is implementation-defined and cannot be oracled
    value-for-value. Exact grouped percentile sorts within each group —
    fine at per-brand cardinality; for corpus-scale distributions switch
    to approx_percentile and verify rank-error bounds instead of values."""
    p = _t(spark, sf_dir, "part")
    return p.groupBy("p_brand").agg(
        F.round(F.expr("percentile(p_retailprice, 0.5)"), 2).alias("p50"),
        F.round(F.expr("percentile(p_retailprice, 0.9)"), 2).alias("p90"),
        F.count("*").cast("long").alias("n_parts"),
    )


def q_supplier_balance_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance rollup per supplier nation — the one-broadcast-join
    aggregate shape (fact ⋈ tiny dim → groupBy), completing gate coverage
    of every driver table."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").cast("long").alias("n_suppliers"),
            F.round(F.sum("s_acctbal"), 2).alias("total_balance"),
            F.round(F.avg("s_acctbal"), 2).alias("avg_balance"),
        )
    )


def q_token_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 tokens by corpus frequency, ties broken by token —
    the vocabulary/heavy-hitter pass every corpus audit starts with.

    Plan shape at scale: explode → two-level aggregate (partial map-side
    combine keeps the shuffle at distinct-token cardinality, not token
    occurrences) → global TakeOrderedAndProject (each partition ships only
    its top 20, never a full sort). The (count DESC, token ASC) total
    order makes the cut deterministic on both engines even with ties at
    the boundary."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    return (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok"))
        .limit(20)
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via MinHash + LSH banding, verified by exact Jaccard.

    Pipeline (SURVEY §2.10-style vectorized UDF + relational ops):
      1. 64 minhash values per doc from shingle xxhash64s — one pandas UDF,
         numpy (perms × shingles) min-reduce per Arrow batch;
      2. band into 16 bands × 4 rows; explode (band, band_sig);
      3. docs sharing a band signature → candidate pairs (groupBy + join);
      4. exact-Jaccard verification of candidates only.
    Scale: candidates ≪ n², so step 4's shingle join runs on a tiny slice;
    band-bucket hot keys are bounded by band width. Verification makes the
    result exact (equals q_dedup_ngram_jaccard) as long as LSH recall at
    the 0.8 threshold holds — with 16×4 bands P(miss|j=0.8) < 1e-3 and the
    planted dups sit at j≥0.9 where recall is ~1."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    N_PERM, N_BANDS = 64, 16
    R = N_PERM // N_BANDS
    MERSENNE = (1 << 61) - 1
    rng = np.random.RandomState(42)
    A = rng.randint(1, MERSENNE, size=N_PERM, dtype=np.int64)
    B = rng.randint(0, MERSENNE, size=N_PERM, dtype=np.int64)

    d = _t(spark, sf_dir, "documents")
    sh = _shingle_df(d)
    hashed = sh.select("doc_id", F.xxhash64("shingle").alias("h"))

    def _minhash(hs):
        # input: Series of per-doc shingle-hash lists (collect_list output,
        # bounded by distinct shingles per doc); numpy batch min-reduce
        out = []
        for arr in hs:
            x = np.asarray(arr, dtype=np.uint64)
            # (n_perm, n_shingles) universal hashing mod Mersenne prime
            v = (
                x[None, :] * A.astype(np.uint64)[:, None]
                + B.astype(np.uint64)[:, None]
            ) % np.uint64(MERSENNE)
            out.append(v.min(axis=1).astype(np.int64))
        return pd.Series(out)

    # registered without annotations: `from __future__ import annotations`
    # stringifies hints, which pandas_udf can't infer from
    minhash = F.pandas_udf(_minhash, T.ArrayType(T.LongType()))

    sigs = hashed.groupBy("doc_id").agg(F.collect_list("h").alias("hs")).select(
        "doc_id", minhash("hs").alias("sig")
    )
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(N_BANDS - 1)),
                lambda i: F.struct(
                    i.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice("sig", i * R + 1, R), lambda x: x.cast("string")
                            ),
                        )
                    ).alias("bsig"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bsig")
    a = bands.alias("a")
    b = bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bsig") == F.col("b.bsig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    # exact verification on the candidate slice only
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    common = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("size_b"))
    jac = F.col("n_common") / (F.col("size_a") + F.col("size_b") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= 0.8)
        .select(
            "doc_a", "doc_b", "n_common", "size_a", "size_b",
            F.round(jac, 4).alias("jaccard"),
        )
    )


def _simhash_votes(d: DataFrame) -> DataFrame:
    """(doc_id, b0..b63): per-bit ±1 token votes of the 64-bit SimHash —
    explode tokens → md5 → first 16 hex nibbles → 64 vote sums. Pure column
    expressions, one shuffle on doc_id; the 16 nibble columns are
    materialized in one projection so the 64 vote aggregates reference
    cheap int columns (not 64 re-derivations of the hash). Shared by
    q_simhash (hex fingerprint) and q_dedup_simhash_pairs (banded pairs)."""
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    hx = toks.select("doc_id", F.md5("tok").alias("hx"))

    def _nib(j: int) -> F.Column:
        ch = F.substring("hx", j + 1, 1)
        return F.when(ch >= "a", F.ascii(ch) - 87).otherwise(F.ascii(ch) - 48)

    nibs = hx.select("doc_id", *[_nib(j).alias(f"n{j}") for j in range(16)])
    return nibs.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col(f"n{i // 4}"), 3 - i % 4).bitwiseAND(F.lit(1))
                    == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per document (token-hash bit-vote): sign bits of the
    vote sums reassembled into a 16-hex-char fingerprint.

    md5 (not xxhash64) on purpose: both Spark and DuckDB expose md5, so the
    whole simhash — token hash, bit votes, sign assembly — is replayed
    verbatim by the SQL oracle (value-level gate check, not rows-only)."""
    votes = _simhash_votes(_t(spark, sf_dir, "documents"))
    hex_chars = []
    for j in range(16):
        val = None
        for k in range(4):
            term = F.when(F.col(f"b{4 * j + k}") > 0, F.lit(8 >> k)).otherwise(F.lit(0))
            val = term if val is None else val + term
        hex_chars.append(F.substr(F.lit("0123456789abcdef"), val + 1, F.lit(1)))
    return votes.select("doc_id", F.concat(*hex_chars).alias("simhash"))


def _simhash_votes_sql() -> str:
    """WITH-fragment replaying _simhash_votes in DuckDB (CTEs toks → hx →
    nib → v, where v holds doc_id, b0..b63), generated from the same bit
    layout. Shared by the simhash and dedup_simhash_pairs oracles."""
    nib_defs = ",\n       ".join(
        "CASE WHEN substr(hx, {p}, 1) >= 'a' THEN ascii(substr(hx, {p}, 1)) - 87 "
        "ELSE ascii(substr(hx, {p}, 1)) - 48 END AS n{j}".format(p=j + 1, j=j)
        for j in range(16)
    )
    vote_defs = ",\n       ".join(
        f"sum(CASE WHEN ((n{i // 4} >> {3 - i % 4}) & 1) = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(64)
    )
    return f"""
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
hx AS (SELECT doc_id, md5(tok) AS hx FROM toks),
nib AS (SELECT doc_id,
       {nib_defs}
FROM hx),
v AS (SELECT doc_id,
       {vote_defs}
FROM nib GROUP BY doc_id)"""


def _simhash_oracle_sql() -> str:
    """DuckDB replay of q_simhash, generated from the same bit layout."""
    nib_vals = [
        " + ".join(f"(CASE WHEN b{4 * j + k} > 0 THEN {8 >> k} ELSE 0 END)" for k in range(4))
        for j in range(16)
    ]
    concat = " ||\n       ".join(
        f"substr('0123456789abcdef', 1 + {v}, 1)" for v in nib_vals
    )
    return f"""
{_simhash_votes_sql()}
SELECT doc_id, {concat} AS simhash FROM v
"""


#: simhash near-dup banding: 4 bands × 16 bits over the 64-bit fingerprint.
#: Any pair within hamming distance 3 differs in at most 3 bands, so at
#: least one band matches exactly (pigeonhole) — banded recall at the ≤3
#: threshold is 1.0, which is what lets the quadratic oracle double as a
#: value-level equivalence check, not just an approximation bound.
_SIMHASH_BANDS = 4
_SIMHASH_HAM_MAX = 3


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate PAIRS via LSH banding: 4×16-bit bands, pairs
    sharing any band verified by exact hamming distance ≤ 3.

    Scale shape: the self-join is on (band_id, band_val) — candidates per
    band bucket, never all-pairs; the hamming verify touches candidates
    only and is 4 bit_count(xor) column ops on the band ints (the 64-bit
    fingerprint is never materialized as a single value, sidestepping
    signed-int64 headaches in both engines). The DuckDB oracle computes the
    QUADRATIC exact answer; equality with this banded plan is exactly the
    pigeonhole recall guarantee (hamming ≤ 3 ⇒ ≥1 clean band of 4)."""
    votes = _simhash_votes(_t(spark, sf_dir, "documents"))
    band_cols = []
    for j in range(_SIMHASH_BANDS):
        val = None
        for k in range(16):
            term = F.when(F.col(f"b{16 * j + k}") > 0, F.lit(1 << (15 - k))).otherwise(
                F.lit(0)
            )
            val = term if val is None else val + term
        band_cols.append(val.alias(f"band{j}"))
    # three consumers below (band explode, both verify sides) would each
    # recompute the 64-agg vote pass — persist the tiny per-doc band table
    # once (n_docs × 5 ints; registered for release like the shingle caches)
    bands = votes.select("doc_id", *band_cols).persist()
    _PERSISTED_SHINGLES.append(bands)
    sig = bands.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"), F.col(f"band{j}").alias("band_val")
                    )
                    for j in range(_SIMHASH_BANDS)
                ]
            )
        ).alias("s"),
    ).select("doc_id", F.col("s.band_id").alias("band_id"), F.col("s.band_val").alias("band_val"))
    sa = sig.select(F.col("doc_id").alias("doc_a"), "band_id", "band_val")
    sb = sig.select(F.col("doc_id").alias("doc_b"), "band_id", "band_val")
    cand = (
        sa.join(sb, ["band_id", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    ba = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"band{j}").alias(f"a{j}") for j in range(_SIMHASH_BANDS)],
    )
    bb = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"band{j}").alias(f"b{j}") for j in range(_SIMHASH_BANDS)],
    )
    ham = None
    for j in range(_SIMHASH_BANDS):
        term = F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}")))
        ham = term if ham is None else ham + term
    return (
        cand.join(ba, "doc_a")
        .join(bb, "doc_b")
        .select("doc_a", "doc_b", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= _SIMHASH_HAM_MAX)
    )


def _simhash_pairs_oracle_sql() -> str:
    """Exact quadratic ground truth for q_dedup_simhash_pairs: all pairs,
    hamming from the same 4×16-bit band ints (same vote CTE), threshold 3.
    Equality with the banded Spark plan proves the banding lost nothing."""
    band_defs = ",\n       ".join(
        " + ".join(
            f"(CASE WHEN b{16 * j + k} > 0 THEN {1 << (15 - k)} ELSE 0 END)"
            for k in range(16)
        )
        + f" AS band{j}"
        for j in range(_SIMHASH_BANDS)
    )
    ham = " + ".join(
        f"bit_count(xor(a.band{j}, b.band{j}))" for j in range(_SIMHASH_BANDS)
    )
    return f"""
{_simhash_votes_sql()},
bands AS (SELECT doc_id,
       {band_defs}
FROM v)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS BIGINT) AS hamming
FROM bands a JOIN bands b ON a.doc_id < b.doc_id
WHERE {ham} <= {_SIMHASH_HAM_MAX}
"""


# =====================================================================
# Training-data pipeline: similarity search
# =====================================================================


def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-5 neighbors for query vectors vec_id < 10.

    Pure column expressions: zip_with product + aggregate sum in DOUBLE
    (both sides of the oracle compute in double). Scale path: broadcast
    the query block, one pass over the corpus, per-partition top-k then
    global top-k — no n² shuffle. An IVF/LSH variant prunes the scan."""
    from .operators.similarity import cosine_topk

    e = _t(spark, sf_dir, "embeddings")
    return cosine_topk(e, e.filter(F.col("vec_id") < 10), k=5)


def q_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (exact): all (a, b) with
    cosine ≥ 0.45, a < b — the dedup family's embedding member, and the
    quadratic ground truth the LSH bucket path approximates.

    Plan: BLAS-blocked matrix product (operators/similarity.
    cosine_pairs_blocked) — one normalized side broadcast as a dense
    float64 matrix, the corpus streamed through mapInPandas with ONE
    ``B @ A.T`` per Arrow batch, final round/threshold as Spark column
    exprs (oracle-identical boundary behaviour). Replaced the previous
    zip_with/aggregate theta-join plan, which spent 34 s on the sandbox's
    2M pairs (~60k pairs/s of expression-tree overhead) vs sub-second
    BLAS. Scale ladder: this exact form verifies samples / bounded
    blocks; at corpus scale near-dup thresholds are ≥0.9 where the
    random-hyperplane buckets of q_embedding_knn_lsh prune candidates to
    tables·n/2^bits before this same exact filter re-ranks them. (The
    testdata corpus tops out at cos≈0.51, so the demo threshold is 0.45.)"""
    from .operators.similarity import cosine_pairs_blocked

    e = _t(spark, sf_dir, "embeddings")
    return cosine_pairs_blocked(e, threshold=0.45)


def q_embedding_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path: multi-table random-hyperplane LSH (4 tables x 6
    bits; operators/similarity.py). Neighbors are searched among bucket
    mates only, so the per-query scan shrinks to tables*n/2^bits expected;
    exact cosine re-ranks the candidate slice.

    The hyperplanes are FIXED by seed 42, so the whole pipeline — bucket
    signatures, candidate generation, exact re-rank — is deterministic and
    the DuckDB oracle (_lsh_oracle_sql, same planes as SQL literals)
    replays it value-for-value. Recall against the exact top-k is
    additionally asserted in tests/test_multimodal.py."""
    from .operators.similarity import lsh_topk

    e = _t(spark, sf_dir, "embeddings")
    return lsh_topk(e, e.filter(F.col("vec_id") < 20), dim=64, k=3)


def _lsh_oracle_sql(dim: int = 64, tables: int = 4, bits: int = 6, seed: int = 42) -> str:
    """DuckDB replay of q_embedding_knn_lsh: the seeded hyperplanes are
    embedded as double literals (repr() round-trips float64), bucket ids
    are the same MSB-first sign folds, candidates share a (table, bucket)
    in any table, and the exact cosine re-rank mirrors the Spark window.
    Must stay in lockstep with operators/similarity.lsh_signatures."""
    import numpy as np

    planes = np.random.RandomState(seed).standard_normal((tables, bits, dim))
    sig_selects = []
    for t in range(tables):
        terms = []
        for b in range(bits):
            arr = ", ".join(repr(float(x)) for x in planes[t, b])
            weight = 1 << (bits - 1 - b)
            terms.append(
                f"(CASE WHEN list_dot_product(v, [{arr}]) > 0 THEN {weight} ELSE 0 END)"
            )
        sig_selects.append(
            f"SELECT vec_id, {t} AS tbl, {' + '.join(terms)} AS bucket FROM e"
        )
    sig = "\n  UNION ALL ".join(sig_selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sig AS (
  {sig}
),
cand AS (
  SELECT DISTINCT q.vec_id AS q_id, c.vec_id AS neighbor_id
  FROM sig q JOIN sig c ON q.tbl = c.tbl AND q.bucket = c.bucket
                        AND q.vec_id <> c.vec_id
  WHERE q.vec_id < 20
),
sim AS (
  SELECT cand.q_id, cand.neighbor_id, list_cosine_similarity(qe.v, ce.v) AS cos
  FROM cand
  JOIN e qe ON qe.vec_id = cand.q_id
  JOIN e ce ON ce.vec_id = cand.neighbor_id
),
r AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk
  FROM sim
)
SELECT q_id, neighbor_id, CAST(rk AS INT) AS rank, round(cos, 5) AS cos
FROM r WHERE rk <= 3
"""


def q_embedding_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale path #2: IVF (inverted-file) coarse quantization
    (operators/similarity.ivf_topk). Each corpus vector is assigned to its
    nearest of 8 seeded unit centroids; queries (vec_id < 20) probe their
    2 nearest cells and exact-cosine re-rank only those cells' vectors —
    per-query work nprobe·n/n_cells instead of n.

    The centroids are FIXED by seed 7, so cell assignment, probing and
    re-rank are deterministic and the DuckDB oracle (_ivf_oracle_sql, same
    centroids as SQL literals) replays the whole pipeline value-for-value.
    Recall vs the exact top-k is additionally asserted in
    tests/test_multimodal.py."""
    from .operators.similarity import ivf_topk

    e = _t(spark, sf_dir, "embeddings")
    return ivf_topk(e, e.filter(F.col("vec_id") < 20), dim=64, k=3)


def _ivf_oracle_sql(
    dim: int = 64, n_cells: int = 8, nprobe: int = 2, seed: int = 7
) -> str:
    """DuckDB replay of q_embedding_knn_ivf: seeded centroids embedded as
    double literals (repr() round-trips float64), cell = argmax dot (ORDER
    BY dot DESC, cell DESC mirrors Spark's array_max tie-break), queries
    probe nprobe cells, exact cosine re-rank of cell mates. Must stay in
    lockstep with operators/similarity.ivf_centroids/ivf_topk."""
    from .operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    score_selects = []
    for i, c in enumerate(cents):
        arr = ", ".join(repr(float(x)) for x in c)
        score_selects.append(
            f"SELECT vec_id, {i} AS cell, list_dot_product(v, [{arr}]) AS dot FROM e"
        )
    scores = "\n  UNION ALL ".join(score_selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sc AS (
  {scores}
),
ranked AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell DESC) AS rk
  FROM sc
),
assign AS (SELECT vec_id, cell FROM ranked WHERE rk = 1),
probe AS (SELECT vec_id, cell FROM ranked WHERE rk <= {nprobe} AND vec_id < 20),
cand AS (
  SELECT p.vec_id AS q_id, a.vec_id AS neighbor_id
  FROM probe p JOIN assign a ON p.cell = a.cell AND p.vec_id <> a.vec_id
),
sim AS (
  SELECT cand.q_id, cand.neighbor_id, list_cosine_similarity(qe.v, ce.v) AS cos
  FROM cand
  JOIN e qe ON qe.vec_id = cand.q_id
  JOIN e ce ON ce.vec_id = cand.neighbor_id
),
r AS (
  SELECT q_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk
  FROM sim
)
SELECT q_id, neighbor_id, CAST(rk AS INT) AS rank, round(cos, 5) AS cos
FROM r WHERE rk <= 3
"""


# =====================================================================
# Training-data pipeline: text analysis
# =====================================================================


#: tiny per-language stopword lexicons for the heuristic language-ID.
#: The synthetic corpus is English-vocab for every lang label, so accuracy
#: is not the point — deterministic, SQL-portable prediction is.
LANG_LEXICON = {
    "en": ["the", "a"],
    "de": ["der", "und"],
    "fr": ["le", "et"],
    "es": ["el", "y"],
}


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language identification: stopword-hit counts per language,
    argmax with fixed priority tie-break (en > de > fr > es), compared to
    the labeled ``lang`` column. All column expressions."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))

    def _hits(words):
        # closure factory: a 2-arg lambda would be read as (element, index)
        return F.size(F.filter(F.col("toks"), lambda t: t.isin(*words)))

    counts = {lang: _hits(words) for lang, words in LANG_LEXICON.items()}
    pred = (
        F.when(
            (counts["en"] >= counts["de"])
            & (counts["en"] >= counts["fr"])
            & (counts["en"] >= counts["es"]),
            "en",
        )
        .when((counts["de"] >= counts["fr"]) & (counts["de"] >= counts["es"]), "de")
        .when(counts["fr"] >= counts["es"], "fr")
        .otherwise("es")
    )
    return d.select(
        "doc_id",
        *[counts[lang].alias(f"n_{lang}") for lang in LANG_LEXICON],
        pred.alias("pred_lang"),
        (pred == F.col("lang")).alias("label_match"),
    )


def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + quality scoring per document (whitespace tokens,
    distinct ratio, stopword ratio, quality flag) — all column exprs."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.split(F.col("text"), " "))
    toks = F.col("toks")  # materialized once; inlining split() would re-split per use
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    stop = F.size(F.filter(toks, lambda t: t.isin("a", "the")))
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        n_uniq.alias("n_distinct"),
        stop.alias("n_stopwords"),
        F.round(stop / n, 4).alias("stopword_ratio"),
        ((n >= 20) & (n <= 1000) & (stop / n < 0.5)).alias("quality_ok"),
    )


#: BPE-ish pre-tokenizer (GPT-2-style, ASCII-simplified): contraction
#: suffixes, space-prefixed letter runs, digit runs, punctuation runs,
#: whitespace runs. Alternation is leftmost-first in BOTH Java regex
#: (Spark) and RE2 (DuckDB), so token counts agree engine-for-engine.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting per document, both ways a training-data pipeline
    needs it: whitespace tokens (the cheap budget estimate) and a BPE-ish
    regex pre-tokenization (the LLM-tokenizer-shaped count — GPT-2's
    pre-tokenizer split, minus the byte-level merges that need a learned
    vocab). Pure column exprs; the regex runs JVM-side in one scan."""
    d = _t(spark, sf_dir, "documents")
    ws = F.size(F.split(F.col("text"), " "))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), F.lit(0)))
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.round(bpe.cast("double") / ws, 4).alias("bpe_per_ws"),
    )


def q_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus rollup by language: doc counts, char volume, source spread
    (A4-style census over the documents table)."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("docs"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("source").alias("n_sources"),
    )


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 digest over full text + over the
    first-8-token prefix (the prefix digest is the cheap pre-filter a
    rolling-hash family would feed). md5 — not xxhash64 — so the DuckDB
    oracle replays both digests value-for-value."""
    d = _t(spark, sf_dir, "documents")
    prefix = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 8))
    return d.select(
        "doc_id",
        F.md5("text").alias("fingerprint"),
        F.md5(prefix).alias("prefix_fingerprint"),
    )


# =====================================================================
# Multimodal plumbing (image payloads; deterministic datagen, no sf dep)
# =====================================================================


def q_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode + feature extraction over binary payload columns via
    mapInPandas (SURVEY §2.10 UDF #5): decode → dims/phash → per-format
    stats. Uses the engine's deterministic synthetic payload (the testdata
    star schema carries no binary column). Rows-only check."""
    from collections.abc import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    from . import datagen, schemas
    from .functions.imaging import decode_validate_batch

    pdf = datagen.gen_payload_pdf(120)
    payload = spark.createDataFrame(pdf, schema=schemas.PAYLOAD_SCHEMA)
    out_schema = T.StructType(
        [
            T.StructField("image_id", T.StringType()),
            T.StructField("fmt", T.StringType()),
            T.StructField("ok", T.BooleanType()),
            T.StructField("w", T.IntegerType()),
            T.StructField("h", T.IntegerType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def _decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for p in it:
            if p.empty:
                continue
            val = decode_validate_batch(p["bytes"].map(bytes), p["fmt"], p["phash"])
            yield pd.DataFrame(
                {
                    "image_id": p["image_id"].to_numpy(),
                    "fmt": p["fmt"].to_numpy(),
                    "ok": val["ok"].to_numpy(),
                    "w": val["w"].to_numpy(),
                    "h": val["h"].to_numpy(),
                    "phash": val["phash"].to_numpy(),
                }
            )

    decoded = payload.mapInPandas(_decode, schema=out_schema)
    return decoded.groupBy("fmt").agg(
        F.count("*").alias("n"),
        F.count_if(F.col("ok")).alias("n_ok"),
        F.round(F.avg("w"), 2).alias("avg_w"),
        F.round(F.avg("h"), 2).alias("avg_h"),
        F.countDistinct("phash").alias("distinct_phash"),
    )


def q_html_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's parse phase end-to-end (S1-S6, F15, W1): listing
    HTML → URL fan-out; detail HTML → JSON-LD + markup extraction → views
    parse, ISO duration, tag cleanup, best-quality variant top-1. All on
    deterministic synthetic pages (datagen); rows-only check."""
    from . import datagen
    from .functions.extraction import explode_listing, parse_detail_page
    from .functions.parsing import duration_to_seconds
    from .functions.urlnorm import canonicalize_url, extract_item_id
    from .operators.quality import best_quality_variant

    listings = spark.createDataFrame(datagen.gen_listing_pages_pdf(5, 24))
    discovered = explode_listing(listings).select(
        "page", extract_item_id(canonicalize_url(F.col("url"))).alias("image_id")
    )
    details = spark.createDataFrame(datagen.gen_detail_pages_pdf(5 * 24))
    parsed = parse_detail_page(details)
    variants = parsed.select("image_id", F.explode("variants").alias("v")).select(
        "image_id", F.col("v.url").alias("url"), F.col("v.label").alias("quality_label")
    )
    best = best_quality_variant(variants).select(
        "image_id", F.col("url").alias("best_url")
    )
    return (
        discovered.join(parsed, "image_id")
        .join(best, "image_id")
        .select(
            "image_id",
            "page",
            "title",
            "views",
            duration_to_seconds(F.col("duration")).alias("duration_s"),
            F.size("tags").alias("n_tags"),
            "best_url",
        )
    )


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction (decode → brightness/contrast →
    full+thumbnail phash) over the synthetic binary payload via one
    mapInPandas pass (functions/multimodal.py). Rows-only check."""
    from . import datagen, schemas
    from .functions.multimodal import image_features

    payload = spark.createDataFrame(
        datagen.gen_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    return image_features(payload)


# =====================================================================
# Event-stream operators (sessionization / as-of join / rolling windows /
# funnel — the stateful-stream families of SURVEY §2.9 expressed as batch
# window plans, the shapes a training-data pipeline runs over clickstreams)
# =====================================================================


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap): a new session
    starts where the per-user gap exceeds the threshold; sessions roll up
    to (n_events, start, end, sum_value).

    The batch twin of the streaming session-window operator (the reference
    sessionizes implicitly via its sequential per-page loop; this is the
    generalized form). Scale: ONE shuffle on user_id — the lag, the
    running-sum session id, and the final groupBy all share the
    (user_id, ts) clustering, so Spark plans a single sort per partition
    and the session agg combines map-side. No driver state; skewed users
    bound the partition, not the plan."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # events.ts is TIMESTAMP_NTZ; unix_micros needs an instant — the LTZ
    # cast's fixed offset cancels in the gap difference
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    gap_us = us - F.lag(us).over(w)
    is_new = F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    sess = ev.withColumn("session_id", F.sum(is_new).over(w).cast("int"))
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("int").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase event matched to the user's most recent
    click at-or-before it (the classic point-in-time lookup Spark lacks as
    a builtin). Implemented as the scale-correct union-and-carry plan:
    tag both streams, sort per user by (ts, is_right-last), carry the last
    click forward with last(ignorenulls) — ONE shuffle on user_id, no
    range-join explosion, no per-row lookup. A range join here would be
    O(purchases × clicks) per user before pruning; the carry plan is
    O(n log n) per partition, independent of match distance."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.lit(None).cast("long").alias("event_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
        F.lit(0).alias("is_q"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(None).cast("long").alias("click_id"),
        F.lit(None).cast("timestamp").alias("click_ts"),
        F.lit(1).alias("is_q"),
    )
    # clicks sort before purchases at equal ts (is_q asc) so an
    # exactly-simultaneous click still matches (<= semantics)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_q", "click_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = clicks.unionByName(purchases).select(
        "user_id",
        "ts",
        "event_id",
        "is_q",
        F.last("click_id", ignorenulls=True).over(w).alias("click_id"),
        F.last("click_ts", ignorenulls=True).over(w).alias("click_ts"),
    )
    # sentinel-coalesce the no-match-yet rows (purchase before any click):
    # nullable output values are hash-hostile in the gate compare, and the
    # oracle coalesces identically
    return carried.filter(F.col("is_q") == 1).select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("click_id"), F.lit(-1)).alias("click_id"),
        F.coalesce(
            F.col("click_ts"), F.lit("1970-01-01").cast("timestamp_ntz")
        ).alias("click_ts"),
    )


def q_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour per-user rolling count + sum (time-RANGE frame, not
    row frame — the windowed-aggregation shape of a rate limiter or
    per-host budget monitor). Scale: one shuffle on user_id; the RANGE
    frame evaluates with two sorted pointers per partition (O(n) amortized,
    state = one window's rows), never materializing per-row neighbor
    lists."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp_ltz")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("int").alias("n_events_1h"),
        F.round(F.sum("value").over(w), 4).alias("sum_value_1h"),
    )


def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user milestone funnel (view → click → purchase by first-touch
    timestamps): one groupBy with conditional mins, stage flags by strict
    timestamp order. Scale: a single map-side-combinable aggregate — no
    joins, no windows; 10^9 users is just a bigger hash agg."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("first_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    viewed = F.col("first_view").isNotNull()
    # coalesce: a NULL milestone makes the > comparison NULL, and the flag
    # must read FALSE, not NULL (three-valued logic bites identically in
    # the DuckDB oracle, which coalesces the same way)
    clicked = F.coalesce(viewed & (F.col("first_click") > F.col("first_view")), F.lit(False))
    purchased = F.coalesce(clicked & (F.col("first_purchase") > F.col("first_click")), F.lit(False))
    return agg.select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        viewed.alias("stage_view"),
        clicked.alias("stage_click"),
        purchased.alias("stage_purchase"),
    )


#: PII patterns — written to the Java-regex ∩ RE2 common subset (ASCII
#: `\b`, no backreferences/lookaround) so the identical pattern string runs
#: JVM-side in Spark and in the DuckDB oracle.
PII_EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}(?:\.\d{1,3}){3}\b"

#: stopword probe set for the Gopher-style quality rule ("contains at
#: least one of the common function words").
QUALITY_STOPWORDS = ("the", "a", "and", "of", "to")


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style heuristic quality gate per document: token-count
    bounds, mean-word-length window, repetition (distinct-token ratio),
    alphabetic-token ratio, stopword presence — each flag surfaced plus the
    conjunctive ``keep`` verdict (the pre-training corpus filter shape).

    Scale: pure column expressions over one scan — no shuffle, no UDF;
    whole-stage codegen end to end. Rule set after Rae et al. 2021 (Gopher)
    §A1.1 and Raffel et al. 2020 (C4) §2.2, thresholds adapted to the
    synthetic corpus."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    toks = F.col("toks")
    n = F.size(toks)
    # total chars minus the (n-1) separators, over n tokens — avoids a
    # second pass over the token array
    mean_wlen = (F.length("text") - n + F.lit(1)) / n
    distinct_ratio = F.size(F.array_distinct(toks)) / n
    alpha_ratio = F.size(F.filter(toks, lambda t: t.rlike("^[a-z]+$"))) / n
    n_stop = sum(
        F.when(F.array_contains(toks, w), 1).otherwise(0) for w in QUALITY_STOPWORDS
    ).cast("int")
    len_ok = (n >= 20) & (n <= 100_000)
    wlen_ok = (mean_wlen >= 3.0) & (mean_wlen <= 10.0)
    rep_ok = distinct_ratio >= 0.2
    alpha_ok = alpha_ratio >= 0.8
    stop_ok = n_stop >= 1
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        F.round(mean_wlen, 4).alias("mean_word_len"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(alpha_ratio, 4).alias("alpha_ratio"),
        n_stop.alias("n_stopwords_present"),
        len_ok.alias("len_ok"),
        wlen_ok.alias("wlen_ok"),
        rep_ok.alias("rep_ok"),
        alpha_ok.alias("alpha_ok"),
        stop_ok.alias("stop_ok"),
        (len_ok & wlen_ok & rep_ok & alpha_ok & stop_ok).alias("keep"),
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over text: emails / phone numbers / IPv4 addresses →
    typed placeholders, with per-class match counts (the pre-training
    scrubbing pass; reference has no equivalent — training-data pipeline
    op). The synthetic corpus carries no PII, so a deterministic augmented
    column plants one email (doc_id % 3 == 0) or one phone + one IP
    (doc_id % 3 == 1) per doc — the SAME augmentation expression runs in
    the DuckDB oracle, so the scrub itself is what's verified (md5 of the
    scrubbed text, value-for-value).

    Scale: one scan, three JVM-side regexp_replace passes, no shuffle."""
    d = _t(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            doc_id % 3 == 0,
            F.concat(
                F.lit(" contact user"), doc_id.cast("string"), F.lit("@example.com now")
            ),
        )
        .when(
            doc_id % 3 == 1,
            F.concat(
                F.lit(" call 555-0199 or visit 10.0.0."),
                (doc_id % 256).cast("string"),
            ),
        )
        .otherwise(F.lit("")),
    )
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"), PII_IP_RE, "<IP>"
        ),
        PII_PHONE_RE,
        "<PHONE>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(aug, F.lit(PII_EMAIL_RE), F.lit(0))).alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all(aug, F.lit(PII_IP_RE), F.lit(0))).alias("n_ips"),
        F.size(F.regexp_extract_all(aug, F.lit(PII_PHONE_RE), F.lit(0))).alias(
            "n_phones"
        ),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_len"),
    )


def q_image_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate PAIRS by perceptual hash: decode the binary
    payload (one mapInPandas pass — the multimodal plumbing), split the
    64-bit phash into 4×16-bit bands, self-join on (band_id, band_val),
    verify exact hamming ≤ 3 on candidates only. The image twin of
    q_dedup_simhash_pairs; the fixture plants one perturbed variant per
    original (datagen.gen_neardup_payload_pdf) whose roundtripped phash
    sits within the band pigeonhole guarantee (hamming ≤ 3 ⇒ ≥1 clean band
    of 4), so the banded plan provably finds every ground-truth pair.

    Scale shape: candidates per band bucket, never all-pairs; at 10^10
    images a 16-bit band holds n/65536 ids and the join stays bucketed.
    Oracle: quadratic hamming over independently-computed phashes (VALUES
    table from datagen params, no Spark)."""
    from . import datagen, schemas
    from .functions.multimodal import image_features

    payload = spark.createDataFrame(
        datagen.gen_neardup_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    # recompute phash from bytes through the engine's decode path — the
    # payload's phash column is the oracle's side, not this one's
    feats = image_features(payload).select("image_id", "phash")
    return _phash_band_pairs(feats)


def _phash_band_pairs(feats: DataFrame) -> DataFrame:
    """(id_a, id_b, hamming ≤ 3) pairs from an (image_id, phash) frame via
    4×16-bit band candidates + exact hamming verify on the slice. Shared by
    q_image_phash_pairs and q_image_dedup_retention so retention's decode
    cost is the caller's single feature pass."""
    bands = feats.select(
        "image_id",
        *[
            F.shiftrightunsigned(F.col("phash"), 16 * (3 - j))
            .bitwiseAND(F.lit(0xFFFF))
            .cast("int")
            .alias(f"band{j}")
            for j in range(4)
        ],
    ).persist()
    _PERSISTED_SHINGLES.append(bands)
    sig = bands.select(
        "image_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("band_id"), F.col(f"band{j}").alias("band_val")
                    )
                    for j in range(4)
                ]
            )
        ).alias("s"),
    ).select("image_id", F.col("s.band_id").alias("band_id"), F.col("s.band_val").alias("band_val"))
    sa = sig.select(F.col("image_id").alias("id_a"), "band_id", "band_val")
    sb = sig.select(F.col("image_id").alias("id_b"), "band_id", "band_val")
    cand = (
        sa.join(sb, ["band_id", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ba = bands.select(
        F.col("image_id").alias("id_a"),
        *[F.col(f"band{j}").alias(f"a{j}") for j in range(4)],
    )
    bb = bands.select(
        F.col("image_id").alias("id_b"),
        *[F.col(f"band{j}").alias(f"b{j}") for j in range(4)],
    )
    ham = None
    for j in range(4):
        term = F.bit_count(F.col(f"a{j}").bitwiseXOR(F.col(f"b{j}")))
        ham = term if ham is None else ham + term
    return (
        cand.join(ba, "id_a")
        .join(bb, "id_b")
        .select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )


def q_image_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy over perceptual-hash near-dup clusters: connected
    components of the banded-phash pair graph, then within each cluster
    KEEP the highest-contrast member (sharpness proxy; ties → smallest
    image_id) — the image twin of q_dedup_retention and the LAION-style
    "which duplicate survives" pass an image-corpus pipeline runs after
    pairwise dedup. Only contested images (in ≥1 pair) are returned;
    singletons keep themselves trivially.

    Scale: rides q_image_phash_pairs' banded candidates (never all-pairs)
    and connected_components' min-label propagation (rounds = component
    diameter — 1 for this planted original+variant population, 2-3 for
    real quasi-clique dup groups), then one node-keyed feature join and a
    per-cluster top-1 window on cluster keys. The contrast lookup comes
    from the SAME single mapInPandas decode pass image_features uses.

    Oracle: union-find over the quadratic-hamming ground-truth pairs +
    per-image contrast recomputed via the driver-side codec path, no
    Spark (groundtruth.expected_image_dedup_retention)."""
    from . import datagen, schemas
    from .functions.multimodal import image_features
    from .operators.clustering import connected_components

    payload = spark.createDataFrame(
        datagen.gen_neardup_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    # ONE decode pass: phash (pair candidates) and contrast (retention
    # ranking) come out of the same persisted feature frame
    feats = image_features(payload).select("image_id", "phash", "contrast").persist()
    _PERSISTED_SHINGLES.append(feats)
    pairs = _phash_band_pairs(feats.select("image_id", "phash")).select("id_a", "id_b")
    comp = connected_components(pairs, src="id_a", dst="id_b").select(
        F.col("doc_id").alias("image_id"),
        F.col("canonical_id").alias("cluster_id"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("contrast").desc(), F.col("image_id")
    )
    return (
        comp.join(feats, "image_id")
        .withColumn("pick", F.row_number().over(w))
        .select(
            "image_id",
            "cluster_id",
            "contrast",
            (F.col("pick") == 1).alias("keep"),
        )
    )


def q_image_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucket assignment for image-model training (the
    SDXL-style bucketed-batching pass: group images whose w:h is nearest
    each target ratio so a training shard never mixes shapes). Decode via
    the one-pass mapInPandas feature UDF, then assign each image to the
    argmin-log-distance bucket of multimodal.ASPECT_BUCKETS — computed
    exactly in integer cross-multiplication (see the constant's docstring),
    ties → first bucket in declaration order.

    Scale: decode is the same shuffle-free map stage image_features uses;
    bucketing is pure JVM column arithmetic (20 integer comparisons), so
    the whole plan is one scan + one projection at any corpus size.

    Oracle: VALUES ground truth — the same argmin evaluated driver-side
    with exact Fractions over the independently-decoded dims
    (groundtruth.expected_image_aspect_buckets)."""
    from . import datagen, schemas
    from .functions.multimodal import aspect_bucket_col, image_features

    payload = spark.createDataFrame(
        datagen.gen_varied_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    feats = image_features(payload).select("image_id", "w", "h")
    bucket = aspect_bucket_col(F.col("w"), F.col("h"))
    return feats.select("image_id", "w", "h", bucket.alias("bucket"))


def q_image_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image quality gate (the image twin of q_quality_filter): decode →
    too_dark / too_flat / too_small flags + keep verdict, the filter an
    image-corpus pipeline runs before captioning or training. The varied
    fixture plants a dark subset (pixels // 4 at i % 5 == 0) and a tiny
    frame (32×24 in the dims cycle) so every flag fires on real rows.

    Scale: one shuffle-free decode pass + column comparisons; thresholds
    evaluate on the rounded features the decode pass emits (see
    multimodal.IMG_GATE_* docstring), so the oracle is exact.

    Oracle: VALUES ground truth via the driver-side codec pass
    (groundtruth.expected_image_quality_gate)."""
    from . import datagen, schemas
    from .functions.multimodal import (
        IMG_GATE_MIN_BRIGHTNESS,
        IMG_GATE_MIN_CONTRAST,
        IMG_GATE_MIN_PIXELS,
        image_features,
    )

    payload = spark.createDataFrame(
        datagen.gen_varied_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    f = image_features(payload)
    too_dark = F.col("brightness") < IMG_GATE_MIN_BRIGHTNESS
    too_flat = F.col("contrast") < IMG_GATE_MIN_CONTRAST
    too_small = (F.col("w") * F.col("h")) < IMG_GATE_MIN_PIXELS
    return f.select(
        "image_id",
        "w",
        "h",
        "brightness",
        "contrast",
        too_dark.alias("too_dark"),
        too_flat.alias("too_flat"),
        too_small.alias("too_small"),
        (F.col("ok") & ~too_dark & ~too_flat & ~too_small).alias("keep"),
    )


def q_image_shard_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing (the WebDataset-style shard writer's
    assignment step): within each aspect bucket, lay images out in
    deterministic image_id order and cut a new shard every
    SHARD_CAPACITY_BYTES of payload — shard_id = floor(exclusive running
    byte offset / capacity). Dims come from the payload's declared
    metadata (packing runs AFTER the decode gate has validated them;
    re-decoding here would be wasted work at corpus scale).

    Scale: the naive plan is one window per bucket — 5 partitions, each a
    single reducer over corpus/5 rows. This implements the two-level
    offset decomposition instead (the same trick rank_frontier_scalable
    uses for crawl-order seq): block = image_id range, a groupBy computes
    per-(bucket, block) byte sums (tiny — one row per block), the driver
    cumulates exclusive base offsets per bucket in block order and
    broadcasts them back, and the intra-block running sum is a window
    partitioned by (bucket, block) — parallelism = #blocks, serial work
    O(block_size). Size blocks so #blocks ≈ sqrt(n) (both levels bounded);
    nest another level for 10^9+ images, as priority_cutoff does.

    Oracle: VALUES ground truth — the same exclusive cumsum computed
    driver-side from the datagen parameters (no Spark, no blocks), so the
    gate proves the two-level decomposition ≡ the per-bucket spec.
    """
    from . import datagen, schemas
    from .functions.multimodal import pack_shards

    payload = spark.createDataFrame(
        datagen.gen_varied_payload_pdf(120), schema=schemas.PAYLOAD_SCHEMA
    )
    return pack_shards(payload)


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-column features (the audio twin of image_decode_stats /
    image_features): decode WAV → duration/rms/peak + silence/clipping
    flags + 64-bit energy fingerprint, one mapInPandas pass. The fixture
    plants silent clips (every 7th), clipped clips (every 5th), and
    undecodable mp3 rows (every 11th — ok=False, features null: the
    classify-don't-crash path a mixed 100 TB media corpus needs).

    Scale: pure map stage — no shuffle; binary streams through Arrow in
    bounded batches, per-clip loop (codec-dominated), never per-sample.

    Oracle: VALUES ground truth recomputed from the GENERATION PARAMETERS
    (groundtruth.expected_audio_features regenerates each clip's samples
    from datagen and recomputes features without touching WAV bytes — so
    the gate checks the encode → Spark → decode round-trip end to end)."""
    from . import datagen, schemas
    from .functions.multimodal import audio_features

    payload = spark.createDataFrame(
        datagen.gen_audio_payload_pdf(84), schema=schemas.AUDIO_PAYLOAD_SCHEMA
    )
    # undecodable rows keep ok=False but get typed zero/false features —
    # the gate compare (and DuckDB's pandas bridge) must never see NULLs
    return (
        audio_features(payload)
        .drop("error")
        .na.fill({"sample_rate": 0, "n_samples": 0, "duration_s": 0.0,
                  "rms": 0.0, "peak": 0.0, "ahash": 0})
        .na.fill(False, ["silent", "clipped"])
    )


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (the frame-extraction pass a video-training
    pipeline runs before captioning): every 4th frame per clip → one row
    per sampled frame with phash, brightness, and a scene-cut flag
    (phash hamming vs the previous sampled frame ≥ 16). Real container:
    MP4/ISO-BMFF with motion-JPEG samples (functions/mp4.py) — sampling
    seeks per-frame byte ranges through the stsc/stco/stsz tables; swap
    in pyav for temporal codecs and nothing downstream changes.

    Scale: map-side explode — no shuffle; only sampled frames' byte
    ranges are read and decoded per clip.

    Oracle: VALUES ground truth regenerated from datagen's frame
    parameters (groundtruth.expected_video_frame_sample)."""
    from . import datagen, schemas
    from .functions.multimodal import video_frames

    payload = spark.createDataFrame(
        datagen.gen_video_payload_pdf(36), schema=schemas.VIDEO_PAYLOAD_SCHEMA
    )
    return video_frames(payload, every_n=4).drop("error")


def q_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip scene-cut rollup over the sampled frames: cut count and
    first cut frame (every 3rd fixture clip has a planted mid-clip scene
    change). One groupBy shuffle over the map-side frame sample.

    Oracle: VALUES ground truth (groundtruth.expected_video_scene_cuts)."""
    from . import datagen, schemas
    from .functions.multimodal import video_frames

    payload = spark.createDataFrame(
        datagen.gen_video_payload_pdf(36), schema=schemas.VIDEO_PAYLOAD_SCHEMA
    )
    frames = video_frames(payload, every_n=4)
    return frames.groupBy("media_id").agg(
        F.max("n_frames").alias("n_frames"),
        F.max("fps").alias("fps"),
        F.count("frame_idx").alias("n_sampled"),
        F.count_if(F.col("is_cut")).cast("int").alias("n_cuts"),
        F.coalesce(
            F.min(F.when(F.col("is_cut"), F.col("frame_idx"))), F.lit(-1)
        ).alias("first_cut_idx"),  # -1 = no cut (gate compare is null-free)
    )


def q_video_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Demux-level container audit over the video corpus: per clip the
    real MP4 metadata — codec fourcc, frame count, fps, dims, sample
    payload bytes, box-structure overhead — resolved from the ISO BMFF
    tree (ftyp/moov/stbl) WITHOUT decoding a single sample. This is the
    O(metadata) inventory pass a crawl runs before paying for frame
    extraction; the reference stops at magic-byte sniffing of the same
    boxes (file_validator.py:185-220) — this parses them for real.

    Scale: map-only Arrow-batched pass, no shuffle, and per-clip cost is
    O(moov size), independent of payload length (the demuxer never reads
    mdat).

    Oracle: VALUES ground truth — the deterministic encode replayed +
    parsed driver-side (groundtruth.expected_video_container_stats), so
    the Spark pass must recover identical metadata from the blobs."""
    from . import datagen, schemas
    from .functions.multimodal import video_container_stats

    payload = spark.createDataFrame(
        datagen.gen_video_payload_pdf(36), schema=schemas.VIDEO_PAYLOAD_SCHEMA
    )
    return video_container_stats(payload).drop("error")


def q_audio_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mp3 frame-header audit over a compressed-audio corpus (functions/
    multimodal.audio_container_stats): frame count, duration, byte
    split, bitrate range and CBR/VBR per clip from the frame headers
    alone — no audio decoded. The inventory/validation pass the crawl
    runs over formats it cannot decode in-container (audio.py is
    WAV/PCM16-only; the reference accepts mp3 by signature,
    file_downloader.py:633-637); truncated blobs fail soft to null rows.

    Scale: map-only Arrow-batched pass, no shuffle; per-clip cost is
    O(n_frames) 4-byte header reads, independent of frame payload size.

    Oracle: VALUES ground truth — the deterministic container build
    replayed + walked driver-side (groundtruth.
    expected_audio_container_stats)."""
    from . import datagen, schemas
    from .functions.multimodal import audio_container_stats

    payload = spark.createDataFrame(
        datagen.gen_mp3_payload_pdf(30), schema=schemas.AUDIO_PAYLOAD_SCHEMA
    )
    # soft-fail rows keep their identity but carry sentinels, not nulls —
    # the gate's row sort/hash must never compare None against a value
    return (
        audio_container_stats(payload)
        .drop("error")
        .na.fill(-1)
        .na.fill({"mode": "invalid"})
    )


def q_image_container_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEBP/GIF header audit over the undecodable-image population
    (functions/multimodal.image_container_stats): variant
    (vp8/vp8l/vp8x, gif87a/gif89a), dimensions and GIF frame count from
    the container structure alone. Completes the accepted-image surface
    (reference file_downloader.py:633-637): JPEG/PNG decode for real in
    the numpy codecs, WEBP/GIF now parse for real instead of stopping at
    magic bytes; malformed blobs fail soft to null rows.

    Scale: map-only Arrow-batched pass, no shuffle, O(header) per blob.

    Oracle: VALUES ground truth (groundtruth.
    expected_image_container_stats)."""
    from . import datagen, schemas
    from .functions.multimodal import image_container_stats

    payload = spark.createDataFrame(
        datagen.gen_web_image_payload_pdf(30), schema=schemas.AUDIO_PAYLOAD_SCHEMA
    )
    # sentinels instead of nulls on soft-fail rows (see audio audit)
    return (
        image_container_stats(payload)
        .drop("error")
        .na.fill(-1)
        .na.fill({"fmt": "invalid", "variant": "invalid"})
    )


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC crawl-archive ingestion (sources/warc.py): parse a plain .warc
    and a gzip .warc.gz (the Common-Crawl layout) into one row per record
    — the replayable-input path a 100 TB crawl actually starts from.
    Payload bytes are reported as (length, md5) so the gate hashes them
    without binary literals.

    Scale: one task per WARC file (binaryFile is not block-splittable and
    neither is WARC — see the module docstring), record explosion in an
    Arrow-batched mapInPandas; a real crawl has 10^5 files per snapshot,
    so file-level parallelism saturates any executor count.

    Oracle: VALUES ground truth straight from the fixture's generation
    parameters (groundtruth.expected_warc_ingest) — the WARC bytes are
    only ever read through the Spark parser."""
    from . import datagen
    from .sources.warc import records_from_files

    files = spark.createDataFrame(
        sorted(datagen.gen_warc_files().items()), "path string, content binary"
    )
    return records_from_files(files).select(
        "warc_file",
        "record_idx",
        "warc_type",
        "url",
        "warc_date",
        "http_status",
        "content_type",
        F.length("payload").cast("long").alias("nbytes"),
        F.md5("payload").alias("digest"),
    )


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (the classic text-feature /
    keyword-extraction pass; idf = ln(N/df) over the corpus).

    Scale: three shuffles, each key-partitioned and necessary — tf by
    (doc, token), df by token, final per-doc window — all map-side
    combinable; the doc-count scalar joins as a broadcast literal, never
    a driver constant baked at plan time. 10^9 docs is the same plan."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    tf = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    # df from tf (already one row per doc×token) — a plain count, no
    # countDistinct expand
    df_ = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = d.select(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_, "tok")
        .join(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("tok"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            "doc_id",
            "tok",
            F.col("tf").cast("int").alias("tf"),
            F.col("df").cast("int").alias("df"),
            F.round("tfidf", 4).alias("tfidf"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def q_dedup_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention policy over near-dup clusters: within each connected
    component of the exact-Jaccard pair graph, KEEP the longest document
    (ties → smallest doc_id) and drop the rest — the step a training-data
    pipeline runs after clustering, choosing which duplicate survives.
    Docs in no cluster keep themselves trivially and are omitted (the
    interesting rows are the contested ones).

    Scale: rides q_dedup_clusters' min-label propagation (rounds =
    component diameter), then one broadcast-joinable doc-length lookup and
    a per-cluster top-1 window on cluster keys."""
    clusters = q_dedup_clusters(spark, sf_dir).select("doc_id", "canonical_id")
    lens = _t(spark, sf_dir, "documents").select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = Window.partitionBy("canonical_id").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    return (
        clusters.join(lens, "doc_id")
        .withColumn("pick", F.row_number().over(w))
        .select(
            "doc_id",
            "canonical_id",
            "n_tokens",
            (F.col("pick") == 1).alias("keep"),
        )
    )


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents that contain an
    eval-set document's content (the GPT-3/C4-style n-gram-overlap scrub a
    training corpus runs before any model sees it).

    Eval set: the deterministic 5% slice ``doc_id % 20 == 7`` (stand-in
    for a real benchmark table — swap the filter for a join against it).
    A training doc is contaminated when it covers ≥ 50% of a benchmark
    doc's distinct 3-gram shingles — containment (one-sided overlap
    coefficient), not Jaccard, because a short benchmark doc embedded in a
    much longer training doc must still trip the flag.

    Scale: the corpus is shingled ONCE (_shingle_df, persisted) and the
    corpus side is never shuffled — the bench shingles and bench sizes are
    broadcast (real eval sets are 10^3-10^5 docs, orders smaller than the
    corpus), so the plan is broadcast-hash-join + partial agg on
    (doc_id, bench_id). If the eval side ever outgrows broadcast, fall
    back to the max_df-capped shuffle join jaccard_pairs uses."""
    sh = _shingle_df(_t(spark, sf_dir, "documents"))
    is_bench = F.col("doc_id") % 20 == 7
    bench = sh.filter(is_bench)
    train = sh.filter(~is_bench)
    bsz = bench.groupBy(F.col("doc_id").alias("bench_id")).agg(
        F.count("*").alias("bench_sz")
    )
    common = (
        train.join(
            F.broadcast(bench.select(F.col("doc_id").alias("bench_id"), "shingle")),
            "shingle",
        )
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_overlap"))
    )
    containment = F.col("n_overlap") / F.col("bench_sz")
    return (
        common.join(F.broadcast(bsz), "bench_id")
        .filter(containment >= 0.5)
        .select(
            "doc_id",
            "bench_id",
            "n_overlap",
            "bench_sz",
            F.round(containment, 4).alias("containment"),
        )
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by salted md5 — the
    shuffle-free, rerun-stable dataset split every training pipeline needs.

    The split depends only on doc_id, so re-runs, backfills, and corpus
    growth never move an existing doc across splits (appending data can't
    leak yesterday's val docs into tomorrow's train). Plan: a narrow
    projection — zero shuffles, zero UDFs, whole-stage-codegen'd string
    compare. The first 8 md5 hex chars are uniform on [0, 16^8), compared
    lexicographically (identical byte-wise semantics in Spark and DuckDB):
    < 'cccccccc' ≈ 0.8, < 'e6666666' ≈ 0.9. The salt prefix decorrelates
    this split from every other md5(doc_id) use (sampling, ordering)."""
    d = _t(spark, sf_dir, "documents")
    h = F.substring(
        F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8
    )
    split = (
        F.when(h < "cccccccc", "train").when(h < "e6666666", "val").otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-priority PageRank over a link graph (operators/graph.py).

    The frontier's priority column is link authority on a real corpus —
    PageRank over the crawl's discovered link graph is how a production
    frontier decides which of 10^10 URLs to fetch next (the reference's
    descending-page order, main_scraper.py:547-614, is a degenerate
    priority score).  The link graph here is synthesized deterministically
    from doc_id so the oracle can rebuild it: each doc links to
    ``(doc_id·31 + k·17) mod N`` for k ∈ 1..4 (self-links dropped; the
    offsets are pairwise distinct mod N for the driver table sizes, and
    any collision would be reproduced identically by the oracle anyway).

    Scale: per round one join keyed on src + one groupBy-sum on dst —
    Pregel-shape, no driver materialization; 8 fixed rounds so the result
    is a pure function of the input (oracle = unrolled-CTE power method).
    Floats: both engines run the identical arithmetic shape; only
    summation order differs (≤ a few in-edges per node), so round(…, 8)
    is far above the ~1e-15 sum-order noise."""
    from .operators.graph import pagerank

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    nodes = d.select(F.col("doc_id").alias("node_id"))
    k = F.explode(F.array([F.lit(i) for i in (1, 2, 3, 4)])).alias("k")
    edges = (
        d.select(F.col("doc_id").alias("src"), k)
        .select("src", ((F.col("src") * 31 + F.col("k") * 17) % n).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )
    pr = pagerank(nodes, edges, n_iter=8, damping=0.85)
    return pr.select(
        F.col("node_id").alias("doc_id"), F.round("pr", 8).alias("pagerank")
    )


def q_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 bigram collocations by PMI — the counting step of tokenizer
    induction (a BPE merge round picks argmax pair count; collocation
    mining ranks by pointwise mutual information instead).

    Plan: one explode for unigram counts, one adjacent-pair zip
    (``transform`` over a slice — no self-join to build bigrams) for pair
    counts, then two broadcast joins of the pair table against the
    unigram counts.  PMI = ln((c_xy/B) / ((c_x/T)·(c_y/T))) over integer
    counts — bit-identical across engines (no float-sum order anywhere),
    so ties in the top-k cut are broken exactly by (w1, w2).  Scale: the
    aggregated pair table is O(vocab²)-bounded and heavily pre-combined
    map-side; the final top-k window runs on that aggregate, not the
    corpus (swap in two-level agg + TakeOrdered for a 10^8-type vocab)."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.split("text", " ").alias("w"))
    uni = toks.select(F.explode("w").alias("word"))
    ucnt = uni.groupBy("word").agg(F.count("*").alias("c"))
    t_total = uni.count()
    big = toks.select(
        F.explode(
            F.expr(
                "transform(slice(w, 1, size(w) - 1),"
                " (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
            )
        ).alias("bg")
    ).select("bg.w1", "bg.w2")
    b_total = big.count()
    bcnt = (
        big.groupBy("w1", "w2")
        .agg(F.count("*").alias("pair_n"))
        .filter(F.col("pair_n") >= 5)
    )
    u1 = ucnt.select(F.col("word").alias("w1"), F.col("c").alias("w1_n"))
    u2 = ucnt.select(F.col("word").alias("w2"), F.col("c").alias("w2_n"))
    pmi = F.round(
        F.log(
            (F.col("pair_n") * 1.0 / F.lit(b_total))
            / (
                (F.col("w1_n") * 1.0 / F.lit(t_total))
                * (F.col("w2_n") * 1.0 / F.lit(t_total))
            )
        ),
        6,
    )
    scored = (
        bcnt.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .select("w1", "w2", "pair_n", "w1_n", "w2_n", pmi.alias("pmi"))
    )
    w = Window.orderBy(F.col("pmi").desc(), "w1", "w2")
    return scored.withColumn("seq", F.row_number().over(w).cast("int")).filter(
        F.col("seq") <= 20
    )


def q_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture reweighting: downsample each source to hit a target
    mixture (the data-curation step behind DoReMi-style domain weights —
    pick proportions first, then sample each domain deterministically).

    Target share of source ``srcK`` ∝ K+1 (normalized over the sources
    present); the kept budget is half the corpus.  Per-source keep rate =
    min(1, budget·share / n_src); a row survives iff the first 8 md5 hex
    digits of a salted key fall under rate·16^8 — the same shuffle-free
    hash-threshold rule as ``sample_hash_threshold`` (rerun-stable,
    append-stable, engine-agnostic).  Plan: one tiny agg for per-source
    counts (broadcast back), then a map-only filter — no shuffle touches
    the corpus rows, so one giant domain costs nothing extra.  All rate
    math is a single double division of exact integers; the threshold is
    floored explicitly on both sides (Spark casts truncate, DuckDB casts
    round — floor() pins them equal)."""
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.groupBy("source")
        .agg(F.count("*").alias("n_src"))
        .withColumn("w", F.substring("source", 4, 10).cast("long") + 1)
    )
    stats = counts.agg(
        F.sum("w").alias("sum_w"), F.sum("n_src").alias("n_total")
    )
    rates = counts.crossJoin(stats).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.col("w") * F.floor(F.col("n_total") / 2)).cast("double")
            / (F.col("sum_w") * F.col("n_src")).cast("double"),
        ).alias("rate"),
    )
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    return (
        d.join(F.broadcast(rates), "source")
        .filter(bucket < F.floor(F.col("rate") * 4294967296.0).cast("long"))
        .select("doc_id", "source", F.round("rate", 6).alias("keep_rate"))
    )


def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's k-means over the embedding table (k=8, 3 fixed update
    rounds, first-k-ids init) — the clustering step behind SemDeDup-style
    curation (dedup/sample within embedding clusters) and clustered data
    selection.

    Determinism contract (what makes an external oracle possible): fixed
    iteration count, deterministic init (vec_id < k), centroids rounded
    to 6 dp after every update (pins the groupBy-avg's summation-order
    noise, ~1e-15, well below the rounding grid), and assignment by
    round(score, 6) with cluster id as the tiebreak.  The score is the
    argmin-equivalent −2·x·c + c·c (the x·x term is constant per row);
    the dot products are sequential JVM folds (zip_with + aggregate) so
    both engines fold in the same order.

    Scale: per round one broadcast cross join (n×k scored rows — k is
    small), one window argmin keyed on vec_id, one (cluster, dim) avg —
    nothing materializes on the driver, lineage cut per round.  At 10^9
    vectors swap the fold for the BLAS-blocked pandas-UDF scorer in
    operators/similarity.py (same argmin, Arrow-batched)."""
    k, iters = 8, 3
    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    cents = e.filter(F.col("vec_id") < k).select(
        F.col("vec_id").cast("int").alias("cluster"),
        F.transform("embedding", lambda x: x.cast("double")).alias("c"),
    )

    def assign(cents_df):
        scored = e.crossJoin(F.broadcast(cents_df)).select(
            "vec_id",
            "embedding",
            "cluster",
            F.round(
                -2.0 * dot(F.col("embedding"), F.col("c"))
                + dot(F.col("c"), F.col("c")),
                6,
            ).alias("score"),
        )
        w = Window.partitionBy("vec_id").orderBy("score", "cluster")
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "embedding", "cluster")
        )

    for _ in range(iters):
        a = assign(cents)
        cents = (
            a.select("cluster", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.round(F.avg("v"), 6).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("cluster", F.col("pm.m").alias("c"))
            .localCheckpoint(eager=True)
        )
    final = assign(cents)
    sizes = final.groupBy("cluster").agg(
        F.count("*").cast("long").alias("cluster_n")
    )
    return final.join(sizes, "cluster").select("vec_id", "cluster", "cluster_n")


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram LM score — the CCNet-style perplexity proxy
    (average token log-probability under the corpus's own unigram MLE):
    low-scoring docs are gibberish / rare-token soup, the classic
    language-model quality filter for training corpora.

    Plan: one explode for the token stream, a vocabulary-sized count agg
    broadcast back onto the stream, one groupBy(doc_id) avg — the corpus
    rows shuffle once (on doc_id), the vocabulary joins map-side.
    Floats: ln(c/T) per token is bit-identical across engines; only the
    per-doc avg's summation order differs (~1e-16·n noise on O(1)-scale
    values), so round(…, 6) is far above it."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
    ucnt = tok.groupBy("word").agg(F.count("*").alias("c"))
    t_total = tok.count()
    return (
        tok.join(F.broadcast(ucnt), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("c") * 1.0 / F.lit(t_total))), 6
            ).alias("lm_score"),
        )
    )


def q_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: flag events whose value sits
    more than 3 median-absolute-deviations from the user's median — the
    quantile-based cleaning rule (MAD, not stddev) that survives the
    heavy-tailed distributions training telemetry actually has.

    Two exact grouped percentiles (median of value, then median of the
    absolute deviations) joined back onto the rows; the comparison
    ``dev > 3·mad`` is deterministic because exact interpolated
    percentiles involve no summation order (sort + linear interpolation,
    Spark ``percentile`` ≡ DuckDB ``quantile_cont``).  Scale: both aggs
    and both joins key on user_id — one partitioning serves all four
    steps; per-group exact medians sort within groups (fine at per-user
    cardinality; corpus-scale switches to approx_percentile with
    rank-error verification, as q_brand_price_quantiles documents)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    med = ev.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(med, "user_id").withColumn(
        "dev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("user_id").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        dev.join(mad, "user_id")
        .filter(F.col("dev") > 3.0 * F.col("mad"))
        .select(
            "event_id",
            "user_id",
            "value",
            F.round("dev", 6).alias("dev"),
            F.round("mad", 6).alias("mad"),
        )
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality filters (Rae et al. 2021 §A1.1):
    duplicate-token fraction and top-bigram fraction per document, with a
    ``repetitive`` flag — the standard pretraining-corpus screens for
    boilerplate and degenerate repetition.

    Zero-shuffle by construction: bigrams are built with zip_with over two
    slices of the token array, and the top-bigram count is the longest run
    in the SORTED bigram array, computed with an ``aggregate`` fold —
    per-row column expressions only, so the plan is a single scan at any
    corpus size (the explode+groupBy formulation would shuffle every
    bigram occurrence; the fold keeps it embarrassingly parallel)."""
    d = _t(spark, sf_dir, "documents").withColumn("toks", F.split("text", " "))
    toks = F.col("toks")
    n = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    bigrams = F.zip_with(
        F.slice(toks, F.lit(1), n - 1),
        F.slice(toks, F.lit(2), n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )

    def _run_step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top_n = F.aggregate(
        F.array_sort(bigrams),
        F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")),
        _run_step,
        lambda acc: acc["best"],
    )
    dup_frac = F.lit(1.0) - n_uniq * F.lit(1.0) / n
    top_frac = top_n * F.lit(1.0) / (n - 1)
    return d.select(
        "doc_id",
        n.alias("n_tokens"),
        n_uniq.alias("n_distinct"),
        top_n.alias("top_bigram_n"),
        F.round(dup_frac, 4).alias("dup_token_frac"),
        F.round(top_frac, 4).alias("top_bigram_frac"),
        ((dup_frac > 0.6) | (top_frac > 0.1)).alias("repetitive"),
    )


def q_trap_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap detection by URL-pattern collapse: normalize digit runs
    in each URL to 'N' and count distinct URLs per (host, pattern) — a
    pattern whose distinct-URL count explodes is a calendar/session-id
    trap the frontier should cap (the per-host URL-space heuristic real
    crawlers apply before a trap eats the politeness budget; complements
    the reference's one-page-at-a-time bound, scrape_orchestrator.py).

    URLs are synthesized deterministically from events (user_id → host,
    click/view rows carry an unbounded numeric id path — the trap shape).
    Scale: one groupBy on (host, pattern) with map-side partial counts;
    the digit-collapse regexp runs JVM-side in the scan."""
    ev = _t(spark, sf_dir, "events")
    url = F.concat(
        F.lit("/"),
        F.col("event_type"),
        F.when(
            F.col("event_type").isin("click", "view"),
            F.concat(F.lit("/"), F.col("event_id").cast("string")),
        ).otherwise(F.lit("/page")),
    )
    host = F.concat(F.lit("h"), (F.col("user_id") % 10).cast("string"))
    return (
        ev.select(host.alias("host"), url.alias("url"))
        .withColumn("url_pattern", F.regexp_replace("url", "[0-9]+", "N"))
        .groupBy("host", "url_pattern")
        .agg(
            F.countDistinct("url").alias("n_urls"),
            F.count("*").alias("n_hits"),
        )
        .withColumn("trap", F.col("n_urls") >= 50)
    )


#: q_range_join bucket/interval width: 37 minutes in microseconds. The
#: bucket width EQUALS the interval length, so every interval overlaps at
#: most 2 buckets and the candidate blow-up is bounded at 2× rows.
_RANGE_W_US = 37 * 60 * 1_000_000


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: every 199th event anchors a 37-minute window
    [ts, ts+37min); count and sum ALL events falling inside each window.
    The generic form of "events within a maintenance/promo window" — the
    range-predicate join Spark has no native operator for (the documented
    companion to q_asof_join's point-in-time lookup).

    Scale shape (bucketed range join): both sides are keyed by
    floor(ts/W) time buckets with W = the interval length, so each
    interval covers ≤ 2 buckets (explode ≤ 2 rows) and the join becomes
    an EQUI-join on bucket + residual range filter — SMJ/shuffle-hash on
    a shuffle key, AQE-handled skew, candidates bounded by per-bucket
    co-residency. The naive form is a pure theta join = BroadcastNestedLoop
    O(n·m); the bucketed form is O(n + m + matches·2). Buckets are
    internal (derived identically for both sides from the same µs value),
    so output semantics are exactly the range predicate, which is what
    the oracle replays with a plain inequality join."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))  # UTC session
    e = ev.select(
        F.col("value").alias("v"),
        us.alias("us"),
        F.expr(f"unix_micros(cast(ts as timestamp_ltz)) div {_RANGE_W_US}").alias("bucket"),
    )
    iv = (
        ev.filter(F.col("event_id") % 199 == 0)
        .select(F.col("event_id").alias("window_id"), us.alias("start_us"))
        .withColumn("end_us", F.col("start_us") + F.lit(_RANGE_W_US))
        .withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"start_us div {_RANGE_W_US}"),
                    F.expr(f"(end_us - 1) div {_RANGE_W_US}"),
                )
            ),
        )
    )
    return (
        iv.join(e, "bucket")
        .filter((F.col("us") >= F.col("start_us")) & (F.col("us") < F.col("end_us")))
        .groupBy("window_id")
        .agg(
            F.count("*").cast("int").alias("n_events"),
            F.round(F.sum("v"), 4).alias("sum_value"),
        )
    )


def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup semantic dedup over the embedding table (operators/
    similarity.semdedup_prune): nearest-of-8 seeded-centroid cell
    assignment, within-cell pairwise cosine, prune when a lower-id
    cell-mate is ≥ 0.45 similar. The curation step between clustering
    (q_embedding_kmeans) and near-dup pairs (q_dedup_embedding_cosine):
    cells bound the quadratic so it scales where all-pairs cannot.

    Deterministic end-to-end (seeded centroids, argmax tie → higher cell,
    cosine rounded to 6 dp before the threshold), so the DuckDB oracle
    replays cell assignment AND the prune decision value-for-value with
    the centroids embedded as SQL literals."""
    from .operators.similarity import semdedup_prune

    return semdedup_prune(_t(spark, sf_dir, "embeddings"), dim=64, tau=0.45)


#: HLL register count (2^4) and the rho cap that keeps the harmonic-mean
#: denominator EXACT: registers hold rho ≤ 40, so Σ 2^(40−M_j) is integer
#: arithmetic (≤ 16·2^40 ≪ 2^63) and the only float op is one division —
#: bit-identical in any engine, no summation-order noise.
_HLL_M = 16
_HLL_RHO_CAP = 40
_HLL_NUM = repr(0.673 * _HLL_M * _HLL_M * float(2**_HLL_RHO_CAP))
#: 4-bit value → 4-char binary string lookup table ('0000'…'1111').
_NIB_BIN = "".join(format(v, "04b") for v in range(16))


def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-user estimate per event_type, next to the
    exact count — the sketch every 100 TB frontier needs for "distinct
    URLs per host" style cardinality without a distinct shuffle.

    Built from scratch on md5 so BOTH engines replay it bit-for-bit
    (Spark's approx_count_distinct and DuckDB's approx_distinct use
    different private hashes — useless for a value-level gate): bucket =
    first hash nibble (m=16 registers), rho = 1 + leading zeros of the
    next 60 bits (nibbles → binary-string lookup, instr for the first
    '1'), register = max rho capped at 40. The harmonic denominator is
    the INTEGER Σ 2^(40−M_j) (exact — no float summation-order hazard),
    the estimate one float division, with the standard linear-counting
    branch below 2.5m when empty registers remain (exercised at
    sf0.001's 15 users; the raw branch at sf0.01's 150).

    Scale: partial-aggregating groupBy on (type, bucket) — map-side
    combine reduces every partition to ≤ groups·16 register rows, vs the
    full repartition a count(DISTINCT) needs. The exact count alongside
    is the sandbox-scale verification twin."""
    ev = _t(spark, sf_dir, "events")
    hx = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("hx")
    )

    def _nib(j: int) -> F.Column:
        ch = F.substring("hx", j + 1, 1)
        return F.when(ch >= "a", F.ascii(ch) - 87).otherwise(F.ascii(ch) - 48)

    bits = F.concat(
        *[F.substr(F.lit(_NIB_BIN), _nib(j) * 4 + 1, F.lit(4)) for j in range(1, 16)]
    )
    pos = F.instr(bits, "1")
    rho = F.least(F.when(pos == 0, 61).otherwise(pos), F.lit(_HLL_RHO_CAP))
    reg = (
        hx.select("event_type", _nib(0).alias("bucket"), rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("m_reg"))
    )
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(spark.range(_HLL_M).select(F.col("id").cast("int").alias("bucket"))))
    )
    full = grid.join(reg, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("m_reg", F.lit(0)).alias("m_reg")
    )
    est = full.groupBy("event_type").agg(
        (
            F.lit(float(_HLL_NUM))
            / F.sum(F.expr(f"shiftleft(1L, {_HLL_RHO_CAP} - m_reg)"))
        ).alias("raw"),
        F.sum(F.when(F.col("m_reg") == 0, 1).otherwise(0)).alias("v_zero"),
    )
    m = float(_HLL_M)
    corrected = F.when(
        (F.col("raw") <= 2.5 * m) & (F.col("v_zero") > 0),
        F.lit(m) * F.log(F.lit(m) / F.col("v_zero")),
    ).otherwise(F.col("raw"))
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("int").alias("n_exact")
    )
    return (
        est.join(exact, "event_type")
        .select(
            "event_type",
            "n_exact",
            F.round(corrected, 4).alias("hll_est"),
        )
        .withColumn(
            "rel_err",
            F.round((F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 4),
        )
    )


#: Count-min sketch geometry: d=4 hash rows × w=32 counters. Small enough
#: that the full sketch is 128 rows (broadcastable, SQL-replayable), large
#: enough that sf0.01's vocabulary visibly collides (the overestimate the
#: query reports is the sketch's defining behavior, not noise).
_CMS_D = 4
_CMS_W = 32


def _cms_bucket(j: int, tok: F.Column) -> F.Column:
    """Row-j counter index for a token: first 8 hex digits of a salted md5,
    mod w — same engine-agnostic idiom as domain_mix's hash threshold."""
    hx = F.substring(F.md5(F.concat(F.lit(f"cms{j}:"), tok)), 1, 8)
    return (F.conv(hx, 16, 10).cast("long") % _CMS_W).alias(f"b{j}")


def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates for the exact top-10 tokens —
    the mergeable point-frequency sketch next to q_hll_distinct's
    cardinality sketch (Cormode & Muthukrishnan 2005). At 100 TB the
    sketch replaces a distinct-token shuffle with a CONSTANT 4×32 counter
    grid: one corpus pass, map-side combine collapses every partition to
    ≤ d·w rows before the (tiny) shuffle, and per-partition sketches merge
    by addition — the property that makes CMS streamable and federatable.

    Built on salted md5 (engine-portable, like the HLL) and pure integer
    counts — no floats anywhere, so the DuckDB oracle replays the sketch
    AND the estimates bit-for-bit. The exact counts ride along as the
    verification twin; `overest = cms_est - n_exact` is ≥ 0 by the CMS
    one-sided-error guarantee (property-tested over every token).

    Plan shape: explode tokens once, posexplode the 4-bucket array (4
    rows/token BEFORE partial agg, never materialized past the combiner),
    groupBy (row_j, bucket) → 128 rows; estimates join the exact top-10's
    12 lookup rows to the broadcast sketch and take min over rows."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    buckets = F.array(*[_cms_bucket(j, F.col("tok")) for j in range(_CMS_D)])
    sketch = (
        toks.select(F.posexplode(buckets).alias("row_j", "bucket"))
        .groupBy("row_j", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "tok")
        .limit(10)
    )
    lookups = exact.select(
        "tok", "n_exact", F.posexplode(buckets).alias("row_j", "bucket")
    )
    return (
        lookups.join(F.broadcast(sketch), ["row_j", "bucket"])
        .groupBy("tok", "n_exact")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "tok",
            "n_exact",
            "cms_est",
            (F.col("cms_est") - F.col("n_exact")).alias("overest"),
        )
    )


def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-table join through the runtime bloom-filter reduction
    (operators/dedup.bloom_semi_join): urgent orders (~18% of the dim
    table) drive a bloom that prefilters lineitem BEFORE the join shuffle;
    the exact equi-join on the survivors kills the false positives, so the
    rollup below is exactly the plain inner join the oracle runs.

    Scale shape: the fact side sheds ~82% of its rows map-side (one
    mapInPandas probe over the key column, no driver collect on the
    aligned path), the dimension side builds a 32-shard filter once —
    the dynamic-filtering pattern every selective star join needs at
    100 TB, demonstrated with the engine's own seen-set filter rather
    than an optimizer flag."""
    from .operators.dedup import bloom_semi_join

    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    joined = bloom_semi_join(li, urgent, big_key="l_orderkey", small_key="o_orderkey")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return joined.groupBy("l_returnflag", "o_orderstatus").agg(
        F.count("*").cast("long").alias("n_items"),
        F.round(F.sum(rev), 2).alias("revenue"),
    )


#: Quantile-sketch geometry: 4 sub-bucket bits → 16 sub-buckets per
#: power-of-two octave (HdrHistogram's exponent+mantissa bucketization).
#: Bucket bounds are [(16+sub)·2^(e-4), (17+sub)·2^(e-4)); the midpoint
#: estimate is within (upper−lower)/2 = lower/32 of any in-bucket value,
#: so relative error ≤ 1/32 — property-tested at every percentile.
_QSK_SUBBITS = 4


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (HdrHistogram-style log₂ histogram; the
    deterministic cousin of DDSketch, Masson et al. VLDB 2019) — p50/p95/
    p99 of lineitem price per return flag, next to the exact rank-based
    value. Completes the sketch triptych: HLL (cardinality), CMS (point
    frequency), this (quantiles) — the three state summaries a 100 TB
    profiler keeps per column without ever sorting the data.

    Bucketization is PURE INTEGER so DuckDB replays every bucket id
    bit-for-bit (exactly why percentile_approx/approx_quantile can't be
    gated value-level: private float codecs): cents = price·100 as long,
    octave e = length(bin(cents))−1 (the bit length, no log()), sub-bucket
    = top-4 mantissa bits via a variable shiftright, bucket_id = e·16+sub
    − 16. The estimate reconstructs the bucket midpoint as (sub+16.5)·
    2^(e−4) — a float built from integers and an exact power of two, so
    both engines produce the identical double.

    Scale shape: one partial-aggregating groupBy collapses every partition
    to ≤ groups·(16·64) counter rows map-side (vs the full sort a true
    percentile needs); sketches merge by addition, so per-partition /
    per-day sketches federate. Quantile extraction walks the cumulative
    counts of the ≤1k-row sketch; rank = floor(q·(n−1)) (type-1/lower
    quantile — replayed verbatim in the oracle via row_number). The exact
    twin rides along as the sandbox-scale verification column."""
    li = _t(spark, sf_dir, "lineitem")
    v = li.select(
        "l_returnflag",
        (F.col("l_extendedprice") * 100).cast("long").alias("cents"),
    )
    # TPC-H prices are ≥ $900 → cents ≥ 2^16, so e ≥ 4 always holds and
    # the mantissa shift (e−4) is never negative.
    withe = v.withColumn("e", F.length(F.bin(F.col("cents"))) - 1)
    bucketed = withe.select(
        "l_returnflag",
        (
            F.col("e") * 16 + F.expr("shiftright(cents, e - 4)") - 16
        ).alias("bucket_id"),
    )
    sketch = bucketed.groupBy("l_returnflag", "bucket_id").agg(
        F.count("*").alias("c")
    )
    wcum = Window.partitionBy("l_returnflag").orderBy("bucket_id")
    cum = sketch.withColumn("cum", F.sum("c").over(wcum))

    n = v.groupBy("l_returnflag").agg(F.count("*").alias("n"))
    qs = spark.createDataFrame(
        [("p50", 0.5), ("p95", 0.95), ("p99", 0.99)], "q_name string, q double"
    )
    ranks = n.crossJoin(F.broadcast(qs)).select(
        "l_returnflag",
        "q_name",
        "n",
        F.floor(F.col("q") * (F.col("n") - 1)).alias("rk"),
    )
    hit = (
        ranks.join(F.broadcast(cum), "l_returnflag")
        .filter(F.col("cum") > F.col("rk"))
        .groupBy("l_returnflag", "q_name", "n", "rk")
        .agg(F.min("bucket_id").alias("bucket_id"))
    )
    wv = Window.partitionBy("l_returnflag").orderBy("cents")
    ranked = v.withColumn("rn", F.row_number().over(wv))
    exact = ranks.join(
        ranked,
        ["l_returnflag"],
    ).filter(F.col("rn") == F.col("rk") + 1)
    est = (F.col("bucket_id") % 16 + 16.5) * F.pow(
        F.lit(2.0), (F.floor(F.col("bucket_id") / 16) - 4).cast("double")
    )
    return (
        hit.withColumn("est_cents", est)
        .join(
            exact.select("l_returnflag", "q_name", F.col("cents").alias("exact_cents")),
            ["l_returnflag", "q_name"],
        )
        .select(
            "l_returnflag",
            "q_name",
            "n",
            "exact_cents",
            F.round("est_cents", 4).alias("est_cents"),
            F.round(
                (F.col("est_cents") - F.col("exact_cents")) / F.col("exact_cents"), 6
            ).alias("rel_err"),
        )
    )


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k=25 documents with
    inclusion probability proportional to length — the Efraimidis-
    Spirakis A-ES key method (IPL 2006): u = hash-uniform(0,1), key =
    u^(1/w), keep the k largest keys. One map pass computes keys, then a
    distributed top-k — no global sort, no multi-pass rejection loop.

    This is the exact-k counterpart of q_domain_mix's Bernoulli hash
    thresholding: domain_mix hits a target SHARE in expectation, this
    draws an exact-size sample under per-row weights — what a training-
    data mixer needs when the recipe says "25 docs, length-weighted".

    Determinism: u is built from the same salted-md5 idiom as the CMS/
    domain_mix ((hex8 + 0.5)/2^32, never exactly 0 so ln/pow are finite),
    so the oracle replays keys value-for-value; keys are continuous so
    the top-k cut is tie-free. Scale shape: TakeOrderedAndProject — each
    partition keeps its local k in a heap, the driver merges k·partitions
    rows; mergeable across corpus shards the same way (max-k of key
    unions), which also makes it a one-pass streaming reservoir."""
    d = _t(spark, sf_dir, "documents")
    w = F.length("text").cast("double").alias("w")
    u = (
        (F.conv(F.substring(F.md5(F.concat(F.lit("aes:"), F.col("doc_id"))), 1, 8), 16, 10).cast("double") + 0.5)
        / F.lit(4294967296.0)
    )
    keyed = d.select(
        "doc_id", w, F.pow(u, F.lit(1.0) / F.col("w")).alias("skey")
    ).filter(F.col("w") > 0)
    return (
        keyed.orderBy(F.col("skey").desc())
        .limit(25)
        .select("doc_id", F.col("w").cast("long").alias("w"), F.round("skey", 9).alias("skey"))
    )


def _zorder_interleave8(a: F.Column, b: F.Column) -> F.Column:
    """Morton key from two 8-bit integers: bit i of ``a`` lands at 2i, bit
    i of ``b`` at 2i+1. The 16 terms occupy disjoint bits, so plain + is
    the bit-or — a shape DuckDB replays with the same >>/&/<< arithmetic."""
    out = None
    for i in range(8):
        ta = F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        tb = F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        out = ta + tb if out is None else out + ta + tb
    return out


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) data layout over events on (user_id, time) —
    per-file bounding boxes after cutting the z-sorted order into 16 files.
    THE data-layout lever for 100 TB scan pruning (Delta OPTIMIZE ZORDER /
    Iceberg sort orders): a table sorted by time alone answers user-scoped
    queries by reading every file; interleaving the two dimensions' bits
    makes every file a small rectangle in (user, time) space, so file-level
    min/max stats prune BOTH predicates (~√F of F files for a point query
    on either axis — asserted against the time-sorted layout in
    tests/test_zorder.py).

    All integer arithmetic, replayed bit-for-bit by the oracle: each
    dimension is range-normalized to 8 bits via (x−min)·256 div
    (max−min+1) (timestamps as microsecond DIFFERENCES, so the NTZ↔LTZ
    offset cancels — the sessionize idiom), the Morton key interleaves the
    two bytes, and ntile(16) over (zkey, event_id) cuts files. The global
    ntile sort is the sandbox's SQL-replayable stand-in for the production
    write path — repartitionByRange(zkey) + sortWithinPartitions, which
    needs no global sort (range exchange on sampled bounds); the per-file
    boxes it yields are the same shape."""
    ev = _t(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp_ltz"))
    base = ev.select("event_id", F.col("user_id").alias("uid"), us.alias("us"))
    rng = base.agg(
        F.min("uid").alias("umin"),
        F.max("uid").alias("umax"),
        F.min("us").alias("smin"),
        F.max("us").alias("smax"),
    )
    j = base.crossJoin(F.broadcast(rng))
    a8 = F.expr("(uid - umin) * 256 div (umax - umin + 1)")
    b8 = F.expr("(us - smin) * 256 div (smax - smin + 1)")
    keyed = j.select(
        "event_id",
        a8.alias("a8"),
        b8.alias("b8"),
    ).withColumn("zkey", _zorder_interleave8(F.col("a8"), F.col("b8")))
    cut = keyed.withColumn(
        "file_id", F.ntile(16).over(Window.orderBy("zkey", "event_id"))
    )
    return cut.groupBy("file_id").agg(
        F.count("*").cast("long").alias("n_rows"),
        F.min("a8").alias("min_user_bucket"),
        F.max("a8").alias("max_user_bucket"),
        F.min("b8").alias("min_time_bucket"),
        F.max("b8").alias("max_time_bucket"),
    )


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication at 13-token granularity — document
    pairs sharing ≥5 distinct 13-grams (the window length of Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better",
    which dedups at 50 BPE tokens; 13 words ≈ the same span). Catches the
    boilerplate/quotation overlap MinHash's whole-document similarity
    smooths over: two long docs sharing one lifted paragraph score near-0
    Jaccard but light up here.

    Plan: one pass builds each doc's DISTINCT 13-gram set (transform over
    the token array — the window explode happens inside a single
    projection, array_distinct BEFORE the explode keeps repeated
    boilerplate within a doc from inflating the join), grams md5-hashed to
    fixed 32-byte keys, then a self-equi-join on gram hash with doc_a <
    doc_b and a pair-count aggregate. Exactly the shingle-join shape of
    dedup_ngram_jaccard, so the same max_df valve applies verbatim when a
    gram goes viral at 100 TB (stop-gram capping bounds the hottest key at
    df²); the full Lee-et-al. treatment (suffix-array span merging) would
    replace the distinct-set with positional grams and chain adjacent
    hits — the join skeleton is unchanged."""
    d = _t(spark, sf_dir, "documents")
    grams = (
        d.filter(F.size(F.split("text", " ")) >= 13)
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.expr(
                        "transform(sequence(0, size(split(text, ' ')) - 13), "
                        "i -> md5(concat_ws(' ', slice(split(text, ' '), i + 1, 13))))"
                    )
                )
            ).alias("gh"),
        )
    )
    a = grams.alias("a")
    b = grams.alias("b")
    return (
        a.join(b, (F.col("a.gh") == F.col("b.gh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= 5)
    )


# =====================================================================
# Round-3 additions: web-graph metadata, corpus comparison, tokenizer
# induction, multimodal alignment, drift monitoring
# =====================================================================


def q_anchor_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text aggregation over the crawl's link graph — the classic
    web-corpus enrichment step (inbound anchor terms describe a page
    better than its own text; they feed both ranking and training-data
    captioning). The reference never aggregates across pages at all; this
    is the Spark-native generalization of its per-page metadata merge
    (video_info_extractor.py:194-300).

    The link graph reuses q_pagerank's deterministic synthesis
    (dst = (src·31 + k·17) mod N, k ∈ 1..4, self-links dropped) so the
    oracle can rebuild it; the anchor term for edge k is token k of the
    source document (every doc has ≥10 tokens, so no null anchors).

    Plan: two hash aggregations keyed on dst — per-(dst, anchor) counts
    feeding a per-dst top-1 window, and per-dst inlink/distinct-src
    totals — joined on dst. Both shuffles share the dst key; the window
    partitions by dst (never a global sort). At 10^10 edges this is the
    standard two-level combine: partial map-side aggregation bounds the
    shuffle at distinct (dst, anchor) pairs, not raw edges."""
    d = _t(spark, sf_dir, "documents")
    n = d.count()
    k = F.explode(F.array([F.lit(i) for i in (1, 2, 3, 4)])).alias("k")
    edges = (
        d.select(F.col("doc_id").alias("src"), F.split("text", " ").alias("w"), k)
        .select(
            "src",
            ((F.col("src") * 31 + F.col("k") * 17) % n).alias("dst"),
            F.get("w", F.col("k") - 1).alias("anchor"),
        )
        .filter(F.col("dst") != F.col("src"))
    )
    tot = edges.groupBy("dst").agg(
        F.count("*").alias("inlinks"),
        F.countDistinct("src").alias("distinct_src"),
    )
    pa = edges.groupBy("dst", "anchor").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("anchor").asc())
    top = pa.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return tot.join(top, "dst").select(
        "dst",
        "inlinks",
        "distinct_src",
        F.col("anchor").alias("top_anchor"),
        F.col("cnt").alias("top_anchor_n"),
    )


def q_corpus_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl overlap estimation: bottom-k minhash sketch of two
    corpora next to the exact Jaccard — the "how much of crawl N+1 did we
    already have in crawl N" question every recurring crawl asks before
    paying for a full anti-join. The two corpora are overlapping doc_id
    slices (A = id mod 3 ∈ {0,1}, B = id mod 3 ∈ {1,2}) — every text in
    the testdata is unique, so disjoint halves would make J trivially 0;
    the shared ≡1 slice pins true J ≈ 1/3 and actually exercises the
    estimator.

    Bottom-k (Cohen / Beyer et al.): per corpus keep the k smallest
    md5(text) over DISTINCT texts; merge the two sketches, keep the k
    smallest of the union, and estimate J = |{h in merged-k: h in both
    sketches}| / |merged-k| (denominator min(k, |union|) so the estimator
    is exact when the union fits in the sketch). md5 keeps both engines
    bit-identical.

    Scale: the exact twin is one groupBy over distinct texts; the sketch
    path aggregates to 2k rows — per-corpus bottom-k is a
    partial-aggregating per-partition top-k at scale (k rows per
    partition shuffle), and the merged rank runs on ≤2k driver-trivial
    rows (the single-partition window is over the SKETCH, never the
    corpus)."""
    K = 128
    d = _t(spark, sf_dir, "documents")
    m = F.col("doc_id") % 3
    base = d.select(
        F.md5("text").alias("h"),
        F.when(m <= 1, 1).otherwise(0).alias("a"),
        F.when(m >= 1, 1).otherwise(0).alias("b"),
    )
    flags = base.groupBy("h").agg(
        F.max("a").alias("in_a"), F.max("b").alias("in_b")
    )
    exact = flags.agg(
        F.sum(F.col("in_a") * F.col("in_b")).alias("inter"),
        F.count("*").alias("uni"),
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
    )
    # orderBy().limit(k) compiles to TakeOrderedAndProject: per-partition
    # bottom-k, driver merge of k·partitions rows — the distributed
    # bottom-k idiom (never a global sort).
    ska = (
        flags.filter(F.col("in_a") == 1)
        .select("h")
        .orderBy("h")
        .limit(K)
        .select("h", F.lit(0).alias("c"))
    )
    skb = (
        flags.filter(F.col("in_b") == 1)
        .select("h")
        .orderBy("h")
        .limit(K)
        .select("h", F.lit(1).alias("c"))
    )
    skf = (
        ska.union(skb)
        .groupBy("h")
        .agg(
            F.max(F.when(F.col("c") == 0, 1).otherwise(0)).alias("sk_a"),
            F.max(F.when(F.col("c") == 1, 1).otherwise(0)).alias("sk_b"),
        )
    )
    wm = Window.orderBy("h")
    est = (
        skf.withColumn("mrk", F.row_number().over(wm))
        .filter(F.col("mrk") <= K)
        .agg(
            F.sum(F.col("sk_a") * F.col("sk_b")).alias("both_k"),
            F.count("*").alias("mk"),
        )
    )
    return exact.crossJoin(est).select(
        F.lit(K).cast("int").alias("k"),
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(F.col("inter") / F.col("uni"), 6).alias("exact_jaccard"),
        F.round(F.col("both_k") / F.col("mk"), 6).alias("est_jaccard"),
    )


def q_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus drift monitor: token-length distribution of two crawl
    snapshots (doc_id parity halves) compared by per-bucket KL terms —
    the data-quality alarm a recurring crawl runs before a new snapshot
    enters training (distribution shift = scraper breakage or source
    drift, caught before the tokenizer sees it).

    Buckets are token length clamped to 12 with a generated 1..12 spine
    (zero-count buckets stay present), Laplace-smoothed (+1 / +12), and
    KL(P_a‖P_b) arrives as per-bucket contributions p_a·ln(p_a/p_b).
    Every float is a single expression over exact integer counts — no
    float summation anywhere — so Spark and DuckDB agree bit-for-bit
    before the final round.

    Scale: one explode + one 12-group hash agg (map-side combined), a
    broadcast of the 1-row totals; the spine join is 12 rows."""
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        (F.col("doc_id") % 2).cast("int").alias("c"),
        F.explode(F.split("text", " ")).alias("t"),
    ).select("c", F.least(F.length("t"), F.lit(12)).alias("bucket"))
    cnt = tok.groupBy("bucket").agg(
        F.sum(F.when(F.col("c") == 0, 1).otherwise(0)).alias("cnt_a"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).alias("cnt_b"),
    )
    spine = spark.range(1, 13).select(F.col("id").cast("int").alias("bucket"))
    filled = (
        spine.join(cnt, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("cnt_a", F.lit(0)).cast("long").alias("cnt_a"),
            F.coalesce("cnt_b", F.lit(0)).cast("long").alias("cnt_b"),
        )
    )
    tot = filled.agg(F.sum("cnt_a").alias("ta"), F.sum("cnt_b").alias("tb"))
    j = filled.crossJoin(F.broadcast(tot))
    pa = (F.col("cnt_a") + 1) / (F.col("ta") + 12)
    pb = (F.col("cnt_b") + 1) / (F.col("tb") + 12)
    return j.select(
        "bucket",
        "cnt_a",
        "cnt_b",
        F.round(pa, 8).alias("p_a"),
        F.round(pb, 8).alias("p_b"),
        F.round(pa * F.log(pa / pb), 8).alias("kl_term"),
    )


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three greedy BPE merge rounds over the corpus — the actual
    tokenizer-induction loop (q_bigram_pmi is one round's counting step;
    this runs the count → argmax-pair → merge-corpus cycle and re-counts
    on the merged corpus, Sennrich et al. 2016).

    Corpus representation: each doc becomes ' tok₁  tok₂ … ' with
    double-space separators, so a merge is one literal string replace of
    ' x  y ' with ' x_y ' — left-to-right non-overlapping replacement IS
    greedy BPE application, and both engines' replace() share that
    semantic exactly. Pair counts come from the adjacent-pair zip
    (transform over a slice — no self-join); the argmax pair (tie-broken
    by (w1, w2)) is a 1-row collect per round, which is the nature of the
    artifact: tokenizer training emits a driver-small merge TABLE, not a
    dataset. tokens_after re-counts the merged corpus, verifying the
    replace application itself, not just the counts.

    Scale: per round one map-side-combined pair aggregation (shuffle
    bounded by distinct pairs, not corpus tokens) + one map-only corpus
    rewrite; rounds are a fixed constant (real BPE runs ~30k rounds over
    a SAMPLE — the per-round plan is identical). Oracle: 3 unrolled CTE
    rounds replaying count/argmax/replace verbatim."""
    d = _t(spark, sf_dir, "documents")
    corpus = d.select(
        "doc_id",
        F.concat(F.lit(" "), F.regexp_replace("text", " ", "  "), F.lit(" ")).alias("s"),
    )
    rows = []
    for r in (1, 2, 3):
        toks = corpus.select(F.split(F.trim(F.col("s")), "  ").alias("w"))
        pairs = toks.select(
            F.explode(
                F.expr(
                    "transform(slice(w, 1, size(w) - 1),"
                    " (x, i) -> struct(x AS w1, w[i + 1] AS w2))"
                )
            ).alias("bg")
        ).select("bg.w1", "bg.w2")
        best = (
            pairs.groupBy("w1", "w2")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "w1", "w2")
            .limit(1)
            .collect()[0]
        )
        pat = f" {best['w1']}  {best['w2']} "
        rep = f" {best['w1']}_{best['w2']} "
        corpus = corpus.select(
            "doc_id", F.replace(F.col("s"), F.lit(pat), F.lit(rep)).alias("s")
        )
        tokens_after = (
            corpus.select(F.size(F.split(F.trim(F.col("s")), "  ")).alias("n"))
            .agg(F.sum("n"))
            .collect()[0][0]
        )
        rows.append((r, best["w1"], best["w2"], int(best["cnt"]), int(tokens_after)))
    return spark.createDataFrame(
        rows, "round int, left_tok string, right_tok string, pair_n long, tokens_after long"
    )


def q_caption_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-text alignment score per (document, embedding) pair — the
    CLIP-score-shaped filter of multimodal curation (LAION keeps pairs
    whose caption embedding and image embedding cosine above a cutoff).
    No model exists in this sandbox, so the text side is an honest
    DETERMINISTIC projection — a hashed bag-of-words signed sum, the
    random-hyperplane trick of q_simhash applied as an embedding — while
    the image side is the real embeddings table; the Spark plumbing
    (explode → aligned elementwise join → cosine) is exactly what the
    real-model version runs, with the projection swapped for an encoder.

    Text vector: for each of the first 8 tokens, md5(token) supplies 64
    signed bits (hex nibbles MSB-first, +1/-1); v_j = Σ_tokens sgn_j.
    Cosine joins the per-dimension text rows against the posexploded
    embedding rows on (doc_id, j) — one equi-join keyed (doc_id, j), one
    per-doc aggregation; all integer until the final cosine.

    Scale: rows = docs × 8 × 64 on the text side, docs × 64 on the image
    side — both linear in corpus size, shuffled once on the doc key; at
    10^10 docs swap the explode for the BLAS-blocked mapInPandas form of
    q_dedup_embedding_cosine (same contract, fewer rows), which the
    oracle-checked relational form here verifies."""
    d = _t(spark, sf_dir, "documents")
    e = _t(spark, sf_dir, "embeddings")
    toks = d.select(
        "doc_id", F.explode(F.slice(F.split("text", " "), 1, 8)).alias("t")
    ).select("doc_id", F.md5("t").alias("hx"))
    nib = (
        "(CASE WHEN substring(hx, CAST(j DIV 4 AS INT) + 1, 1) >= 'a'"
        " THEN ascii(substring(hx, CAST(j DIV 4 AS INT) + 1, 1)) - 87"
        " ELSE ascii(substring(hx, CAST(j DIV 4 AS INT) + 1, 1)) - 48 END)"
    )
    sbits = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, 63), j -> "
                f"CASE WHEN shiftright({nib}, 3 - j % 4) % 2 = 1 THEN 1 ELSE -1 END)"
            )
        ).alias("j", "sgn"),
    )
    tv = sbits.groupBy("doc_id", "j").agg(F.sum("sgn").alias("tv"))
    ev = e.select(
        F.col("vec_id").alias("doc_id"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("j", "ev"),
    )
    return (
        tv.join(ev, ["doc_id", "j"])
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("tv") * F.col("ev")).alias("dot"),
            F.sum(F.col("tv") * F.col("tv")).alias("t2"),
            F.sum(F.col("ev") * F.col("ev")).alias("e2"),
        )
        .select(
            "doc_id",
            F.round(F.col("dot") / F.sqrt(F.col("t2") * F.col("e2")), 6).alias(
                "align_score"
            ),
        )
    )


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction — the IR backbone a crawled corpus
    feeds (every search/dedup/decontamination system downstream of a
    crawl starts here): per term, document frequency, total term
    frequency, and a capped posting list (first 8 doc_ids ascending,
    comma-joined — string-encoded so the value gate compares a scalar).

    Plan: one explode → one (term, doc) pre-aggregation (map-side
    combined: within-doc repeats collapse before the shuffle) → a
    row_number window over (term ORDER BY doc_id) caps the posting list
    BEFORE any collect (a stopword's aggregation buffer holds ≤8 ids —
    never the full posting list; the window sort spills, a collect_list
    buffer does not) → one per-term aggregation. The window's
    partitionBy(term) exchange is the same key the final groupBy needs,
    so the cap adds a sort but no extra shuffle. df/tf are the same
    two-level combine over all rows; only the collected list is capped.
    Shape pinned in tests/test_plans.py (no unbounded collect buffer)."""
    d = _t(spark, sf_dir, "documents")
    td = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    w = Window.partitionBy("term").orderBy("doc_id")
    capped = td.withColumn("rn", F.row_number().over(w))
    return capped.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),
        F.sum("tf").cast("long").alias("tf_total"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("rn") <= 8, F.col("doc_id"))
                    )
                ),
                lambda x: x.cast("string"),
            ),
            ",",
        ).alias("postings_head"),
    )


#: BM25 demo query terms + standard constants (k1, b)
_BM25_TERMS = ("spark", "join", "fast")
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval over the corpus for a fixed conjunctive-OR
    term set — the scoring half of the inverted index (Robertson et al.);
    the crawl-to-search loop closed: score(d) = Σ_t idf(t) · tf·(k1+1) /
    (tf + k1·(1−b+b·len/avglen)), idf = ln(1 + (N−df+0.5)/(df+0.5)).

    Every input to the float math is an exact integer (tf, df, N, token
    counts; avglen = exact integer sum / count), so both engines compute
    bit-identical doubles — the only cross-engine float hazard would be a
    float SUM, and the per-doc score sums ≤3 terms in a fixed fold shape.
    Plan: the document length ``dl`` is computed in the SAME scan that
    builds the (term, doc) postings and carried through the aggregation
    key — there is no corpus-sized side to broadcast or join (the r3
    version broadcast a one-row-per-document length table: executor OOM
    by construction at 10^10 docs). The only broadcast left is ``df_t``
    — one row per QUERY term (≤3 rows). Top-20 is orderBy().limit(20) —
    TakeOrderedAndProject (per-partition heaps, never a global sort into
    one partition); the rank window then runs over the 20 surviving
    rows. At scale this is a textbook DAAT scorer: work is O(postings
    of the query terms), never O(corpus). Shape pinned in
    tests/test_plans.py (TakeOrdered present, no doc-count broadcast)."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.count()
    avgdl_row = (
        d.select(F.size(F.split("text", " ")).alias("dl"))
        .agg(F.sum("dl").alias("s"), F.count("*").alias("c"))
        .collect()[0]
    )
    avgdl = avgdl_row["s"] / avgdl_row["c"]
    toks = d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("dl"),
        F.explode(F.split("text", " ")).alias("term"),
    )
    td = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("term", "doc_id", "dl")
        .agg(F.count("*").alias("tf"))
    )
    df_t = td.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(n_docs) - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    k1, b = _BM25_K1, _BM25_B
    score_t = idf * (
        (F.col("tf") * (k1 + 1))
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.lit(avgdl)))
    )
    scored = (
        td.join(F.broadcast(df_t), "term")
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(score_t), 6).alias("bm25"),
            F.count("*").cast("long").alias("n_terms_hit"),
        )
    )
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id").asc()).limit(20)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w).cast("int"))
        .select("rank", "doc_id", "bm25", "n_terms_hit")
    )


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities over the link graph (operators/graph.hits) —
    the discovery-side complement to q_pagerank: authority ranks fetch
    targets, hub ranks which listing pages a discovery crawl re-scans
    first. Same deterministic edge synthesis as q_pagerank so the oracle
    rebuilds the graph; 4 fixed rounds, max-normalized (order-independent
    scalar — see the operator docstring for why not L2).

    Scale: per half-round one endpoint-keyed join + one groupBy-sum —
    Pregel shape, lineage cut per round; the only collects are the 1-row
    per-half-round maxima."""
    from .operators.graph import hits

    d = _t(spark, sf_dir, "documents")
    n = d.count()
    nodes = d.select(F.col("doc_id").alias("node_id"))
    k = F.explode(F.array([F.lit(i) for i in (1, 2, 3, 4)])).alias("k")
    edges = (
        d.select(F.col("doc_id").alias("src"), k)
        .select("src", ((F.col("src") * 31 + F.col("k") * 17) % n).alias("dst"))
        .filter(F.col("dst") != F.col("src"))
    )
    out = hits(nodes, edges, n_iter=4)
    return out.select(
        F.col("node_id").alias("doc_id"),
        F.round("hub", 8).alias("hub"),
        F.round("authority", 8).alias("authority"),
    )


# =====================================================================
# Registry
# =====================================================================

QUERIES = {
    "frontier_schedule": q_frontier_schedule,
    "ranked_microbatch": q_ranked_microbatch,
    "anti_join_seen": q_anti_join_seen,
    "top1_per_key": q_top1_per_key,
    "left_join_coalesce": q_left_join_coalesce,
    "reconcile_full_outer": q_reconcile_full_outer,
    "set_intersection": q_set_intersection,
    "group_stats": q_group_stats,
    "validators": q_validators,
    "retry_policy": q_retry_policy,
    "storage_gate": q_storage_gate,
    "recent_window_dedup": q_recent_window_dedup,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_clusters": q_dedup_clusters,
    "sample_stratified": q_sample_stratified,
    "token_heavy_hitters": q_token_heavy_hitters,
    "dim_join_rollup": q_dim_join_rollup,
    "brand_price_quantiles": q_brand_price_quantiles,
    "supplier_balance_by_nation": q_supplier_balance_by_nation,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "simhash": q_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
    "embedding_topk": q_embedding_topk,
    "dedup_embedding_cosine": q_dedup_embedding_cosine,
    "embedding_knn_lsh": q_embedding_knn_lsh,
    "embedding_knn_ivf": q_embedding_knn_ivf,
    "lang_id": q_lang_id,
    "text_stats": q_text_stats,
    "token_counts": q_token_counts,
    "corpus_stats": q_corpus_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "image_decode_stats": q_image_decode_stats,
    "image_features": q_image_features,
    "html_extraction": q_html_extraction,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "rolling_window": q_rolling_window,
    "event_funnel": q_event_funnel,
    "quality_filter": q_quality_filter,
    "pii_scrub": q_pii_scrub,
    "tfidf_topk": q_tfidf_topk,
    "dedup_retention": q_dedup_retention,
    "image_phash_pairs": q_image_phash_pairs,
    "image_dedup_retention": q_image_dedup_retention,
    "image_aspect_buckets": q_image_aspect_buckets,
    "image_quality_gate": q_image_quality_gate,
    "image_shard_pack": q_image_shard_pack,
    "audio_features": q_audio_features,
    "video_frame_sample": q_video_frame_sample,
    "video_scene_cuts": q_video_scene_cuts,
    "video_container_stats": q_video_container_stats,
    "audio_container_stats": q_audio_container_stats,
    "image_container_stats": q_image_container_stats,
    "warc_ingest": q_warc_ingest,
    "decontaminate": q_decontaminate,
    "dataset_split": q_dataset_split,
    "pagerank": q_pagerank,
    "bigram_pmi": q_bigram_pmi,
    "domain_mix": q_domain_mix,
    "embedding_kmeans": q_embedding_kmeans,
    "unigram_logprob": q_unigram_logprob,
    "outlier_mad": q_outlier_mad,
    "repetition_stats": q_repetition_stats,
    "trap_detection": q_trap_detection,
    "range_join": q_range_join,
    "semdedup_prune": q_semdedup_prune,
    "hll_distinct": q_hll_distinct,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "bloom_semi_join": q_bloom_semi_join,
    "quantile_sketch": q_quantile_sketch,
    "weighted_sample": q_weighted_sample,
    "zorder_layout": q_zorder_layout,
    "substring_dedup": q_substring_dedup,
    "anchor_text": q_anchor_text,
    "corpus_overlap": q_corpus_overlap,
    "corpus_drift": q_corpus_drift,
    "bpe_merges": q_bpe_merges,
    "caption_align": q_caption_align,
    "inverted_index": q_inverted_index,
    "bm25_search": q_bm25_search,
    "hits": q_hits,
}

_JACCARD_ORACLE = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_common, sa.sz AS size_a, sb.sz AS size_b,
       round(n_common * 1.0 / (sa.sz + sb.sz - n_common), 4) AS jaccard
FROM common
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.8
"""

#: pii_scrub oracle, with the shared Java∩RE2 patterns spliced in (unique
#: placeholder tokens — .format/f-strings would fight the regex braces).
_PII_SCRUB_ORACLE = (
    """
WITH a AS (
  SELECT doc_id,
         text || CASE CAST(doc_id % 3 AS INT)
                   WHEN 0 THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com now'
                   WHEN 1 THEN ' call 555-0199 or visit 10.0.0.' || CAST(doc_id % 256 AS VARCHAR)
                   ELSE '' END AS aug
  FROM documents
), s AS (
  SELECT doc_id, aug,
         regexp_replace(regexp_replace(regexp_replace(aug,
           '<<EMAIL>>', '<EMAIL>', 'g'),
           '<<IP>>', '<IP>', 'g'),
           '<<PHONE>>', '<PHONE>', 'g') AS scrubbed
  FROM a
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '<<EMAIL>>')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(aug, '<<IP>>')) AS INT) AS n_ips,
       CAST(len(regexp_extract_all(aug, '<<PHONE>>')) AS INT) AS n_phones,
       md5(scrubbed) AS scrubbed_md5,
       CAST(length(scrubbed) AS INT) AS scrubbed_len
FROM s
"""
    .replace("<<EMAIL>>", PII_EMAIL_RE)
    .replace("<<IP>>", PII_IP_RE)
    .replace("<<PHONE>>", PII_PHONE_RE)
)

ORACLES = {
    "frontier_schedule": """
SELECT event_id, user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS host_rank,
       CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 3) AS INT) AS fetch_wave,
       CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 3) AS INT) % 8 AS salt
FROM events
""",
    "ranked_microbatch": """
SELECT event_id, ts, CAST(seq AS INT) AS seq FROM (
  SELECT event_id, ts, row_number() OVER (ORDER BY ts DESC, event_id) AS seq
  FROM events
) WHERE seq <= 100
""",
    "anti_join_seen": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
    "top1_per_key": """
SELECT l_orderkey, l_linenumber, l_extendedprice FROM (
  SELECT l_orderkey, l_linenumber, l_extendedprice,
         row_number() OVER (PARTITION BY l_orderkey
                            ORDER BY l_extendedprice DESC, l_linenumber) AS rn
  FROM lineitem
) WHERE rn = 1
""",
    "left_join_coalesce": """
SELECT o_orderkey, coalesce(c_name, 'unknown') AS cust_name, o_totalprice
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
""",
    "reconcile_full_outer": """
WITH f AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'),
o AS (SELECT DISTINCT o_custkey AS k FROM orders WHERE o_orderstatus = 'O')
SELECT CASE WHEN f.k IS NOT NULL AND o.k IS NOT NULL THEN 'both'
            WHEN f.k IS NOT NULL THEN 'f_only' ELSE 'o_only' END AS category,
       count(*) AS n
FROM f FULL OUTER JOIN o ON f.k = o.k
GROUP BY 1
""",
    "set_intersection": """
SELECT DISTINCT o_custkey AS custkey FROM orders WHERE o_totalprice > 50000
INTERSECT
SELECT DISTINCT c_custkey AS custkey FROM customer WHERE c_acctbal > 0
""",
    "group_stats": """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
       round(avg(value), 4) AS avg_value, max(ts) AS max_ts
FROM events GROUP BY event_type
""",
    "validators": """
SELECT doc_id, length(text) = n_chars AS len_ok, n_chars >= 100 AS min_len_ok,
       lang IN ('en','de','fr','es','zh') AS lang_ok
FROM documents
""",
    "retry_policy": """
WITH e AS (
  SELECT event_id,
         CASE WHEN value < 5 THEN 'network'
              WHEN value < 10 THEN 'rate_limit' ELSE 'temporary' END AS error_class,
         CAST(event_id % 10 AS INT) AS attempts
  FROM events WHERE event_type = 'error'
)
SELECT event_id, error_class, attempts,
       attempts < CASE error_class WHEN 'network' THEN 8 WHEN 'rate_limit' THEN 6
                                   ELSE 4 END AS retry,
       round(least(300.0, CASE error_class WHEN 'network' THEN 5.0
                                           WHEN 'rate_limit' THEN 30.0
                                           ELSE 10.0 END * power(2.0, attempts)), 2)
         AS backoff_s
FROM e
""",
    "storage_gate": """
SELECT count(*) AS n_rows, round(sum(l_quantity), 1) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
""",
    "recent_window_dedup": """
SELECT user_id, event_type, event_id, ts FROM (
  SELECT user_id, event_type, event_id, ts,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
    "dedup_exact": """
SELECT min(doc_id) AS canonical_id, count(*) AS n_dups
FROM documents GROUP BY text
""",
    "dedup_ngram_jaccard": _JACCARD_ORACLE,
    "dedup_minhash_lsh": _JACCARD_ORACLE,
    # transitive closure of the Jaccard pair graph: recursive-CTE
    # reachability (DuckDB) ≡ min-label propagation (Spark)
    "dedup_clusters": """
WITH RECURSIVE toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)
),
sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
common AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT doc_a, doc_b FROM common
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE n_common * 1.0 / (sa.sz + sb.sz - n_common) >= 0.8
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
r(doc_id, label) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.label FROM r JOIN edges e ON e.a = r.doc_id
),
labels AS (SELECT doc_id, min(label) AS canonical_id FROM r GROUP BY doc_id),
csize AS (
  SELECT canonical_id, count(*) AS cluster_size FROM labels GROUP BY canonical_id
)
SELECT l.doc_id, l.canonical_id, c.cluster_size,
       l.doc_id = l.canonical_id AS is_canonical
FROM labels l JOIN csize c ON c.canonical_id = l.canonical_id
""",
    "supplier_balance_by_nation": """
SELECT n.n_name AS nation,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       round(sum(s.s_acctbal), 2) AS total_balance,
       round(avg(s.s_acctbal), 2) AS avg_balance
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    "brand_price_quantiles": """
SELECT p_brand,
       round(quantile_cont(p_retailprice, 0.5), 2) AS p50,
       round(quantile_cont(p_retailprice, 0.9), 2) AS p90,
       CAST(count(*) AS BIGINT) AS n_parts
FROM part
GROUP BY p_brand
""",
    "dim_join_rollup": """
SELECT r.r_name AS region, n.n_name AS nation,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r.r_name, n.n_name
""",
    "token_heavy_hitters": """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
)
SELECT tok, CAST(count(*) AS BIGINT) AS n
FROM toks WHERE tok <> ''
GROUP BY tok
ORDER BY n DESC, tok
LIMIT 20
""",
    "sample_stratified": """
WITH ranked AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
           AS sample_rank,
         count(*) OVER (PARTITION BY lang) AS stratum_n
  FROM documents
)
SELECT doc_id, lang, sample_rank, stratum_n
FROM ranked
WHERE sample_rank <= ceil(stratum_n * 0.2)
""",
    "embedding_topk": """
WITH q AS (SELECT vec_id AS q_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 10),
s AS (
  SELECT q_id, vec_id AS neighbor_id,
         list_cosine_similarity(qe, CAST(embedding AS DOUBLE[])) AS cos
  FROM q, embeddings WHERE vec_id <> q_id
),
r AS (SELECT q_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor_id) AS rk
      FROM s)
SELECT q_id, neighbor_id, CAST(rk AS INT) AS rank, round(cos, 5) AS cos
FROM r WHERE rk <= 5
""",
    "text_stats": """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(len(list_filter(toks, x -> x = 'a' OR x = 'the')) AS INT) AS n_stopwords,
       round(len(list_filter(toks, x -> x = 'a' OR x = 'the')) * 1.0 / len(toks), 4)
         AS stopword_ratio,
       len(toks) >= 20 AND len(toks) <= 1000
         AND len(list_filter(toks, x -> x = 'a' OR x = 'the')) * 1.0 / len(toks) < 0.5
         AS quality_ok
FROM t
""",
    "corpus_stats": """
SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       count(DISTINCT source) AS n_sources
FROM documents GROUP BY lang
""",
    "lang_id": """
WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id, lang,
         CAST(len(list_filter(toks, x -> x = 'the' OR x = 'a')) AS INT) AS n_en,
         CAST(len(list_filter(toks, x -> x = 'der' OR x = 'und')) AS INT) AS n_de,
         CAST(len(list_filter(toks, x -> x = 'le' OR x = 'et')) AS INT) AS n_fr,
         CAST(len(list_filter(toks, x -> x = 'el' OR x = 'y')) AS INT) AS n_es
  FROM t
)
SELECT doc_id, n_en, n_de, n_fr, n_es,
       CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
            WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
            WHEN n_fr >= n_es THEN 'fr' ELSE 'es' END AS pred_lang,
       (CASE WHEN n_en >= n_de AND n_en >= n_fr AND n_en >= n_es THEN 'en'
             WHEN n_de >= n_fr AND n_de >= n_es THEN 'de'
             WHEN n_fr >= n_es THEN 'fr' ELSE 'es' END) = lang AS label_match
FROM c
""",
    "dedup_embedding_cosine": """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.v, b.v), 5) AS cos
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE round(list_cosine_similarity(a.v, b.v), 5) >= 0.45
""",
    "token_counts": """
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS INT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'
       )) AS INT) AS n_bpe_tokens,
       round(len(regexp_extract_all(text,
         '''(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'
       )) * 1.0 / len(string_split(text, ' ')), 4) AS bpe_per_ws
FROM documents
""",
    "doc_fingerprint": """
SELECT doc_id, md5(text) AS fingerprint,
       md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_fingerprint
FROM documents
""",
    "simhash": _simhash_oracle_sql(),
    "dedup_simhash_pairs": _simhash_pairs_oracle_sql(),
    "embedding_knn_lsh": _lsh_oracle_sql(),
    "embedding_knn_ivf": _ivf_oracle_sql(),
    "sessionize": """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT)
           AS session_id
  FROM g
)
SELECT user_id, session_id, CAST(count(*) AS INT) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY user_id, session_id
""",
    "asof_join": """
SELECT p.event_id, p.user_id, p.ts,
       coalesce(c.event_id, -1) AS click_id,
       coalesce(c.ts, TIMESTAMP '1970-01-01') AS click_ts
FROM (SELECT * FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    "rolling_window": """
SELECT event_id, user_id, ts,
       CAST(count(*) OVER w AS INT) AS n_events_1h,
       round(sum(value) OVER w, 4) AS sum_value_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
""",
    "event_funnel": """
WITH agg AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS first_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase
  FROM events GROUP BY user_id
)
SELECT user_id, first_view, first_click, first_purchase,
       first_view IS NOT NULL AS stage_view,
       coalesce(first_view IS NOT NULL AND first_click > first_view, FALSE)
         AS stage_click,
       coalesce(first_view IS NOT NULL AND first_click > first_view
                AND first_purchase > first_click, FALSE) AS stage_purchase
FROM agg
""",
    "quality_filter": """
WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
c AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         (length(text) - len(toks) + 1) * 1.0 / len(toks) AS mean_wlen,
         len(list_distinct(toks)) * 1.0 / len(toks) AS distinct_ratio,
         len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+'))) * 1.0 / len(toks)
           AS alpha_ratio,
         CAST(list_contains(toks, 'the') AS INT) + CAST(list_contains(toks, 'a') AS INT)
           + CAST(list_contains(toks, 'and') AS INT) + CAST(list_contains(toks, 'of') AS INT)
           + CAST(list_contains(toks, 'to') AS INT) AS n_stop
  FROM t
)
SELECT doc_id, n_tokens,
       round(mean_wlen, 4) AS mean_word_len,
       round(distinct_ratio, 4) AS distinct_ratio,
       round(alpha_ratio, 4) AS alpha_ratio,
       n_stop AS n_stopwords_present,
       n_tokens >= 20 AND n_tokens <= 100000 AS len_ok,
       mean_wlen >= 3.0 AND mean_wlen <= 10.0 AS wlen_ok,
       distinct_ratio >= 0.2 AS rep_ok,
       alpha_ratio >= 0.8 AS alpha_ok,
       n_stop >= 1 AS stop_ok,
       n_tokens >= 20 AND n_tokens <= 100000
         AND mean_wlen >= 3.0 AND mean_wlen <= 10.0
         AND distinct_ratio >= 0.2 AND alpha_ratio >= 0.8 AND n_stop >= 1 AS keep
FROM c
""",
    "pii_scrub": _PII_SCRUB_ORACLE,
    "tfidf_topk": """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), t2 AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
tf AS (SELECT doc_id, tok, count(*) AS tf FROM t2 GROUP BY doc_id, tok),
dft AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, dft.df,
         tf.tf * ln(n.n_docs * 1.0 / dft.df) AS tfidf
  FROM tf JOIN dft USING (tok) CROSS JOIN n
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, tok) AS rank
  FROM scored
)
SELECT doc_id, tok, CAST(tf AS INT) AS tf, CAST(df AS INT) AS df,
       round(tfidf, 4) AS tfidf, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 3
""",
}

# retention rides the clusters oracle verbatim (nested CTE) so the two can
# never drift apart
ORACLES["dedup_retention"] = f"""
WITH lens AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents),
c AS ({ORACLES["dedup_clusters"]})
SELECT c.doc_id, c.canonical_id, CAST(l.n_tokens AS INT) AS n_tokens,
       row_number() OVER (PARTITION BY c.canonical_id
                          ORDER BY l.n_tokens DESC, c.doc_id) = 1 AS keep
FROM c JOIN lens l ON l.doc_id = c.doc_id
"""


ORACLES["decontaminate"] = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
  FROM toks, UNNEST(range(1, greatest(len(w)-1, 1))) AS t(i)
),
bench AS (SELECT * FROM sh WHERE doc_id % 20 = 7),
train AS (SELECT * FROM sh WHERE doc_id % 20 <> 7),
bsizes AS (SELECT doc_id AS bench_id, count(*) AS bench_sz FROM bench GROUP BY 1),
common AS (
  SELECT t.doc_id AS doc_id, b.doc_id AS bench_id, count(*) AS n_overlap
  FROM train t JOIN bench b ON t.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT doc_id, bench_id, n_overlap, bench_sz,
       round(n_overlap * 1.0 / bench_sz, 4) AS containment
FROM common JOIN bsizes USING (bench_id)
WHERE n_overlap * 1.0 / bench_sz >= 0.5
"""

ORACLES["dataset_split"] = """
SELECT doc_id, lang,
       CASE WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'cccccccc'
              THEN 'train'
            WHEN substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 8) < 'e6666666'
              THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def _pagerank_oracle(n_iter: int = 8) -> str:
    """Unrolled-CTE power method replaying q_pagerank exactly: same
    synthetic edge formula, same arithmetic shape per round ((1.0-0.85)/n
    teleport + 0.85·Σ pr/deg), one CTE per iteration."""
    parts = [
        """
WITH nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src, (d.doc_id * 31 + k.k * 17) % nn.n AS dst
  FROM documents d CROSS JOIN nn CROSS JOIN UNNEST([1, 2, 3, 4]) AS k(k)
  WHERE (d.doc_id * 31 + k.k * 17) % nn.n <> d.doc_id
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
pr0 AS (SELECT doc_id, 1.0 / nn.n AS pr FROM nodes CROSS JOIN nn)"""
    ]
    for i in range(1, n_iter + 1):
        parts.append(
            f""",
pr{i} AS (
  SELECT nd.doc_id,
         (1.0 - 0.85) / nn.n + 0.85 * COALESCE(c.contrib, 0.0) AS pr
  FROM nodes nd CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS doc_id, SUM(p.pr / dg.deg) AS contrib
    FROM edges e
    JOIN pr{i - 1} p ON p.doc_id = e.src
    JOIN deg dg ON dg.src = e.src
    GROUP BY e.dst
  ) c ON c.doc_id = nd.doc_id
)"""
        )
    parts.append(f"\nSELECT doc_id, round(pr, 8) AS pagerank FROM pr{n_iter}")
    return "".join(parts)


ORACLES["pagerank"] = _pagerank_oracle()

ORACLES["bigram_pmi"] = """
WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
uni AS (SELECT unnest(w) AS word FROM toks),
ucnt AS (SELECT word, count(*) AS c FROM uni GROUP BY word),
tot AS (SELECT count(*) AS t FROM uni),
big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM toks, UNNEST(range(1, len(w))) AS r(i)
),
btot AS (SELECT count(*) AS b FROM big),
bcnt AS (
  SELECT w1, w2, count(*) AS pair_n FROM big GROUP BY w1, w2
  HAVING count(*) >= 5
),
scored AS (
  SELECT w1, w2, pair_n, u1.c AS w1_n, u2.c AS w2_n,
         round(ln((pair_n * 1.0 / btot.b) /
                  ((u1.c * 1.0 / tot.t) * (u2.c * 1.0 / tot.t))), 6) AS pmi
  FROM bcnt
  JOIN ucnt u1 ON u1.word = bcnt.w1
  JOIN ucnt u2 ON u2.word = bcnt.w2
  CROSS JOIN btot CROSS JOIN tot
)
SELECT w1, w2, pair_n, w1_n, w2_n, pmi, seq FROM (
  SELECT *, CAST(row_number() OVER (ORDER BY pmi DESC, w1, w2) AS INT) AS seq
  FROM scored
) WHERE seq <= 20
"""

ORACLES["domain_mix"] = """
WITH counts AS (
  SELECT source, count(*) AS n_src,
         CAST(substr(source, 4) AS BIGINT) + 1 AS w
  FROM documents GROUP BY source
),
stats AS (SELECT SUM(w) AS sum_w, SUM(n_src) AS n_total FROM counts),
rates AS (
  SELECT source,
         least(1.0, CAST(w * CAST(floor(n_total / 2) AS BIGINT) AS DOUBLE)
                    / CAST(sum_w * n_src AS DOUBLE)) AS rate
  FROM counts CROSS JOIN stats
)
SELECT d.doc_id, d.source, round(r.rate, 6) AS keep_rate
FROM documents d JOIN rates r ON r.source = d.source
WHERE CAST('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
      < CAST(floor(r.rate * 4294967296.0) AS BIGINT)
"""


def _kmeans_oracle(k: int = 8, iters: int = 3) -> str:
    """Unrolled Lloyd's replaying q_embedding_kmeans: per round one
    assign CTE (round(score,6) argmin, cluster tiebreak) and one update
    CTE (per-dim avg rounded to 6 dp, re-listed in dim order)."""

    def assign(j: int, src: str) -> str:
        return f"""
a{j} AS (
  SELECT vec_id, e, cluster FROM (
    SELECT m.vec_id, m.e, c.cluster,
           row_number() OVER (
             PARTITION BY m.vec_id
             ORDER BY round(-2.0 * list_dot_product(m.e, c.c)
                            + list_dot_product(c.c, c.c), 6), c.cluster
           ) AS rn
    FROM emb m CROSS JOIN {src} c
  ) WHERE rn = 1
)"""

    parts = [
        f"""
WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
c0 AS (SELECT CAST(vec_id AS INT) AS cluster, e AS c FROM emb WHERE vec_id < {k}),"""
    ]
    for j in range(iters):
        parts.append(assign(j, f"c{j}") + ",")
        parts.append(
            f"""
c{j + 1} AS (
  SELECT cluster, list(m ORDER BY pos) AS c FROM (
    SELECT cluster, pos, round(avg(e[pos]), 6) AS m
    FROM a{j}, UNNEST(range(1, len(e) + 1)) AS r(pos)
    GROUP BY cluster, pos
  ) GROUP BY cluster
),"""
        )
    parts.append(assign(iters, f"c{iters}"))
    parts.append(
        f"""
SELECT a.vec_id, a.cluster, n.cluster_n
FROM a{iters} a
JOIN (SELECT cluster, count(*) AS cluster_n FROM a{iters} GROUP BY cluster) n
  USING (cluster)"""
    )
    return "".join(parts)


ORACLES["embedding_kmeans"] = _kmeans_oracle()

ORACLES["unigram_logprob"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
),
ucnt AS (SELECT word, count(*) AS c FROM tok GROUP BY word),
tot AS (SELECT count(*) AS t FROM tok)
SELECT doc_id, count(*) AS n_tokens,
       round(avg(ln(c * 1.0 / tot.t)), 6) AS lm_score
FROM tok JOIN ucnt USING (word) CROSS JOIN tot
GROUP BY doc_id
"""

ORACLES["repetition_stats"] = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
s AS (
  SELECT doc_id, CAST(len(toks) AS INT) AS n_tokens,
         CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
         list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1]) AS bgs
  FROM t
),
e AS (SELECT doc_id, unnest(bgs) AS bg FROM s),
c AS (SELECT doc_id, bg, count(*) AS cnt FROM e GROUP BY doc_id, bg),
m AS (SELECT doc_id, CAST(max(cnt) AS INT) AS top_bigram_n FROM c GROUP BY doc_id)
SELECT s.doc_id, s.n_tokens, s.n_distinct, m.top_bigram_n,
       round(1.0 - s.n_distinct * 1.0 / s.n_tokens, 4) AS dup_token_frac,
       round(m.top_bigram_n * 1.0 / (s.n_tokens - 1), 4) AS top_bigram_frac,
       (1.0 - s.n_distinct * 1.0 / s.n_tokens) > 0.6
         OR m.top_bigram_n * 1.0 / (s.n_tokens - 1) > 0.1 AS repetitive
FROM s JOIN m USING (doc_id)
"""

ORACLES["trap_detection"] = """
WITH u AS (
  SELECT 'h' || CAST(user_id % 10 AS VARCHAR) AS host,
         '/' || event_type || CASE WHEN event_type IN ('click', 'view')
           THEN '/' || CAST(event_id AS VARCHAR) ELSE '/page' END AS url
  FROM events
)
SELECT host, regexp_replace(url, '[0-9]+', 'N', 'g') AS url_pattern,
       count(DISTINCT url) AS n_urls, count(*) AS n_hits,
       count(DISTINCT url) >= 50 AS trap
FROM u GROUP BY host, regexp_replace(url, '[0-9]+', 'N', 'g')
"""

ORACLES["outlier_mad"] = """
WITH med AS (
  SELECT user_id, quantile_cont(value, 0.5) AS med FROM events GROUP BY user_id
),
dev AS (
  SELECT e.event_id, e.user_id, e.value, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (user_id)
),
mad AS (SELECT user_id, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY user_id)
SELECT d.event_id, d.user_id, d.value, round(d.dev, 6) AS dev,
       round(m.mad, 6) AS mad
FROM dev d JOIN mad m USING (user_id)
WHERE d.dev > 3.0 * m.mad
"""


ORACLES["range_join"] = """
WITH w AS (
  SELECT event_id AS window_id, ts AS start_ts, ts + INTERVAL 37 MINUTES AS end_ts
  FROM events WHERE event_id % 199 = 0
)
SELECT w.window_id, CAST(count(*) AS INT) AS n_events,
       round(sum(e.value), 4) AS sum_value
FROM w JOIN events e ON e.ts >= w.start_ts AND e.ts < w.end_ts
GROUP BY w.window_id
"""


def _semdedup_oracle_sql(
    dim: int = 64, n_cells: int = 8, tau: float = 0.45, seed: int = 7
) -> str:
    """DuckDB replay of q_semdedup_prune: seeded centroids as double
    literals, cell = argmax dot (dot DESC, cell DESC tie-break mirrors
    Spark's array_max), within-cell lower-id prune at round(cos,6) >= tau.
    Must stay in lockstep with operators/similarity.semdedup_prune."""
    from .operators.similarity import ivf_centroids

    cents = ivf_centroids(dim, n_cells, seed)
    score_selects = []
    for i, c in enumerate(cents):
        arr = ", ".join(repr(float(x)) for x in c)
        score_selects.append(
            f"SELECT vec_id, {i} AS cell, list_dot_product(v, [{arr}]) AS dot FROM e"
        )
    scores = "\n  UNION ALL ".join(score_selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
sc AS (
  {scores}
),
ranked AS (
  SELECT vec_id, cell,
         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cell DESC) AS rk
  FROM sc
),
assign AS (SELECT vec_id, CAST(cell AS INT) AS cell FROM ranked WHERE rk = 1),
nrm AS (SELECT vec_id, sqrt(list_dot_product(v, v)) AS n FROM e),
pruned AS (
  SELECT DISTINCT a.vec_id
  FROM assign a
  JOIN assign b ON a.cell = b.cell AND b.vec_id < a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
  JOIN nrm na ON na.vec_id = a.vec_id
  JOIN nrm nb ON nb.vec_id = b.vec_id
  WHERE round(list_dot_product(ea.v, eb.v) / (na.n * nb.n), 6) >= {tau}
)
SELECT a.vec_id, a.cell, (p.vec_id IS NULL) AS kept
FROM assign a LEFT JOIN pruned p ON a.vec_id = p.vec_id
"""


ORACLES["semdedup_prune"] = _semdedup_oracle_sql()


def _hll_oracle_sql() -> str:
    """DuckDB replay of q_hll_distinct, generated from the same constants
    (m=16, rho cap 40, nibble→binary lookup) so the register contents, the
    integer harmonic denominator, and both correction branches match
    bit-for-bit."""

    def nib(p: int) -> str:
        s = f"substr(hx, {p}, 1)"
        return f"(CASE WHEN {s} >= 'a' THEN ascii({s}) - 87 ELSE ascii({s}) - 48 END)"

    bits = " || ".join(
        f"substr('{_NIB_BIN}', {nib(j + 1)} * 4 + 1, 4)" for j in range(1, 16)
    )
    return f"""
WITH hx AS (
  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS hx FROM events
),
nb AS (
  SELECT event_type, {nib(1)} AS bucket, ({bits}) AS bits FROM hx
),
rb AS (
  SELECT event_type, bucket,
         least(CASE WHEN strpos(bits, '1') = 0 THEN 61 ELSE strpos(bits, '1') END,
               {_HLL_RHO_CAP}) AS rho
  FROM nb
),
reg AS (
  SELECT event_type, bucket, max(rho) AS m_reg FROM rb GROUP BY event_type, bucket
),
grid AS (
  SELECT t.event_type, g.bucket
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (SELECT CAST(range AS INT) AS bucket FROM range({_HLL_M})) g
),
filled AS (
  SELECT grid.event_type, grid.bucket, coalesce(reg.m_reg, 0) AS m_reg
  FROM grid LEFT JOIN reg
    ON grid.event_type = reg.event_type AND grid.bucket = reg.bucket
),
est AS (
  SELECT event_type,
         {_HLL_NUM} / sum((1::BIGINT) << ({_HLL_RHO_CAP} - m_reg)) AS raw,
         sum(CASE WHEN m_reg = 0 THEN 1 ELSE 0 END) AS v_zero
  FROM filled GROUP BY event_type
),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS INT) AS n_exact
  FROM events GROUP BY event_type
),
c AS (
  SELECT est.event_type, ex.n_exact,
         round(CASE WHEN raw <= {2.5 * _HLL_M} AND v_zero > 0
                    THEN {float(_HLL_M)} * ln({float(_HLL_M)} / v_zero)
                    ELSE raw END, 4) AS hll_est
  FROM est JOIN ex ON est.event_type = ex.event_type
)
SELECT event_type, n_exact, hll_est,
       round((hll_est - n_exact) / n_exact, 4) AS rel_err
FROM c
"""


ORACLES["hll_distinct"] = _hll_oracle_sql()


def _cms_oracle_sql() -> str:
    """DuckDB replay of q_cms_heavy_hitters, generated from the same
    (d, w) constants and salt strings so every counter and every min-over-
    rows estimate matches bit-for-bit (pure integer arithmetic)."""

    def bucket(j: int, col: str = "tok") -> str:
        return f"CAST('0x' || substr(md5('cms{j}:' || {col}), 1, 8) AS BIGINT) % {_CMS_W}"

    tb_cols = ",\n         ".join(f"{bucket(j)} AS b{j}" for j in range(_CMS_D))
    sketch = "\n  UNION ALL ".join(
        f"SELECT {j} AS row_j, b{j} AS bucket, CAST(count(*) AS BIGINT) AS c "
        f"FROM tb GROUP BY b{j}"
        for j in range(_CMS_D)
    )
    lookups = "\n  UNION ALL ".join(
        f"SELECT tok, n_exact, {j} AS row_j, {bucket(j)} AS bucket FROM exact"
        for j in range(_CMS_D)
    )
    return f"""
WITH toks AS (
  SELECT tok FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  WHERE tok <> ''
),
tb AS (
  SELECT tok,
         {tb_cols}
  FROM toks
),
sketch AS (
  {sketch}
),
exact AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n_exact FROM toks
  GROUP BY tok ORDER BY n_exact DESC, tok LIMIT 10
),
lk AS (
  {lookups}
),
est AS (
  SELECT lk.tok, lk.n_exact, min(sketch.c) AS cms_est
  FROM lk JOIN sketch ON lk.row_j = sketch.row_j AND lk.bucket = sketch.bucket
  GROUP BY lk.tok, lk.n_exact
)
SELECT tok, n_exact, cms_est, cms_est - n_exact AS overest FROM est
"""


ORACLES["cms_heavy_hitters"] = _cms_oracle_sql()


ORACLES["bloom_semi_join"] = """
SELECT l.l_returnflag, o.o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_items,
       round(sum(l.l_extendedprice * (1.0 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderpriority = '1-URGENT'
GROUP BY l.l_returnflag, o.o_orderstatus
"""


# Bit-for-bit replay of q_quantile_sketch: the same integer bucketization
# (bit length via bin(), variable >>), the same floor(q·(n−1)) rank, the
# same (sub+16.5)·2^(e−4) midpoint reconstruction. row_number replays the
# type-1 exact quantile the Spark twin computes.
ORACLES["quantile_sketch"] = """
WITH v AS (
  SELECT l_returnflag, CAST(l_extendedprice * 100 AS BIGINT) AS cents
  FROM lineitem
),
b AS (
  SELECT l_returnflag,
         (length(bin(cents)) - 1) * 16 + (cents >> (length(bin(cents)) - 1 - 4)) - 16
           AS bucket_id
  FROM v
),
sk AS (
  SELECT l_returnflag, bucket_id, count(*) AS c FROM b GROUP BY 1, 2
),
cm AS (
  SELECT l_returnflag, bucket_id,
         sum(c) OVER (PARTITION BY l_returnflag ORDER BY bucket_id) AS cum
  FROM sk
),
n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n FROM v GROUP BY 1),
qs AS (SELECT * FROM (VALUES ('p50', 0.5), ('p95', 0.95), ('p99', 0.99)) t(q_name, q)),
rk AS (
  SELECT l_returnflag, q_name, n, CAST(floor(q * (n - 1)) AS BIGINT) AS rk
  FROM n CROSS JOIN qs
),
hit AS (
  SELECT r.l_returnflag, r.q_name, r.n, r.rk, min(c.bucket_id) AS bucket_id
  FROM rk r JOIN cm c ON r.l_returnflag = c.l_returnflag AND c.cum > r.rk
  GROUP BY 1, 2, 3, 4
),
rnk AS (
  SELECT l_returnflag, cents,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY cents) AS rn
  FROM v
),
ex AS (
  SELECT r.l_returnflag, r.q_name, k.cents AS exact_cents
  FROM rk r JOIN rnk k ON r.l_returnflag = k.l_returnflag AND k.rn = r.rk + 1
),
est AS (
  SELECT h.l_returnflag, h.q_name, h.n, e.exact_cents,
         (h.bucket_id % 16 + 16.5) * power(2.0, (h.bucket_id // 16) - 4) AS raw
  FROM hit h JOIN ex e ON h.l_returnflag = e.l_returnflag AND h.q_name = e.q_name
)
SELECT l_returnflag, q_name, n, exact_cents,
       round(raw, 4) AS est_cents,
       round((raw - exact_cents) / exact_cents, 6) AS rel_err
FROM est
"""


# Replay of q_weighted_sample: same salted-md5 uniform, same u^(1/w) key,
# same top-25 cut (keys continuous → tie-free), same 9-dp rounding.
ORACLES["weighted_sample"] = """
WITH keyed AS (
  SELECT doc_id,
         CAST(length(text) AS DOUBLE) AS w,
         power(
           (CAST('0x' || substr(md5('aes:' || doc_id), 1, 8) AS BIGINT) + 0.5)
             / 4294967296.0,
           1.0 / CAST(length(text) AS DOUBLE)
         ) AS skey
  FROM documents
  WHERE length(text) > 0
)
SELECT doc_id, CAST(w AS BIGINT) AS w, round(skey, 9) AS skey
FROM keyed ORDER BY skey DESC LIMIT 25
"""


def _zorder_oracle_sql() -> str:
    """DuckDB replay of q_zorder_layout: identical range normalization
    (integer // with the same +1 denominator), identical 16-term Morton
    interleave (generated from the same loop), identical ntile cut."""
    terms = " + ".join(
        f"(((a8 >> {i}) & 1) << {2 * i}) + (((b8 >> {i}) & 1) << {2 * i + 1})"
        for i in range(8)
    )
    return f"""
WITH base AS (
  SELECT event_id, user_id AS uid, epoch_us(ts) AS us FROM events
),
rng AS (
  SELECT min(uid) AS umin, max(uid) AS umax, min(us) AS smin, max(us) AS smax
  FROM base
),
nrm AS (
  SELECT event_id,
         (uid - umin) * 256 // (umax - umin + 1) AS a8,
         (us - smin) * 256 // (smax - smin + 1) AS b8
  FROM base CROSS JOIN rng
),
keyed AS (
  SELECT event_id, a8, b8, {terms} AS zkey FROM nrm
),
cut AS (
  SELECT a8, b8, ntile(16) OVER (ORDER BY zkey, event_id) AS file_id FROM keyed
)
SELECT file_id, CAST(count(*) AS BIGINT) AS n_rows,
       min(a8) AS min_user_bucket, max(a8) AS max_user_bucket,
       min(b8) AS min_time_bucket, max(b8) AS max_time_bucket
FROM cut GROUP BY file_id
"""


ORACLES["zorder_layout"] = _zorder_oracle_sql()


# Replay of q_substring_dedup: same 13-token windows (DuckDB list slicing
# t[i:i+12] is the inclusive twin of slice(t, i+1, 13)), same per-doc
# DISTINCT gram set, same a<b pair count and ≥5 threshold. Joins on the
# raw gram text — md5 on the Spark side is only key compression.
ORACLES["substring_dedup"] = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+12], ' ') AS g
  FROM toks, unnest(range(1, len(t) - 11)) AS r(i)
  WHERE len(t) >= 13
),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared FROM pairs WHERE n_shared >= 5
"""


# Replay of q_anchor_text: identical edge synthesis to the pagerank
# oracle, anchor = k-th source token (1-based list index ≡ Spark's
# 0-based F.get(w, k-1)); same two dst-keyed aggregations + top-1.
ORACLES["anchor_text"] = """
WITH nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src,
         (d.doc_id * 31 + k.k * 17) % nn.n AS dst,
         string_split(d.text, ' ')[k.k] AS anchor
  FROM documents d CROSS JOIN nn CROSS JOIN UNNEST([1, 2, 3, 4]) AS k(k)
  WHERE (d.doc_id * 31 + k.k * 17) % nn.n <> d.doc_id
),
tot AS (
  SELECT dst, CAST(count(*) AS BIGINT) AS inlinks,
         CAST(count(DISTINCT src) AS BIGINT) AS distinct_src
  FROM edges GROUP BY dst
),
pa AS (SELECT dst, anchor, CAST(count(*) AS BIGINT) AS cnt FROM edges GROUP BY dst, anchor),
top AS (
  SELECT dst, anchor, cnt,
         row_number() OVER (PARTITION BY dst ORDER BY cnt DESC, anchor ASC) AS rn
  FROM pa
)
SELECT tot.dst AS dst, tot.inlinks, tot.distinct_src,
       top.anchor AS top_anchor, top.cnt AS top_anchor_n
FROM tot JOIN top ON tot.dst = top.dst AND top.rn = 1
"""


# Replay of q_corpus_overlap: overlapping doc_id mod-3 corpora
# (A = {0,1}, B = {1,2}), exact flags via groupBy-max over distinct
# texts, per-corpus bottom-128 by md5 order, merged bottom-128 of the
# sketch union; denominator = |merged| (min(k, union)).
ORACLES["corpus_overlap"] = """
WITH base AS (
  SELECT md5(text) AS h,
         CASE WHEN doc_id % 3 <= 1 THEN 1 ELSE 0 END AS a,
         CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END AS b
  FROM documents
),
flags AS (
  SELECT h, max(a) AS in_a, max(b) AS in_b FROM base GROUP BY h
),
exact AS (
  SELECT CAST(sum(in_a * in_b) AS BIGINT) AS inter,
         CAST(count(*) AS BIGINT) AS uni,
         CAST(sum(in_a) AS BIGINT) AS n_a,
         CAST(sum(in_b) AS BIGINT) AS n_b
  FROM flags
),
ska AS (SELECT h, 0 AS c FROM flags WHERE in_a = 1 ORDER BY h LIMIT 128),
skb AS (SELECT h, 1 AS c FROM flags WHERE in_b = 1 ORDER BY h LIMIT 128),
skf AS (
  SELECT h,
         max(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS sk_a,
         max(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS sk_b
  FROM (SELECT * FROM ska UNION ALL SELECT * FROM skb) GROUP BY h
),
est AS (
  SELECT CAST(sum(sk_a * sk_b) AS BIGINT) AS both_k,
         CAST(count(*) AS BIGINT) AS mk
  FROM (
    SELECT *, row_number() OVER (ORDER BY h) AS mrk FROM skf
  ) WHERE mrk <= 128
)
SELECT CAST(128 AS INT) AS k, exact.n_a, exact.n_b,
       round(exact.inter * 1.0 / exact.uni, 6) AS exact_jaccard,
       round(est.both_k * 1.0 / est.mk, 6) AS est_jaccard
FROM exact CROSS JOIN est
"""


# Replay of q_corpus_drift: same clamp-12 buckets over parity halves,
# generated 1..12 spine, Laplace (+1/+12); every float is one expression
# over integer counts, so the doubles match bit-for-bit before round().
ORACLES["corpus_drift"] = """
WITH tok AS (
  SELECT CAST(doc_id % 2 AS INT) AS c,
         least(length(t.t), 12) AS bucket
  FROM documents, UNNEST(string_split(text, ' ')) AS t(t)
),
cnt AS (
  SELECT bucket,
         CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM tok GROUP BY bucket
),
spine AS (SELECT CAST(range AS INT) AS bucket FROM range(1, 13)),
filled AS (
  SELECT spine.bucket,
         coalesce(cnt.cnt_a, 0) AS cnt_a,
         coalesce(cnt.cnt_b, 0) AS cnt_b
  FROM spine LEFT JOIN cnt ON spine.bucket = cnt.bucket
),
tot AS (SELECT sum(cnt_a) AS ta, sum(cnt_b) AS tb FROM filled)
SELECT bucket, cnt_a, cnt_b,
       round((cnt_a + 1) * 1.0 / (ta + 12), 8) AS p_a,
       round((cnt_b + 1) * 1.0 / (tb + 12), 8) AS p_b,
       round(((cnt_a + 1) * 1.0 / (ta + 12)) *
             ln(((cnt_a + 1) * 1.0 / (ta + 12)) /
                ((cnt_b + 1) * 1.0 / (tb + 12))), 8) AS kl_term
FROM filled CROSS JOIN tot
"""


def _bpe_oracle_sql(rounds: int = 3) -> str:
    """Unrolled replay of q_bpe_merges: per round, pair counts from the
    adjacent zip over the double-space corpus, scalar argmax CTE
    (ORDER BY cnt DESC, w1, w2 LIMIT 1), then the same literal
    replace(' x  y ' → ' x_y ') — left-to-right non-overlapping in both
    engines — and a token recount of the merged corpus."""
    parts = [
        "WITH c0 AS (SELECT doc_id, ' ' || replace(text, ' ', '  ') || ' ' AS s"
        " FROM documents)"
    ]
    for r in range(1, rounds + 1):
        p = r - 1
        parts.append(
            f""",
t{r} AS (SELECT string_split(trim(s), '  ') AS w FROM c{p}),
p{r} AS (
  SELECT w[i] AS w1, w[i + 1] AS w2, CAST(count(*) AS BIGINT) AS cnt
  FROM t{r}, UNNEST(range(1, len(w))) AS r(i)
  GROUP BY 1, 2
),
b{r} AS (SELECT w1, w2, cnt FROM p{r} ORDER BY cnt DESC, w1, w2 LIMIT 1),
c{r} AS (
  SELECT doc_id,
         replace(s, ' ' || b{r}.w1 || '  ' || b{r}.w2 || ' ',
                    ' ' || b{r}.w1 || '_' || b{r}.w2 || ' ') AS s
  FROM c{p} CROSS JOIN b{r}
),
a{r} AS (SELECT CAST(sum(len(string_split(trim(s), '  '))) AS BIGINT) AS n FROM c{r})"""
        )
    selects = [
        f"SELECT CAST({r} AS INT) AS round, w1 AS left_tok, w2 AS right_tok,"
        f" cnt AS pair_n, (SELECT n FROM a{r}) AS tokens_after FROM b{r}"
        for r in range(1, rounds + 1)
    ]
    return "".join(parts) + "\n" + "\nUNION ALL\n".join(selects)


ORACLES["bpe_merges"] = _bpe_oracle_sql()


# Replay of q_caption_align: same md5-nibble signed bits (MSB-first),
# same (doc_id, j) elementwise join against the unnested embedding;
# integer text vectors, one rounded cosine at the end (the three sums
# are 64-term float folds — round(6) sits far above their ~1e-15
# order noise).
ORACLES["caption_align"] = """
WITH toks AS (
  SELECT doc_id, md5(t) AS hx
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')[1:8]) AS t FROM documents) u
),
sb AS (
  SELECT doc_id, CAST(r.j AS INT) AS j,
         CASE WHEN ((CASE WHEN substr(hx, CAST(r.j // 4 AS INT) + 1, 1) >= 'a'
                          THEN ascii(substr(hx, CAST(r.j // 4 AS INT) + 1, 1)) - 87
                          ELSE ascii(substr(hx, CAST(r.j // 4 AS INT) + 1, 1)) - 48
                     END) >> (3 - (r.j % 4))) & 1 = 1
              THEN 1 ELSE -1 END AS sgn
  FROM toks, UNNEST(range(0, 64)) AS r(j)
),
tv AS (
  SELECT doc_id, j, CAST(sum(sgn) AS BIGINT) AS tv FROM sb GROUP BY doc_id, j
),
ev AS (
  SELECT vec_id AS doc_id, CAST(r.j AS INT) AS j,
         CAST(embedding[CAST(r.j AS INT) + 1] AS DOUBLE) AS ev
  FROM embeddings, UNNEST(range(0, 64)) AS r(j)
),
dots AS (
  SELECT tv.doc_id,
         sum(tv.tv * ev.ev) AS dot,
         sum(tv.tv * tv.tv) AS t2,
         sum(ev.ev * ev.ev) AS e2
  FROM tv JOIN ev ON tv.doc_id = ev.doc_id AND tv.j = ev.j
  GROUP BY tv.doc_id
)
SELECT doc_id, round(dot / sqrt(t2 * e2), 6) AS align_score FROM dots
"""


# Replay of q_inverted_index: same (term, doc) pre-aggregation, postings
# = first 8 distinct doc_ids ascending, comma-joined.
ORACLES["inverted_index"] = """
WITH td AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents) u
  GROUP BY term, doc_id
)
SELECT term,
       CAST(count(*) AS BIGINT) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       array_to_string(
         list_transform(list_sort(list(doc_id))[1:8], x -> CAST(x AS VARCHAR)),
         ','
       ) AS postings_head
FROM td GROUP BY term
"""


# Replay of q_bm25_search: identical constants and expression shape —
# every float input is an exact integer (tf, df, N, doc lengths; avgdl =
# integer sum / count), so the doubles match bit-for-bit; the per-doc
# score sum folds <= 3 terms (round(6) far above its order noise).
ORACLES["bm25_search"] = f"""
WITH lens AS (
  SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         (SELECT sum(dl) * 1.0 / count(*) FROM lens) AS avgdl
  FROM documents
),
td AS (
  SELECT term, doc_id, count(*) AS tf
  FROM (SELECT doc_id, UNNEST(string_split(text, ' ')) AS term FROM documents) u
  WHERE term IN ({", ".join(repr(t) for t in _BM25_TERMS)})
  GROUP BY term, doc_id
),
df_t AS (SELECT term, count(*) AS df FROM td GROUP BY term),
scored AS (
  SELECT td.doc_id,
         sum(
           ln(1.0 + (stats.n - df_t.df + 0.5) / (df_t.df + 0.5))
           * ((td.tf * ({_BM25_K1} + 1))
              / (td.tf + {_BM25_K1} * (1 - {_BM25_B}
                 + {_BM25_B} * lens.dl / stats.avgdl)))
         ) AS s,
         CAST(count(*) AS BIGINT) AS n_terms_hit
  FROM td
  JOIN df_t ON td.term = df_t.term
  JOIN lens ON td.doc_id = lens.doc_id
  CROSS JOIN stats
  GROUP BY td.doc_id
)
SELECT rank, doc_id, bm25, n_terms_hit FROM (
  SELECT CAST(row_number() OVER (ORDER BY round(s, 6) DESC, doc_id ASC) AS INT)
           AS rank,
         doc_id, round(s, 6) AS bm25, n_terms_hit
  FROM scored
) WHERE rank <= 20
"""


def _hits_oracle(n_iter: int = 4) -> str:
    """Unrolled replay of q_hits: same edge synthesis as the pagerank
    oracle, per round an authority half (join on src, sum hubs, divide by
    the scalar max) then a hub half (join on dst, sum authorities, divide
    by max) — max normalization keeps every divisor order-independent."""
    head = """
WITH nodes AS (SELECT doc_id FROM documents),
nn AS (SELECT count(*) AS n FROM documents),
edges AS (
  SELECT d.doc_id AS src, (d.doc_id * 31 + k.k * 17) % nn.n AS dst
  FROM documents d CROSS JOIN nn CROSS JOIN UNNEST([1, 2, 3, 4]) AS k(k)
  WHERE (d.doc_id * 31 + k.k * 17) % nn.n <> d.doc_id
),
h0 AS (SELECT doc_id AS node, 1.0 AS hub FROM documents)"""
    parts = [head]
    for r in range(1, n_iter + 1):
        p = r - 1
        parts.append(
            f""",
ar{r} AS (
  SELECT e.dst AS node, sum(h{p}.hub) AS raw
  FROM edges e JOIN h{p} ON e.src = h{p}.node GROUP BY e.dst
),
a{r} AS (
  SELECT n.doc_id AS node,
         coalesce(ar{r}.raw, 0.0) / (SELECT max(raw) FROM ar{r}) AS auth
  FROM nodes n LEFT JOIN ar{r} ON n.doc_id = ar{r}.node
),
hr{r} AS (
  SELECT e.src AS node, sum(a{r}.auth) AS raw
  FROM edges e JOIN a{r} ON e.dst = a{r}.node GROUP BY e.src
),
h{r} AS (
  SELECT n.doc_id AS node,
         coalesce(hr{r}.raw, 0.0) / (SELECT max(raw) FROM hr{r}) AS hub
  FROM nodes n LEFT JOIN hr{r} ON n.doc_id = hr{r}.node
)"""
        )
    parts.append(
        f"""
SELECT h{n_iter}.node AS doc_id,
       round(h{n_iter}.hub, 8) AS hub,
       round(a{n_iter}.auth, 8) AS authority
FROM h{n_iter} JOIN a{n_iter} ON h{n_iter}.node = a{n_iter}.node"""
    )
    return "".join(parts)


ORACLES["hits"] = _hits_oracle()


def get_oracles() -> dict[str, str]:
    """Full oracle map: the static SQL above plus the deterministic-datagen
    ground-truth oracles (html_extraction / image_decode_stats /
    image_features — VALUES tables computed without Spark; see
    groundtruth.py). Built lazily: the image ground truth encodes/decodes
    the 120-image payload once per process."""
    from . import groundtruth

    return {**ORACLES, **groundtruth.dynamic_oracles()}
