"""Physical-plan regressions: pin the scale claims the query docstrings
make (shuffle counts, broadcast joins, filter pushdown, no driver-side
merges, no Python in JVM-expressible paths). A plan that silently picks up
an extra Exchange or falls off whole-stage codegen is a 100×-scale bug the
value-level gate can't see — these tests fail it at sf0.001.

Assertions are upper bounds where a future optimizer could legally do
better, exact where the shape IS the contract.
"""

from __future__ import annotations

import pytest

from web_scraper_spark import analytics

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = analytics.QUERIES[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


#: single-scan document/text queries: zero shuffles, zero Python — pure
#: whole-stage-codegen column expressions per their docstrings
SCAN_ONLY = [
    "lang_id",
    "text_stats",
    "token_counts",
    "doc_fingerprint",
    "quality_filter",
    "pii_scrub",
    "validators",
    "repetition_stats",
]

#: one-shuffle queries: the docstrings promise a single exchange (window
#: or agg keyed once); a second exchange means the clustering reuse broke
SINGLE_SHUFFLE = [
    "frontier_schedule",
    "top1_per_key",
    "dedup_exact",
    "sample_stratified",
    "event_funnel",
    "sessionize",
    "rolling_window",
    "asof_join",
    "token_heavy_hitters",
]


@pytest.mark.parametrize("name", SCAN_ONLY)
def test_scan_only_queries_have_no_shuffle_and_no_python(spark, name):
    plan = _plan(spark, name)
    assert plan.count("Exchange") == 0, f"{name} picked up a shuffle:\n{plan}"
    assert "EvalPython" not in plan, f"{name} fell into a Python UDF:\n{plan}"


@pytest.mark.parametrize("name", SCAN_ONLY)
def test_scan_only_queries_prune_columns(spark, name):
    # none of these touch `source`; a full-width scan means pruning broke
    plan = _plan(spark, name)
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("source" not in ln for ln in read), (
        f"{name} reads unused columns:\n" + "\n".join(read)
    )


@pytest.mark.parametrize("name", SINGLE_SHUFFLE)
def test_single_shuffle_queries(spark, name):
    plan = _plan(spark, name)
    assert plan.count("Exchange") <= 1, f"{name} shuffles more than once:\n{plan}"
    assert "EvalPython" not in plan


def test_ranked_microbatch_is_take_ordered(spark):
    # top-N must plan as TakeOrderedAndProject (per-partition top-N +
    # bounded merge), never a global sort
    plan = _plan(spark, "ranked_microbatch")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 0
    assert "Sort " not in plan  # a global Sort node would shuffle everything


def test_token_heavy_hitters_two_level_agg(spark):
    # partial agg before the shuffle + TakeOrderedAndProject after: the
    # exact-top-k plan that survives 10^9 distinct tokens
    plan = _plan(spark, "token_heavy_hitters")
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange") == 1
    assert "partial_count" in plan, f"no map-side combine:\n{plan}"


def test_dim_join_rollup_broadcasts_dims_and_pushes_date_filter(spark):
    plan = _plan(spark, "dim_join_rollup")
    assert plan.count("BroadcastHashJoin") >= 4, f"dims not broadcast:\n{plan}"
    assert plan.count("SortMergeJoin") == 0, f"dim join shuffled:\n{plan}"
    assert "GreaterThanOrEqual(o_orderdate" in plan, (
        f"date filter not pushed to the orders scan:\n{plan}"
    )


def test_image_shard_pack_window_is_block_partitioned(spark):
    # the two-level offset plan: the running-sum window must be keyed by
    # (bucket, block) — an empty partition spec would be the 5-reducer
    # per-bucket global window the docstring exists to avoid — and the
    # driver-cumulated offsets join back as a broadcast, never a shuffle
    plan = _plan(spark, "image_shard_pack")
    assert "windowspecdefinition(bucket" in plan, (
        f"window lost its partition keys:\n{plan}"
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, f"offsets join shuffled:\n{plan}"


#: bounded-by-construction exceptions: tfidf_topk and domain_mix
#: cross-join a ONE-ROW broadcast aggregate (scalar attach, not a
#: cartesian blow-up); embedding_kmeans cross-joins the k-row (k=8)
#: bounded broadcast cross joins: centroid tables (tfidf_topk, domain_mix,
#: embedding_kmeans), the 16-register HLL grid, the 3-row quantile list,
#: and zorder's 1-row min/max range — every nested-loop side is a literal
#: or aggregate of constant size, never a data-scaled table
CROSS_JOIN_OK = {
    "tfidf_topk",
    "domain_mix",
    "embedding_kmeans",
    "hll_distinct",
    "quantile_sketch",
    "zorder_layout",
    # bounded 1-row/12-row broadcast sides (totals joined onto buckets):
    "corpus_overlap",
    "corpus_drift",
}


def test_bigram_pmi_broadcasts_unigram_counts(spark):
    # the pair table joins the unigram counts twice — both must broadcast
    # (vocab-sized sides); an SMJ here re-shuffles the pair aggregate
    plan = _plan(spark, "bigram_pmi")
    assert plan.count("BroadcastHashJoin") >= 2, f"unigram joins shuffled:\n{plan}"
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_domain_mix_corpus_side_is_map_only(spark):
    # per-source rates broadcast back onto the corpus: the documents scan
    # must reach the filter through a BroadcastHashJoin — a shuffle of the
    # corpus would defeat the query's one-giant-domain-costs-nothing claim
    plan = _plan(spark, "domain_mix")
    assert "BroadcastHashJoin" in plan, f"rates join not broadcast:\n{plan}"
    assert "SortMergeJoin" not in plan, f"corpus side shuffled:\n{plan}"
    assert "EvalPython" not in plan


def test_trap_detection_is_two_phase_distinct_agg(spark):
    # countDistinct plans as the canonical two-exchange distinct aggregate
    # (partial on (host, pattern, url), then merge on (host, pattern));
    # a third exchange or a Python fallback would break the scale claim
    plan = _plan(spark, "trap_detection")
    assert plan.count("Exchange") == 2, plan
    assert "EvalPython" not in plan
    assert "partial_count" in plan  # map-side combine on both phases


def test_weighted_sample_is_one_pass_top_k(spark):
    # A-ES = map pass + distributed top-k: NO shuffle at all — each
    # partition keeps a local k-heap and the driver merges k·partitions
    plan = _plan(spark, "weighted_sample")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") == 0, plan
    assert "EvalPython" not in plan


def test_substring_dedup_is_hash_shingle_join(spark):
    # the 13-gram self-join must be an equi-join on the gram hash (SMJ or
    # shuffled hash), never a nested loop; two exchanges = the two join
    # sides' clustering, the pair aggregate reuses it
    plan = _plan(spark, "substring_dedup")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 3, plan
    assert "EvalPython" not in plan


def test_cms_sketch_aggregates_map_side(spark):
    # the 4×32 counter grid must collapse via partial aggregation before
    # its (tiny) shuffle, and the top-10 lookup side must broadcast
    plan = _plan(spark, "cms_heavy_hitters")
    assert "partial_count" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "EvalPython" not in plan


def test_corpus_overlap_bottom_k_is_take_ordered(spark):
    # the per-corpus bottom-k sketches must compile to
    # TakeOrderedAndProject (distributed per-partition bottom-k), never a
    # global Sort of the corpus
    plan = _plan(spark, "corpus_overlap")
    assert "TakeOrderedAndProject" in plan, plan
    assert "EvalPython" not in plan


def test_anchor_text_stays_jvm_side_and_bounded(spark):
    # two dst-keyed aggs + top-1 window + join: all JVM-side column work,
    # exchange count pinned (a regression re-shuffling the edge table per
    # consumer would exceed it)
    plan = _plan(spark, "anchor_text")
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 5, plan


def test_caption_align_single_join_shape(spark):
    # text-side agg, embedding posexplode, one (doc, dim) equi-join, one
    # per-doc agg — three exchanges total (incl. broadcasts), no Python
    plan = _plan(spark, "caption_align")
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 3, plan


def test_bm25_no_corpus_broadcast_and_take_ordered(spark):
    # the r3 scale bugs this shape forbids: (a) a one-row-per-document
    # length table in a BroadcastExchange (executor OOM at 10^10 docs) —
    # dl now rides the postings scan, so the ONLY broadcast is the
    # ≤3-row per-query-term df table; (b) top-20 via a global
    # single-partition window sort — must be TakeOrderedAndProject
    plan = _plan(spark, "bm25_search")
    assert "TakeOrderedAndProject" in plan, f"top-20 is a global sort:\n{plan}"
    assert plan.count("BroadcastExchange") <= 1, (
        f"corpus-sized side crept back into a broadcast:\n{plan}"
    )
    assert "EvalPython" not in plan


def test_inverted_index_caps_postings_before_collect(spark):
    # the posting-list cap must be a row_number window BEFORE the
    # collect_list (bounded agg buffer), and the window's term-keyed
    # exchange must be reused by the final groupBy: explode→(term,doc)
    # agg→window→agg is exactly two exchanges
    plan = _plan(spark, "inverted_index")
    assert "row_number" in plan, f"posting cap not windowed:\n{plan}"
    assert plan.count("Exchange") <= 2, (
        f"window/groupBy term-clustering reuse broke:\n{plan}"
    )
    assert "EvalPython" not in plan


def test_no_cartesian_products_anywhere(spark):
    bad = []
    for name, fn in analytics.QUERIES.items():
        if name in CROSS_JOIN_OK:
            continue
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
            bad.append(name)
    assert not bad, f"unbounded join shapes in: {bad}"
