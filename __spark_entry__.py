"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship frontier-scheduling query on sf0.001;
``queries``/``oracle_sql`` expose the operator inventory of
``web_scraper_spark.analytics`` (SURVEY.md §2 parity + training-data
pipeline ops) for the DuckDB correctness gate.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from web_scraper_spark import analytics  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: politeness-wave frontier
    scheduling (rank → wave → salt), the heart of the crawl scheduler."""
    return analytics.q_frontier_schedule(spark, "/root/testdata/sf0.001")


# The driver's correctness gate checks the FIRST 50 registered queries
# (CORRECTNESS_r03 covered exactly registry entries 1-50). Rotate the 29
# entries the r03 gate did not reach (+ hits, landed post-gate) to the
# front so round 4 gives them hard external evidence (VERDICT r3 item 2);
# every entry keeps its local replica gate in tests/test_analytics_oracle.py
# regardless of driver order.
_R3_GATED = frozenset({
    "frontier_schedule", "ranked_microbatch", "anti_join_seen",
    "top1_per_key", "left_join_coalesce", "reconcile_full_outer",
    "set_intersection", "group_stats", "validators", "retry_policy",
    "storage_gate", "recent_window_dedup", "dedup_exact",
    "dedup_ngram_jaccard", "dedup_clusters", "sample_stratified",
    "token_heavy_hitters", "dim_join_rollup", "brand_price_quantiles",
    "supplier_balance_by_nation", "dedup_minhash_lsh", "simhash",
    "dedup_simhash_pairs", "embedding_topk", "dedup_embedding_cosine",
    "embedding_knn_lsh", "embedding_knn_ivf", "lang_id", "text_stats",
    "token_counts", "corpus_stats", "doc_fingerprint",
    "image_decode_stats", "image_features", "html_extraction",
    "sessionize", "asof_join", "rolling_window", "event_funnel",
    "quality_filter", "pii_scrub", "tfidf_topk", "dedup_retention",
    "image_phash_pairs", "image_dedup_retention", "image_aspect_buckets",
    "image_quality_gate", "image_shard_pack", "audio_features",
    "video_frame_sample",
})


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data pipeline ops). Each callable takes (spark, sf_dir).
    Ordered so previously-ungated entries register first (see _R3_GATED)."""
    q = analytics.QUERIES
    out = {k: v for k, v in q.items() if k not in _R3_GATED}
    out.update({k: v for k, v in q.items() if k in _R3_GATED})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents — one per queries() entry. The hash
    queries use md5 (portable), the LSH oracle embeds the seeded
    hyperplanes as literals, and the datagen-backed html/image queries are
    checked against VALUES tables of independently-computed ground truth."""
    return analytics.get_oracles()
