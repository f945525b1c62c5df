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
# per round. Rotation history: r3 gated registry entries 1-50; r4 rotated
# the 30 r3-ungated entries to the front (CORRECTNESS_r04 = those 30 +
# 20 re-checks). Round 5 rotates the 30 entries whose last driver row is
# from r3 (below) to the front — these include every image/video/audio
# query whose payload bytes changed when the real codec landed in r4, so
# they get fresh external evidence; the remaining 50 slots re-check r4
# rows. Every entry keeps its local replica gate in
# tests/test_analytics_oracle.py regardless of driver order.
_R5_FRONT = (
    # new in r5 — first driver gate for these two container audits
    "audio_container_stats", "image_container_stats",
    # last driver row is r3 (rotation: see comment above)
    "dedup_minhash_lsh", "simhash", "dedup_simhash_pairs",
    "embedding_topk", "dedup_embedding_cosine", "embedding_knn_lsh",
    "embedding_knn_ivf", "lang_id", "text_stats", "token_counts",
    "corpus_stats", "doc_fingerprint", "image_decode_stats",
    "image_features", "html_extraction", "sessionize", "asof_join",
    "rolling_window", "event_funnel", "quality_filter", "pii_scrub",
    "tfidf_topk", "dedup_retention", "image_phash_pairs",
    "image_dedup_retention", "image_aspect_buckets",
    "image_quality_gate", "image_shard_pack", "audio_features",
    "video_frame_sample",
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data pipeline ops). Each callable takes (spark, sf_dir).
    Ordered so the entries lacking a round-4 driver row register first
    (see _R5_FRONT)."""
    q = analytics.QUERIES
    out = {k: q[k] for k in _R5_FRONT if k in q}
    out.update({k: v for k, v in q.items() if k not in out})
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents — one per queries() entry. The hash
    queries use md5 (portable), the LSH oracle embeds the seeded
    hyperplanes as literals, and the datagen-backed html/image queries are
    checked against VALUES tables of independently-computed ground truth."""
    return analytics.get_oracles()
