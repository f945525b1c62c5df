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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (plus the
    training-data pipeline ops). Each callable takes (spark, sf_dir)."""
    return dict(analytics.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable equivalents — one per queries() entry. The hash
    queries use md5 (portable), the LSH oracle embeds the seeded
    hyperplanes as literals, and the datagen-backed html/image queries are
    checked against VALUES tables of independently-computed ground truth."""
    return analytics.get_oracles()
