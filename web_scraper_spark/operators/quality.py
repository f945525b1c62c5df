"""Best-variant selection: top-1 per key by quality (SURVEY.md §2.5 W1).

Reference parity: parse quality from each download link's label, sort by
priority, take the first (video_info_extractor.py:1489-1553, priority table
:1555-1599; score-argmax variant new/video_extractor.py:580-631).

Spark form: ``row_number`` over a per-key window ordered by quality desc
with deterministic tiebreakers. At scale this is a single shuffle on the
key; AQE handles skewed keys. ``max_by`` is used for the simple (single
column) case — no window state at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.parsing import quality_priority


def top1_per_key(
    df: DataFrame,
    key: str,
    order_by: list[Column],
) -> DataFrame:
    """Generic top-1-per-group with deterministic ordering."""
    w = Window.partitionBy(key).orderBy(*order_by)
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


def best_quality_variant(
    variants: DataFrame, key: str = "image_id", label_col: str = "quality_label", url_col: str = "url"
) -> DataFrame:
    """Pick the best-quality download variant per item (W1). Tiebreak on
    url for determinism (the reference relied on stable list order)."""
    scored = variants.withColumn("quality_pri", quality_priority(F.col(label_col)))
    return top1_per_key(scored, key, [F.col("quality_pri").desc(), F.col(url_col).asc()])
