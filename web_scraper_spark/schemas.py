"""Canonical StructTypes for every engine table.

Derived from SURVEY.md §1 (the reference's conventional-but-unenforced dict
shapes become enforced schemas) and FIXTURES.md. The payload shape is fixed
by BASELINE.json ``input_hint``:
``(image_id:string, bytes:binary, w:int32, h:int32, fmt:string,
caption:string, phash:int64)``.

Reference parity cites:
  - payload row ≈ video_info dict (reference video_info_validator.py:8-25,
    9.json golden sample) + the on-disk payload file collapsed into a
    BinaryType column.
  - frontier/seen/failures ≈ progress.json fields (reference
    new/progress_manager.py:38-50) split into three real tables.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- payload
# One row per fetchable item: the image+caption pair.
PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
    ]
)

# Audio / video payloads: same opaque-binary-plus-metadata shape as the
# image payload (input_hint generalized to the other media columns).
AUDIO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
    ]
)

VIDEO_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("caption", T.StringType(), True),
    ]
)

# ------------------------------------------------------------- site graph
# Synthetic listing structure (FIXTURES.md §2) standing in for live
# pagination (reference page_navigator.py:154-190).
SITE_GRAPH_SCHEMA = T.StructType(
    [
        T.StructField("page", T.IntegerType(), False),
        T.StructField("position", T.IntegerType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("host", T.StringType(), False),
    ]
)

# --------------------------------------------------------------- frontier
# The scheduler's work table (reference: the page counter + failed_videos in
# progress.json, new/progress_manager.py:38-50). status lifecycle:
# pending → done | failed(error_class, attempts, next_attempt_ts) → permanent.
FRONTIER_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),  # = page, desc order
        T.StructField("position", T.IntegerType(), False),  # listing order in page
        T.StructField("status", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("error_class", T.StringType(), True),
        T.StructField("next_attempt_ts", T.TimestampType(), True),
    ]
)

# ------------------------------------------------------------------- seen
# The URL-seen set (reference downloaded_videos list, progress.json.backup:6).
# Committed ONLY with validated payload rows — fixing the reference's
# at-most-once bug (main.py:310-327 marks done before bytes verified).
SEEN_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("image_id", T.StringType(), False),
        T.StructField("committed_seq", T.LongType(), False),  # global crawl order
    ]
)

# --------------------------------------------------------------- failures
# reference new/progress_manager.py:175-182 {video_id, page, attempts,
# last_attempt_ts} + error classes of video_processor.py:194-235.
FAILURES_SCHEMA = T.StructType(
    [
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("error_class", T.StringType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("permanent", T.BooleanType(), False),
        T.StructField("last_attempt_seq", T.LongType(), False),
    ]
)

# ----------------------------------------------------------------- robots
ROBOTS_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType(), False),
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)

# ---------------------------------------------------------------- metrics
# Per-batch counters replacing the reference's stats dicts (SURVEY §2.4
# A1-A7) — one row per (batch, metric).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("metric", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
    ]
)

# ------------------------------------------------------------- fault plan
# Deterministic failure injection (FIXTURES.md §6).
FAULT_PLAN_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("fail_mode", T.StringType(), False),
        T.StructField("fail_count", T.IntegerType(), False),
    ]
)

# Result of the fetch+validate stage (before commit). ``host`` rides along
# so frontier updates never need a join back to the frontier table.
FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("url_hash", T.LongType(), False),
        T.StructField("host", T.StringType(), False),
        T.StructField("image_id", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("position", T.IntegerType(), False),
        T.StructField("attempts", T.IntegerType(), False),
        T.StructField("seq", T.LongType(), False),
        T.StructField("ok", T.BooleanType(), False),
        T.StructField("error_msg", T.StringType(), True),
        T.StructField("bytes", T.BinaryType(), True),
        T.StructField("w", T.IntegerType(), True),
        T.StructField("h", T.IntegerType(), True),
        T.StructField("fmt", T.StringType(), True),
        T.StructField("caption", T.StringType(), True),
        T.StructField("phash", T.LongType(), True),
        T.StructField("fetch_wave", T.IntegerType(), True),
    ]
)
