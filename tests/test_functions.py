"""Unit tests for scalar column functions (SURVEY.md §2.8) with golden
values mirroring the reference's samples (9.json, html/*.txt fragments)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from web_scraper_spark.functions.errors import (
    backoff_seconds,
    classify_error,
    should_retry,
)
from web_scraper_spark.functions.parsing import (
    clean_tags,
    duration_to_seconds,
    iso8601_duration_to_hms,
    parse_absolute_date,
    parse_views,
    quality_priority,
)
from web_scraper_spark.functions.urlnorm import (
    canonicalize_url,
    extract_item_id,
    extract_page_number,
    url_hash,
    url_host,
    url_path,
)


def col_vals(spark, rows, expr, name="out"):
    df = spark.createDataFrame([(r,) for r in rows], ["v"])
    return [r[name] for r in df.select(expr.alias(name)).collect()]


# ------------------------------------------------------------------ urlnorm


def test_canonicalize_strips_fragment_query_and_lowercases_host(spark):
    rows = [
        "https://HOT.example.test/video/00000001/slug/?utm_source=feed",
        "https://hot.example.test/video/00000001/slug/#player",
        "  https://hot.example.test/video/00000001/slug/ ",
        "//hot.example.test/video/00000001/slug/",
        "/video/00000001/slug/",
        "hot.example.test",
    ]
    out = col_vals(spark, rows, canonicalize_url(F.col("v")))
    assert out[0] == "https://hot.example.test/video/00000001/slug/"
    assert out[1] == "https://hot.example.test/video/00000001/slug/"
    assert out[2] == "https://hot.example.test/video/00000001/slug/"
    assert out[3] == "https://hot.example.test/video/00000001/slug/"
    assert out[4] == "https://example.test/video/00000001/slug/"
    assert out[5] == "https://hot.example.test/"


def test_canonical_variants_hash_identically(spark):
    variants = [
        "https://hot.example.test/video/42/x/?utm_source=feed",
        "https://HOT.example.test/video/42/x/",
        "https://hot.example.test/video/42/x/#frag",
    ]
    hashes = col_vals(spark, variants, url_hash(canonicalize_url(F.col("v"))))
    assert len(set(hashes)) == 1


def test_url_host_and_path(spark):
    rows = ["https://a.example.test/video/1/x/"]
    assert col_vals(spark, rows, url_host(F.col("v"))) == ["a.example.test"]
    assert col_vals(spark, rows, url_path(F.col("v"))) == ["/video/1/x/"]


def test_extract_item_id_regex_and_fallback(spark):
    rows = [
        "https://h.test/video/12345/some-slug/",  # regex path
        "https://h.test/items/abc-def/",  # fallback: last segment
    ]
    out = col_vals(spark, rows, extract_item_id(F.col("v")))
    assert out == ["12345", "abc-def"]


def test_extract_page_number(spark):
    rows = ["https://h.test/latest-updates/137/", "https://h.test/latest-updates/"]
    assert col_vals(spark, rows, extract_page_number(F.col("v"))) == [137, None]


# ------------------------------------------------------------------ parsing


def test_parse_views_forms(spark):
    rows = ["1.2K", "3M", "1,234", "987", "12 (345)", "junk"]
    out = col_vals(spark, rows, parse_views(F.col("v")))
    assert out == [1200, 3_000_000, 1234, 987, 345, None]


def test_duration_to_seconds(spark):
    rows = ["12:34", "1:02:03", "9:59", "bogus", "123"]
    out = col_vals(spark, rows, duration_to_seconds(F.col("v")))
    assert out == [754, 3723, 599, None, None]


def test_iso8601_duration(spark):
    rows = ["PT1H23M45S", "PT5M", "PT42S", "PT", "xx"]
    out = col_vals(spark, rows, iso8601_duration_to_hms(F.col("v")))
    assert out == ["1:23:45", "0:05:00", "0:00:42", None, None]


def test_absolute_date_formats(spark):
    rows = ["2024-03-01", "03/01/2024", "March 1, 2024"]
    out = col_vals(spark, rows, parse_absolute_date(F.col("v")))
    assert all(o is not None and o.year == 2024 and o.month == 3 for o in out)


def test_quality_priority_ladder(spark):
    rows = ["MP4 2160p", "4K ultra", "1080p", "720p", "mp4 480p", "unknown"]
    out = col_vals(spark, rows, quality_priority(F.col("v")))
    assert out == [100, 100, 80, 70, 60, 10]


def test_clean_tags_dedup_ignore_cap(spark):
    df = spark.createDataFrame(
        [(["  Tag1", "tag1", "suggest", "mp4 1080p", "", "Tag2"],)], ["v"]
    )
    out = df.select(clean_tags(F.col("v")).alias("t")).collect()[0]["t"]
    assert out == ["tag1", "tag2"]


# ------------------------------------------------------------------- errors


def test_classify_error_ladder(spark):
    cases = {
        "HTTP 429 too many requests": "rate_limit",
        "HTTP 404 not found": "permanent",
        "connection timeout while fetching payload": "network",
        "validation: decode failed: truncated": "validation",
        "temporary upstream glitch": "temporary",
        # precedence: rate-limit beats network wording
        "connection throttled by rate limit": "rate_limit",
    }
    out = col_vals(spark, list(cases), classify_error(F.col("v")))
    assert out == list(cases.values())


def test_retry_budget_and_backoff(spark):
    df = spark.createDataFrame(
        [("network", 3), ("network", 8), ("permanent", 1), ("rate_limit", 6)],
        ["cls", "att"],
    )
    out = df.select(
        should_retry("cls", "att").alias("r"),
        backoff_seconds("cls", "att").alias("b"),
    ).collect()
    assert [r["r"] for r in out] == [True, False, True, False]
    assert out[0]["b"] == pytest.approx(40.0)  # 5 * 2^3
    assert out[1]["b"] == pytest.approx(300.0)  # capped
    assert out[2]["b"] == pytest.approx(120.0)  # 60 * 2


# ------------------------------------------------------------- dates F1/F3


def test_parse_relative_date_ms_golden(spark):
    # golden cases mirroring reference date_parser.py:38-81
    from web_scraper_spark.functions.parsing import parse_relative_date_ms

    now = F.to_timestamp(F.lit("2026-01-10 00:00:00"))
    now_ms = 1768003200000  # 2026-01-10T00:00:00Z
    rows = [
        "5 days ago",
        "1 day ago",
        "3 weeks ago",
        "2 months ago",
        "1 year ago",
        "10 minutes ago",
        "30 seconds ago",
        "6 hours ago",
        "yesterday",
        "today",
        "just now",
        "now",
        "  2 Days Ago  ",  # trim + case-insensitive
        "garbage",
        "",
    ]
    out = col_vals(spark, rows, parse_relative_date_ms(F.col("v"), now))
    day = 86_400_000
    assert out[0] == now_ms - 5 * day
    assert out[1] == now_ms - 1 * day
    assert out[2] == now_ms - 3 * 7 * day
    assert out[3] == now_ms - 2 * 30 * day
    assert out[4] == now_ms - 365 * day
    assert out[5] == now_ms - 10 * 60_000
    assert out[6] == now_ms - 30 * 1000
    assert out[7] == now_ms - 6 * 3_600_000
    assert out[8] == now_ms - day
    assert out[9] == now_ms
    assert out[10] == now_ms
    assert out[11] == now_ms
    assert out[12] == now_ms - 2 * day
    assert out[13] is None
    assert out[14] is None


def test_parse_date_fuzzy_extracts_from_prose(spark):
    from web_scraper_spark.functions.parsing import parse_date_fuzzy

    rows = [
        "Published on March 5, 2024 by admin",
        "uploaded 2023-11-02, remastered",
        "no date here at all",
        None,
    ]
    out = col_vals(spark, rows, parse_date_fuzzy(F.col("v")))
    assert out[0] is not None and (out[0].year, out[0].month, out[0].day) == (2024, 3, 5)
    assert out[1] is not None and (out[1].year, out[1].month, out[1].day) == (2023, 11, 2)
    assert out[2] is None
    assert out[3] is None


def test_parse_upload_date_chain_and_sanity_window(spark):
    from web_scraper_spark.functions.parsing import parse_upload_date

    now = F.to_timestamp(F.lit("2026-01-10 00:00:00"))
    rows = [
        "2024-03-05",                          # strict format wins
        "Published on March 5, 2024 by admin", # fuzzy fallback
        "2300-01-01",                          # future -> sanity-rejected
        "1900-01-01",                          # too old -> sanity-rejected
        "not a date",
    ]
    out = col_vals(spark, rows, parse_upload_date(F.col("v"), now))
    assert (out[0].year, out[0].month, out[0].day) == (2024, 3, 5)
    assert (out[1].year, out[1].month, out[1].day) == (2024, 3, 5)
    assert out[2] is None
    assert out[3] is None
    assert out[4] is None


def test_bpe_tokenization_matches_hand_counts(spark):
    """BPE-ish pre-tokenizer (analytics.BPE_TOKEN_RE): contraction
    suffixes, space-prefixed runs, punctuation runs — counts verified
    against hand-tokenized strings (the corpus text is plain words, so
    the punctuation behaviour needs its own fixture)."""
    from pyspark.sql import functions as F

    from web_scraper_spark.analytics import BPE_TOKEN_RE

    cases = [
        # ("I", "'ll", " eat", " 2", " apples", ",", " won", "'t", " I", "?")
        ("I'll eat 2 apples, won't I?", 10),
        # ("e", ".", "g", ".", " v", "2", ".", "0", " --", " costs", " $", "3")
        ("e.g. v2.0 -- costs $3", 12),
        ("word", 1),
        ("  ", 1),  # one whitespace run
    ]
    df = spark.createDataFrame([(t,) for t, _ in cases], "text string").withColumn(
        "n", F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_TOKEN_RE), F.lit(0)))
    )
    got = [r["n"] for r in df.collect()]
    assert got == [n for _, n in cases]
