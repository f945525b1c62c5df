"""Metadata-extraction scalar functions (SURVEY.md §2.8 F1-F5, F9-F10, F14-F15).

Each is a pure column expression (JVM codegen) replacing the reference's
per-row Python. Cites point at the reference behavior being matched.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ------------------------------------------------------------------ dates


def parse_relative_date_ms(text: Column | str, now: Column | None = None) -> Column:
    """'5 days ago' → epoch ms (reference date_parser.py:38-81).

    Units: second/minute/hour/day/week/month(≈30d)/year(≈365d), plus
    'yesterday'/'today'/'just now'.
    """
    c = F.lower(F.trim(F.col(text) if isinstance(text, str) else text))
    now = now if now is not None else F.current_timestamp()
    now_ms = (now.cast("double") * 1000).cast("long")
    n = F.regexp_extract(c, r"(\d+)\s*(second|minute|hour|day|week|month|year)s?\s+ago", 1).cast("long")
    unit = F.regexp_extract(c, r"(\d+)\s*(second|minute|hour|day|week|month|year)s?\s+ago", 2)
    unit_ms = (
        F.when(unit == "second", 1000)
        .when(unit == "minute", 60_000)
        .when(unit == "hour", 3_600_000)
        .when(unit == "day", 86_400_000)
        .when(unit == "week", 7 * 86_400_000)
        .when(unit == "month", 30 * 86_400_000)
        .when(unit == "year", 365 * 86_400_000)
    ).cast("long")
    return (
        F.when(c.rlike(r"just\s+now|^now$"), now_ms)
        .when(c == "today", now_ms)
        .when(c == "yesterday", now_ms - F.lit(86_400_000).cast("long"))
        .when(unit != "", now_ms - n * unit_ms)
        .otherwise(F.lit(None).cast("long"))
    )


#: strptime formats tried by the reference (date_parser.py:83-106), as Spark patterns
ABSOLUTE_DATE_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "MM/dd/yyyy",
    "dd-MM-yyyy",
    "MMMM d, yyyy",
    "MMM d, yyyy",
]


def parse_absolute_date(text: Column | str) -> Column:
    """Multi-format date parse → timestamp (reference date_parser.py:83-106).

    ``coalesce(try_to_timestamp(c, f) for f in formats)`` — first format wins,
    exactly the reference's sequential-strptime semantics.
    """
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    return F.coalesce(*[F.try_to_timestamp(c, F.lit(f)) for f in ABSOLUTE_DATE_FORMATS])


def parse_date_fuzzy(text: Column | str) -> Column:
    """Fuzzy date fallback (F3, reference date_parser.py:28-36): dateutil
    ``parse(fuzzy=True)`` picks a date out of surrounding prose
    ('Published on March 5, 2024 by admin'). Arrow-batched pandas UDF —
    this is the slow-path *fallback*; the strptime formats above stay
    JVM-side and win first in ``parse_upload_date``'s coalesce chain.
    """
    import pandas as pd
    from pyspark.sql import types as T

    def _fuzzy(s):
        try:
            from dateutil import parser as duparser
        except ImportError:  # pragma: no cover - dateutil ships with pandas
            return pd.Series([pd.NaT] * len(s))

        default = __import__("datetime").datetime(2000, 1, 1)

        def one(v):
            if v is None or not str(v).strip():
                return pd.NaT
            try:
                return duparser.parse(str(v), fuzzy=True, default=default)
            except (ValueError, OverflowError):
                return pd.NaT

        return pd.Series([one(v) for v in s], dtype="datetime64[us]")

    # registered without annotations: `from __future__ import annotations`
    # stringifies hints, which pandas_udf can't infer from
    fuzzy_udf = F.pandas_udf(_fuzzy, T.TimestampNTZType())
    c = F.col(text) if isinstance(text, str) else text
    return fuzzy_udf(c).cast("timestamp")


def parse_upload_date(text: Column | str, now: Column | None = None) -> Column:
    """The reference's full date fallback chain (date_parser.py:20-36):
    strict strptime formats first (JVM-side), fuzzy dateutil as the
    fallback branch of the coalesce, then the sanity window (not future,
    not ancient) nulls out garbage."""
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    strict = parse_absolute_date(c)
    parsed = F.coalesce(strict, parse_date_fuzzy(c))
    return F.when(sane_upload_ts(parsed, now), parsed).otherwise(
        F.lit(None).cast("timestamp")
    )


def sane_upload_ts(ts: Column, now: Column | None = None, max_age_years: int = 20) -> Column:
    """Sanity window: not in the future, not older than 20 y
    (reference date_parser.py:108-129)."""
    now = now if now is not None else F.current_timestamp()
    low = now - F.expr(f"INTERVAL {max_age_years * 365} DAYS")
    return ts.between(low, now)


# --------------------------------------------------------------- duration


def duration_to_seconds(text: Column | str) -> Column:
    """'MM:SS' / 'HH:MM:SS' → seconds (reference file_validator.py:56 regex;
    derived-seconds column per SURVEY §1.1)."""
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    parts = F.split(c, ":")
    valid = c.rlike(r"^\d{1,2}(:\d{2}){1,2}$")
    secs = F.aggregate(
        parts,
        F.lit(0).cast("long"),
        lambda acc, x: acc * 60 + x.cast("long"),
    )
    return F.when(valid, secs).otherwise(F.lit(None).cast("long"))


def iso8601_duration_to_hms(text: Column | str) -> Column:
    """'PT1H23M45S' → 'H:MM:SS' (reference new/video_extractor.py:540-578)."""
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    h = F.coalesce(F.nullif(F.regexp_extract(c, r"(\d+)H", 1), F.lit("")).cast("long"), F.lit(0))
    m = F.coalesce(F.nullif(F.regexp_extract(c, r"(\d+)M", 1), F.lit("")).cast("long"), F.lit(0))
    s = F.coalesce(F.nullif(F.regexp_extract(c, r"(\d+(?:\.\d+)?)S", 1), F.lit("")).cast("double").cast("long"), F.lit(0))
    total = h * 3600 + m * 60 + s
    return F.when(
        c.rlike(r"^PT(\d+H)?(\d+M)?(\d+(\.\d+)?S)?$") & (c != "PT"),
        F.concat_ws(
            ":",
            (total / 3600).cast("long").cast("string"),
            F.lpad(((total % 3600) / 60).cast("long").cast("string"), 2, "0"),
            F.lpad((total % 60).cast("string"), 2, "0"),
        ),
    ).otherwise(F.lit(None).cast("string"))


# ------------------------------------------------------------------ views


def parse_views(text: Column | str) -> Column:
    """Views text → long: '1.2K', '3M', '1,234', '12 (exact)' forms.

    Reference video_info_extractor.py:302-354,500-536;
    new/video_extractor.py:352-397. Precedence: parenthesized exact count
    first, then suffixed, then plain digits (commas stripped).
    """
    c = F.lower(F.trim(F.col(text) if isinstance(text, str) else text))
    c = F.regexp_replace(c, ",", "")
    paren = F.regexp_extract(c, r"\((\d+)\)", 1)
    num = F.regexp_extract(c, r"(\d+(?:\.\d+)?)\s*([kmb])?", 1)
    suf = F.regexp_extract(c, r"(\d+(?:\.\d+)?)\s*([kmb])", 2)
    mult = (
        F.when(suf == "k", 1_000.0)
        .when(suf == "m", 1_000_000.0)
        .when(suf == "b", 1_000_000_000.0)
        .otherwise(1.0)
    )
    return (
        F.when(paren != "", paren.cast("long"))
        .when(num != "", (num.cast("double") * mult).cast("long"))
        .otherwise(F.lit(None).cast("long"))
    )


# -------------------------------------------------------------- quality


#: quality-text → priority, higher = better (reference
#: video_info_extractor.py:1555-1599 priority table)
QUALITY_LADDER = [
    ("2160", 100), ("4k", 100),
    ("1440", 90), ("2k", 90),
    ("1080", 80),
    ("720", 70),
    ("480", 60),
    ("360", 50),
    ("240", 40),
]


def quality_priority(text: Column | str) -> Column:
    """Parse '4k'/'2160p'/…/'240p' from a label → numeric priority
    (reference video_info_extractor.py:1555-1599); unknown → 10."""
    c = F.lower(F.col(text) if isinstance(text, str) else text)
    expr = None
    for token, pri in QUALITY_LADDER:
        cond = c.contains(token)
        expr = F.when(cond, pri) if expr is None else expr.when(cond, pri)
    return expr.otherwise(10)


# ------------------------------------------------------------------- tags


#: pseudo-tags dropped by the reference (video_info_extractor.py:666-692,1160-1188)
TAG_IGNORE_LIST = ["suggest", "mp4 1080p", "mp4 720p", "mp4 480p", "mp4 360p", "+ |"]


def clean_tags(tags: Column | str, max_tags: int = 20) -> Column:
    """Trim/lower/dedupe a tag array, drop ignore-list pseudo-tags, cap at 20
    (reference video_info_extractor.py:666-692; new/video_extractor.py:155-193)."""
    c = F.col(tags) if isinstance(tags, str) else tags
    cleaned = F.transform(c, lambda t: F.lower(F.trim(t)))
    cleaned = F.filter(cleaned, lambda t: (t != "") & ~t.isin(TAG_IGNORE_LIST))
    return F.slice(F.array_distinct(cleaned), 1, max_tags)


# ----------------------------------------------------------- heuristics


def looks_like_duration(text: Column | str) -> Column:
    """'looks like a duration' heuristic (reference
    video_info_extractor.py:1037-1064)."""
    c = F.trim(F.col(text) if isinstance(text, str) else text)
    return c.rlike(r"^\d{1,2}(:\d{2}){1,2}$")


def looks_like_views(text: Column | str) -> Column:
    c = F.lower(F.trim(F.col(text) if isinstance(text, str) else text))
    return c.rlike(r"^[\d.,]+\s*[kmb]?$")


# ---------------------------------------------------------------- JSON-LD


def extract_json_ld(html: Column | str) -> Column:
    """Pull the JSON-LD <script> body out of an HTML string
    (reference new/video_data_parser.py:150-176). Pair with
    ``F.from_json(result, schema)`` for typed fields."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract(
        c, r'(?s)<script[^>]*type="application/ld\+json"[^>]*>(.*?)</script>', 1
    )
