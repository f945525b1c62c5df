"""HTML metadata extraction (SURVEY.md §2.1 S2-S6, §2.8 F15-F16).

The reference extracts listing URLs with 4 fallback XPath selectors
(page_navigator.py:87-152), detail metadata with Crawl4AI CSS schemas
(video_info_extractor.py:25-52), static lxml/regex + JSON-LD parsing
(new/video_data_parser.py:150-176, new/video_extractor.py:14-668) and a
JS-player-config repair step (new/video_data_parser.py:243-271).

Spark restatement: HTML is just a string column. Everything except the
JS-object repair is pure column expressions (regexp_extract_all +
from_json — whole-stage codegen, zero Python); the repair step is an
Arrow-batched pandas UDF because it needs real JSON parsing with fixups.
"""

from __future__ import annotations

import json
import re

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------- listing pages


def extract_listing_urls(html: Column | str) -> Column:
    """All detail-page hrefs in a listing page, order-preserving, deduped
    (reference page_navigator.py:98-139: union of selector hits with
    in-page dedupe — SO5). Returns array<string>."""
    c = F.col(html) if isinstance(html, str) else html
    hrefs = F.regexp_extract_all(c, F.lit(r'href="([^"]*/video/[^"]*)"'), 1)
    return F.array_distinct(hrefs)


def explode_listing(df: DataFrame, html_col: str = "html", out_col: str = "url") -> DataFrame:
    """listing rows → one row per discovered URL (S2's fan-out; the UDTF of
    SURVEY §2.10 is just explode)."""
    return df.withColumn(out_col, F.explode(extract_listing_urls(F.col(html_col))))


def extract_last_page(html: Column | str) -> Column:
    """Last-page discovery (S1, reference page_navigator.py:21-85): the
    page number in the 'Last' pagination href; null when absent (caller
    falls back, reference defaults 1000)."""
    c = F.col(html) if isinstance(html, str) else html
    rx = F.regexp_extract(c, r'href="[^"]*?/(\d+)/?"[^>]*>\s*Last', 1)
    return F.when(rx != "", rx.cast("int")).otherwise(F.lit(None).cast("int"))


# ----------------------------------------------------------- detail pages

#: JSON-LD VideoObject fields the reference reads (new/video_data_parser.py:150-176)
JSON_LD_SCHEMA = T.StructType(
    [
        T.StructField("@type", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("description", T.StringType()),
        T.StructField("duration", T.StringType()),  # ISO-8601, e.g. PT5M33S
        T.StructField("uploadDate", T.StringType()),
        T.StructField("contentUrl", T.StringType()),
        T.StructField("thumbnailUrl", T.StringType()),
    ]
)


def extract_json_ld_struct(html: Column | str) -> Column:
    """<script type=application/ld+json> body → typed struct (F15).
    regexp_extract + from_json: all JVM-side."""
    from .parsing import extract_json_ld

    return F.from_json(extract_json_ld(html), JSON_LD_SCHEMA)


def extract_og_title(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    og = F.regexp_extract(c, r'<meta[^>]+property="og:title"[^>]+content="([^"]*)"', 1)
    title = F.regexp_extract(c, r"(?s)<title[^>]*>(.*?)</title>", 1)
    return F.when(og != "", og).otherwise(F.when(title != "", F.trim(title)))


def extract_tags(html: Column | str) -> Column:
    """Tag anchors (reference html/tags.txt contract; cleanup via
    parsing.clean_tags downstream)."""
    c = F.col(html) if isinstance(html, str) else html
    return F.regexp_extract_all(c, F.lit(r'class="tag_item"[^>]*>([^<]+)<'), 1)


def extract_uploader(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    u = F.regexp_extract(c, r'class="uploader"[^>]*>\s*(?:<a[^>]*>)?([^<]+)', 1)
    return F.when(F.trim(u) != "", F.trim(u)).otherwise(F.lit(None))


def extract_views_text(html: Column | str) -> Column:
    c = F.col(html) if isinstance(html, str) else html
    v = F.regexp_extract(c, r'class="views"[^>]*>([^<]+)<', 1)
    return F.when(F.trim(v) != "", F.trim(v)).otherwise(F.lit(None))


def extract_download_variants(html: Column | str) -> Column:
    """Download-section links with quality labels (reference
    html/downloads.txt: 4 quality links per video; feeds W1 best-variant
    selection). Returns array<struct<url:string,label:string>>."""
    c = F.col(html) if isinstance(html, str) else html
    urls = F.regexp_extract_all(
        c, F.lit(r'<a[^>]+class="download_link"[^>]+href="([^"]+)"[^>]*>'), 1
    )
    labels = F.regexp_extract_all(
        c, F.lit(r'<a[^>]+class="download_link"[^>]+href="[^"]+"[^>]*>([^<]+)<'), 1
    )
    return F.zip_with(
        urls, labels, lambda u, l: F.struct(u.alias("url"), F.trim(l).alias("label"))
    )


def parse_detail_page(df: DataFrame, html_col: str = "html") -> DataFrame:
    """S3-S6 consolidated: detail-page HTML column → metadata columns with
    the reference's fallback chain (J2 coalesce semantics: JSON-LD first,
    inline markup second — video_info_extractor.py:194-300)."""
    from .parsing import clean_tags, iso8601_duration_to_hms, parse_views

    h = F.col(html_col)
    ld = extract_json_ld_struct(h)
    return df.withColumns(
        {
            "title": F.coalesce(ld["name"], extract_og_title(h)),
            "description": F.coalesce(ld["description"], F.lit("")),
            "duration": iso8601_duration_to_hms(ld["duration"]),
            "upload_date": F.try_to_timestamp(ld["uploadDate"]),
            "video_src": F.coalesce(
                ld["contentUrl"],
                F.nullif(
                    F.regexp_extract(h, r'<source[^>]+src="([^"]+)"', 1), F.lit("")
                ),
            ),
            "thumbnail_src": ld["thumbnailUrl"],
            "uploader": extract_uploader(h),
            "views": parse_views(F.coalesce(extract_views_text(h), F.lit(""))),
            "tags": clean_tags(extract_tags(h)),
            "variants": extract_download_variants(h),
        }
    )


# ------------------------------------------------- JS player-config (F16)

_JS_KEY_RX = re.compile(r"([{,]\s*)([A-Za-z_][A-Za-z0-9_]*)\s*:")
_JS_SQUOTE_RX = re.compile(r"'([^'\\]*(?:\\.[^'\\]*)*)'")
_JS_TRAILING_COMMA_RX = re.compile(r",\s*([}\]])")


def repair_js_object(text: str) -> dict | None:
    """One JS object literal → dict (reference new/video_data_parser.py:
    243-271): quote bare keys, single→double quotes, strip trailing
    commas. Returns None when unparseable."""
    if not text:
        return None
    s = _JS_KEY_RX.sub(r'\1"\2":', text.strip())
    s = _JS_SQUOTE_RX.sub(lambda m: json.dumps(m.group(1)), s)
    s = _JS_TRAILING_COMMA_RX.sub(r"\1", s)
    try:
        out = json.loads(s)
    except (ValueError, TypeError):
        return None
    return out if isinstance(out, dict) else None


PLAYER_CONFIG_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("poster", T.StringType()),
        T.StructField("quality", T.StringType()),
    ]
)


def _player_config_series(html_s):
    """Arrow-batched body: pull `var playerConfig = {...}` and repair."""
    rx = re.compile(r"playerConfig\s*=\s*(\{.*?\})\s*;", re.S)
    out = []
    for html in html_s:
        cfg = None
        if html:
            m = rx.search(html)
            if m:
                cfg = repair_js_object(m.group(1))
        cfg = cfg or {}
        out.append(
            {
                "file": cfg.get("file"),
                "poster": cfg.get("poster"),
                "quality": str(cfg["quality"]) if "quality" in cfg else None,
            }
        )
    return pd.DataFrame(out)


#: pandas UDF: html -> struct<file,poster,quality> (registered without
#: annotations; `from __future__ import annotations` breaks hint inference)
extract_player_config = F.pandas_udf(_player_config_series, PLAYER_CONFIG_SCHEMA)
