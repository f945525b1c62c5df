"""URL canonicalization + hashing (SURVEY.md §2.8 F6/F7, §2.10 UDF #1).

Reference parity: video-id extraction regex ``/video/(\\d+)/`` with
path-split fallback (reference video_info_extractor.py:639-645,
new/video_extractor.py:34-53); urljoin relative→absolute normalization
(video_info_extractor.py:102-110,263-274).

Everything here is a pure column expression — it runs inside whole-stage
codegen, no Python in the hot path. The 64-bit identity of a URL is
``xxhash64(canonical_url)``; at 10^10 frontier rows the collision odds stay
below ~0.3% (birthday bound), and the seen-set stores (url_hash, image_id)
so a hash hit is confirmed by the exact anti-join (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def canonicalize_url(url: Column | str, base: str = "https://example.test") -> Column:
    """Normalize a URL string to its canonical form.

    Steps (each a codegen'd expression):
      1. trim whitespace
      2. resolve scheme-relative ``//host/...`` and root-relative ``/path``
         against ``base``; default scheme for bare hosts (the urljoin cases
         the reference hits, video_info_extractor.py:102-110)
      3. drop fragment (``#...``) and tracking query string (one regex:
         cut at the first of # or ?)
      4. lowercase scheme+host (path case is preserved — significant)
      5. ensure a trailing slash on path-less roots

    Expression-shape note: the naive ``c = when(p(c), f(c)).otherwise(c)``
    chaining duplicates the whole prior tree at every step — exponential
    plan size, codegen falls back to interpreted mode (measured 10×+
    slower at 2M rows). This version uses disjoint CASE branches and
    references each intermediate a bounded number of times, keeping the
    tree near-linear so whole-stage codegen + subexpression elimination
    stay effective.
    """
    t = F.trim(F.col(url) if isinstance(url, str) else url)
    # one CASE with disjoint branches, each referencing t once
    c1 = (
        F.when(t.startswith("//"), F.concat(F.lit("https:"), t))
        .when(t.startswith("/"), F.concat(F.lit(base), t))
        .when(~t.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://"), F.concat(F.lit("https://"), t))
        .otherwise(t)
    )
    # strip fragment + query in ONE pass
    c2 = F.regexp_replace(c1, r"[#?].*$", "")
    # lowercase scheme://host, keep the rest (c2 referenced twice — bounded)
    c3 = F.concat(
        F.lower(F.regexp_extract(c2, r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]+)", 1)),
        F.regexp_replace(c2, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+", ""),
    )
    # canonical trailing slash: bare scheme://host → append "/"
    return F.when(
        c3.rlike(r"^[a-z][a-z0-9+.-]*://[^/]*$"), F.concat(c3, F.lit("/"))
    ).otherwise(c3)


def url_host(url: Column | str) -> Column:
    """Extract the (lowercased) host from a canonical URL."""
    c = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:]+)", 1))


def url_path(url: Column | str) -> Column:
    c = F.col(url) if isinstance(url, str) else url
    return F.regexp_replace(c, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+", "")


def url_hash(url: Column | str) -> Column:
    """64-bit identity of a canonical URL (JVM xxhash64, codegen'd)."""
    c = F.col(url) if isinstance(url, str) else url
    return F.xxhash64(c)


def extract_item_id(url: Column | str) -> Column:
    """Item id from a detail URL — regex with path-split fallback.

    Reference semantics: ``/video/(\\d+)/`` then last-non-empty-path-segment
    fallback (video_info_extractor.py:639-645; new/video_extractor.py:34-53).
    Here generalized to ``/video/<id>/...`` with non-numeric ids allowed.
    """
    c = F.col(url) if isinstance(url, str) else url
    rx = F.regexp_extract(c, r"/video/([^/]+)", 1)
    # fallback: last non-empty path segment
    segs = F.filter(F.split(url_path(c), "/"), lambda s: s != "")
    fallback = F.when(F.size(segs) > 0, F.element_at(segs, -1)).otherwise(F.lit(None))
    return F.when(rx != "", rx).otherwise(fallback)


def extract_page_number(url: Column | str) -> Column:
    """Listing-page number from ``.../latest-updates/{page}/`` style URLs.

    Reference: last-page discovery regex (page_navigator.py:21-85,
    new/main_scraper.py:51-162).
    """
    c = F.col(url) if isinstance(url, str) else url
    rx = F.regexp_extract(c, r"/(\d+)/?$", 1)
    return F.when(rx != "", rx.cast("int")).otherwise(F.lit(None).cast("int"))
