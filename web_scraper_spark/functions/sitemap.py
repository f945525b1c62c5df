"""sitemap.xml parsing → crawl seed URLs (sitemaps.org protocol).

The third discovery source next to listing-page extraction (S2) and the
robots rules table: a host's sitemap enumerates crawlable URLs with
optional lastmod/priority hints, and large sites shard them behind a
``<sitemapindex>`` of child sitemaps. Reference parity: the reference
discovers URLs only by paging listing HTML (page_navigator.py); sitemap
ingestion is the standard crawler entry point it never had, and the
engine's priority-ordered frontier consumes the protocol's ``priority``
hint directly.

Parsing: stdlib ElementTree inside one Arrow-batched pandas UDF (metadata
path — one document per host per crawl, like robots.txt, never the
per-URL hot path). Namespaces are stripped before matching because
real-world sitemaps are inconsistent about declaring the
``http://www.sitemaps.org/schemas/sitemap/0.9`` namespace; tag LOCAL
names are the protocol. Malformed XML yields kind="error" with zero
entries — quarantine-style, a broken sitemap must not kill the crawl.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENTRY_TYPE = T.StructType(
    [
        T.StructField("loc", T.StringType(), False),
        T.StructField("lastmod", T.StringType(), True),
        T.StructField("priority", T.DoubleType(), True),
        T.StructField("changefreq", T.StringType(), True),
    ]
)

RESULT_TYPE = T.StructType(
    [
        # urlset | sitemapindex | error
        T.StructField("kind", T.StringType(), False),
        T.StructField("entries", T.ArrayType(ENTRY_TYPE), False),
    ]
)


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap_text(xml: str | None) -> tuple[str, list[dict]]:
    """Pure-Python single-document parse (shared by the UDF and tests).

    urlset → one entry per <url> (loc required; lastmod/changefreq kept as
    written, priority as float); sitemapindex → one entry per <sitemap>
    (child sitemap locs; lastmod may be present, priority/changefreq are
    not part of the index schema)."""
    if not xml or not xml.strip():
        return "error", []
    try:
        root = ET.fromstring(xml)
    except ET.ParseError:
        return "error", []
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return "error", []
    entries = []
    for child in root:
        if _local(child.tag) not in ("url", "sitemap"):
            continue
        fields: dict = {"loc": None, "lastmod": None, "priority": None, "changefreq": None}
        for el in child:
            name = _local(el.tag)
            if name in fields and el.text is not None:
                fields[name] = el.text.strip()
        if not fields["loc"]:
            continue
        if fields["priority"] is not None:
            try:
                fields["priority"] = float(fields["priority"])
            except ValueError:
                fields["priority"] = None
        entries.append(fields)
    return kind, entries


def parse_sitemap(body: Column) -> Column:
    """Column of sitemap XML → struct(kind, entries)."""

    def _parse(texts: pd.Series) -> pd.DataFrame:
        rows = [parse_sitemap_text(t) for t in texts]
        return pd.DataFrame(
            {
                "kind": [r[0] for r in rows],
                "entries": [
                    [
                        (e["loc"], e["lastmod"], e["priority"], e["changefreq"])
                        for e in r[1]
                    ]
                    for r in rows
                ],
            }
        )

    # registered without annotations: `from __future__ import annotations`
    # stringifies hints, which pandas_udf can't infer from
    udf = F.pandas_udf(_parse, RESULT_TYPE)
    return udf(body)


def sitemap_seed_df(
    fetched: DataFrame, host_col: str = "host", body_col: str = "sitemap_xml"
) -> tuple[DataFrame, DataFrame]:
    """(host, sitemap body) rows → ``(seeds, children)``:

      * ``seeds`` — (host, url, lastmod_ts, priority) from urlset docs,
        priority defaulted to the protocol's 0.5, lastmod parsed to a
        timestamp where well-formed — ready to rank into the frontier
        (the engine schedules priority DESC, so sitemap priority maps
        straight onto crawl priority);
      * ``children`` — (host, sitemap_url) from sitemapindex docs: the
        next round of sitemap fetches for sharded sitemaps (drive to a
        fixpoint exactly like listing-page lookahead).
    """
    parsed = fetched.select(
        F.col(host_col).alias("host"), parse_sitemap(F.col(body_col)).alias("s")
    )
    flat = parsed.select(
        "host", F.col("s.kind").alias("kind"), F.explode("s.entries").alias("e")
    )
    seeds = flat.filter(F.col("kind") == "urlset").select(
        "host",
        F.col("e.loc").alias("url"),
        F.to_timestamp(F.col("e.lastmod")).alias("lastmod_ts"),
        F.coalesce(F.col("e.priority"), F.lit(0.5)).alias("priority"),
    )
    children = flat.filter(F.col("kind") == "sitemapindex").select(
        "host", F.col("e.loc").alias("sitemap_url")
    )
    return seeds, children


def site_graph_from_seeds(seeds: DataFrame) -> DataFrame:
    """Sitemap seeds → the site-graph shape ``CrawlEngine.init`` consumes
    (url, image_id, page, position), so a sitemap-discovered crawl runs
    through the unmodified engine:

      * ``page`` (the engine's crawl priority, scheduled DESC) =
        round(sitemap priority × 100) — the protocol's 0.0-1.0 hint
        quantized onto the integer priority axis;
      * ``image_id`` = the item id extracted from the URL (F6 semantics);
      * ``position`` = 0 for all rows — within equal priority the engine's
        crawl order falls through to url_hash ASC, which is deterministic
        without needing a per-page ordinal the sitemap doesn't have.
    """
    from .urlnorm import extract_item_id

    return seeds.select(
        "url",
        extract_item_id(F.col("url")).alias("image_id"),
        F.round(F.col("priority") * 100).cast("int").alias("page"),
        F.lit(0).alias("position"),
    )
