"""sitemap.xml parser (functions/sitemap.py): sitemaps.org protocol on
golden documents — urlset entries, sitemapindex recursion, namespace
tolerance, malformed-XML quarantine — plus the DataFrame seed split."""

from __future__ import annotations

from web_scraper_spark.functions.sitemap import parse_sitemap_text, sitemap_seed_df

NS = 'xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"'

URLSET = f"""<?xml version="1.0" encoding="UTF-8"?>
<urlset {NS}>
  <url>
    <loc>https://a.example.test/video/1/</loc>
    <lastmod>2025-06-01T12:00:00+00:00</lastmod>
    <priority>0.9</priority>
    <changefreq>daily</changefreq>
  </url>
  <url><loc>https://a.example.test/video/2/</loc></url>
  <url><lastmod>2025-01-01</lastmod></url>
  <url><loc>https://a.example.test/video/3/</loc><priority>junk</priority></url>
</urlset>
"""

INDEX = f"""<?xml version="1.0"?>
<sitemapindex {NS}>
  <sitemap><loc>https://a.example.test/sitemap-1.xml</loc><lastmod>2025-05-01</lastmod></sitemap>
  <sitemap><loc>https://a.example.test/sitemap-2.xml</loc></sitemap>
</sitemapindex>
"""


def test_urlset_entries():
    kind, entries = parse_sitemap_text(URLSET)
    assert kind == "urlset"
    # the loc-less <url> is dropped; junk priority becomes None
    assert [e["loc"] for e in entries] == [
        "https://a.example.test/video/1/",
        "https://a.example.test/video/2/",
        "https://a.example.test/video/3/",
    ]
    assert entries[0]["priority"] == 0.9
    assert entries[0]["lastmod"] == "2025-06-01T12:00:00+00:00"
    assert entries[0]["changefreq"] == "daily"
    assert entries[1]["priority"] is None
    assert entries[2]["priority"] is None


def test_sitemapindex_children():
    kind, entries = parse_sitemap_text(INDEX)
    assert kind == "sitemapindex"
    assert [e["loc"] for e in entries] == [
        "https://a.example.test/sitemap-1.xml",
        "https://a.example.test/sitemap-2.xml",
    ]


def test_namespace_optional():
    bare = URLSET.replace(f" {NS}", "")
    assert parse_sitemap_text(bare)[0] == "urlset"
    assert len(parse_sitemap_text(bare)[1]) == 3


def test_malformed_and_wrong_root_quarantined():
    assert parse_sitemap_text("<urlset><url><loc>x</loc>") == ("error", [])
    assert parse_sitemap_text("") == ("error", [])
    assert parse_sitemap_text(None) == ("error", [])
    assert parse_sitemap_text("<html><body>404</body></html>") == ("error", [])


def test_site_graph_from_seeds_feeds_engine_init(spark, tmp_path):
    """Sitemap seeds run through the unmodified engine: init accepts the
    converted site graph and the frontier ranks by sitemap priority."""
    from pyspark.sql import functions as F

    from web_scraper_spark.functions.sitemap import site_graph_from_seeds
    from web_scraper_spark.plans.crawl import CrawlEngine

    fetched = spark.createDataFrame(
        [("a.example.test", URLSET)], "host string, sitemap_xml string"
    )
    seeds, _ = sitemap_seed_df(fetched)
    site = site_graph_from_seeds(seeds)
    rows = {r["url"]: r for r in site.collect()}
    assert rows["https://a.example.test/video/1/"]["page"] == 90  # 0.9 → 90
    assert rows["https://a.example.test/video/2/"]["page"] == 50  # default
    assert rows["https://a.example.test/video/1/"]["image_id"] == "1"

    eng = CrawlEngine(str(tmp_path / "sm"), batch_size=10, n_partitions=4)
    eng.init(site)
    fr = eng.frontier.read(spark)
    assert fr.count() == 3
    # highest sitemap priority schedules first
    top = fr.orderBy(F.col("priority").desc()).first()
    assert top["priority"] == 90 and top["image_id"] == "1"


def test_seed_df_split(spark):
    fetched = spark.createDataFrame(
        [
            ("a.example.test", URLSET),
            ("b.example.test", INDEX),
            ("c.example.test", "<garbage"),
        ],
        "host string, sitemap_xml string",
    )
    seeds, children = sitemap_seed_df(fetched)
    srows = {r["url"]: r for r in seeds.collect()}
    assert set(srows) == {
        "https://a.example.test/video/1/",
        "https://a.example.test/video/2/",
        "https://a.example.test/video/3/",
    }
    # protocol default priority 0.5; explicit 0.9 honored; lastmod parsed
    assert srows["https://a.example.test/video/1/"]["priority"] == 0.9
    assert srows["https://a.example.test/video/1/"]["lastmod_ts"] is not None
    assert srows["https://a.example.test/video/2/"]["priority"] == 0.5
    crows = [r["sitemap_url"] for r in children.collect()]
    assert crows == [
        "https://a.example.test/sitemap-1.xml",
        "https://a.example.test/sitemap-2.xml",
    ]
