"""HTML extraction operators (SURVEY S1-S6, F15-F16) against the
deterministic synthetic pages, whose ground truth is known from datagen."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark import datagen
from web_scraper_spark.functions.extraction import (
    explode_listing,
    extract_last_page,
    extract_listing_urls,
    extract_player_config,
    parse_detail_page,
    repair_js_object,
)

N_PAGES, VPP = 3, 8


def _listing_df(spark):
    return spark.createDataFrame(datagen.gen_listing_pages_pdf(N_PAGES, VPP))


def _detail_df(spark, n=6):
    return spark.createDataFrame(datagen.gen_detail_pages_pdf(n))


def test_listing_url_extraction_complete_and_ordered(spark):
    df = _listing_df(spark)
    rows = df.select("page", extract_listing_urls("html").alias("urls")).collect()
    for r in rows:
        expect = [
            datagen.detail_url_for((r["page"] - 1) * VPP + pos) for pos in range(VPP)
        ]
        # array_distinct preserves first-occurrence order
        assert r["urls"] == list(dict.fromkeys(expect))


def test_explode_listing_fans_out(spark):
    df = explode_listing(_listing_df(spark))
    assert df.count() == N_PAGES * VPP
    assert df.columns[-1] == "url"


def test_last_page_discovery(spark):
    df = _listing_df(spark)
    pages = df.select(extract_last_page("html").alias("lp")).collect()
    assert all(r["lp"] == N_PAGES for r in pages)
    none = spark.createDataFrame([("<html>no nav</html>",)], ["html"])
    assert none.select(extract_last_page("html").alias("lp")).collect()[0]["lp"] is None


def test_detail_parse_fields(spark):
    df = parse_detail_page(_detail_df(spark))
    rows = {r["image_id"]: r for r in df.collect()}
    for iid, r in rows.items():
        i = int(iid)
        caption = datagen.caption_for(i)
        assert r["title"] == caption.split(" | ")[0]
        assert r["video_src"] == f"https://cdn.example.test/file/{iid}.mp4"
        assert r["thumbnail_src"] == f"https://cdn.example.test/thumb/{iid}.jpg"
        assert r["uploader"].startswith("user")
        assert r["views"] is not None and r["views"] >= 100
        assert r["duration"] is not None and ":" in r["duration"]
        assert r["upload_date"] is not None
        expect_tags = [t.lower() for t in caption.split("tags: ")[1].split(", ")]
        assert r["tags"] == list(dict.fromkeys(expect_tags))
        assert len(r["variants"]) == 4
        assert r["variants"][0]["label"] == "MP4 2160p"


def test_best_variant_selection_from_parsed_html(spark):
    """W1 end-to-end: parsed variants → quality top-1 per item."""
    from web_scraper_spark.operators.quality import best_quality_variant

    df = parse_detail_page(_detail_df(spark))
    variants = df.select(
        "image_id", F.explode("variants").alias("v")
    ).select("image_id", F.col("v.url").alias("url"), F.col("v.label").alias("quality_label"))
    best = best_quality_variant(variants)
    rows = best.collect()
    assert len(rows) == 6
    assert all("_2160p" in r["url"] for r in rows)


def test_player_config_repair_udf(spark):
    df = _detail_df(spark).withColumn("cfg", extract_player_config("html"))
    rows = df.select("image_id", "cfg.*").collect()
    for r in rows:
        assert r["file"] == f"https://cdn.example.test/file/{r['image_id']}.mp4"
        assert r["quality"] in ("720", "1080")


def test_repair_js_object_cases():
    assert repair_js_object("{a: 'x', b: 2,}") == {"a": "x", "b": 2}
    assert repair_js_object('{"a": 1}') == {"a": 1}
    assert repair_js_object("not an object") is None
    assert repair_js_object("") is None
    assert repair_js_object("{nested: {q: '1080p'}, arr: [1,2,],}") == {
        "nested": {"q": "1080p"},
        "arr": [1, 2],
    }
