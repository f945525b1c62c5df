"""robots.txt parser (functions/robots.py): RFC 9309 subset semantics on
golden documents, plus the round trip into the engine's broadcast
blocked/crawl-delay annotation."""

from __future__ import annotations

from pyspark.sql import functions as F

from web_scraper_spark.functions.robots import (
    parse_robots_text,
    robots_rules_df,
)

GOLDEN = """
# comment line
User-agent: *
Disallow: /private/
Disallow: /tmp/
Allow: /private/ok/
Crawl-delay: 1.5

User-agent: fastbot
Disallow:

User-agent: slowbot
User-agent: otherbot
Disallow: /
Crawl-delay: 10
"""


def test_star_group():
    dis, allow, delay = parse_robots_text(GOLDEN, agent="*")
    assert dis == ["/private/", "/tmp/"]
    assert allow == ["/private/ok/"]
    assert delay == 1500


def test_specific_agent_replaces_star_not_merged():
    dis, allow, delay = parse_robots_text(GOLDEN, agent="fastbot")
    assert dis == [] and allow == [] and delay == 0  # empty Disallow = allow all


def test_shared_agent_run_and_case_insensitive():
    dis, _, delay = parse_robots_text(GOLDEN, agent="SlowBot")
    assert dis == ["/"] and delay == 10000
    dis2, _, _ = parse_robots_text(GOLDEN, agent="otherbot")
    assert dis2 == ["/"]


def test_unknown_agent_falls_back_to_star():
    dis, _, _ = parse_robots_text(GOLDEN, agent="nobody")
    assert dis == ["/private/", "/tmp/"]


def test_rules_before_any_agent_ignored_and_empty_doc():
    assert parse_robots_text("Disallow: /x/\nUser-agent: *\nDisallow: /y/") == (
        ["/y/"],
        [],
        0,
    )
    assert parse_robots_text("") == ([], [], 0)
    assert parse_robots_text(None) == ([], [], 0)


def test_bad_crawl_delay_ignored():
    assert parse_robots_text("User-agent: *\nCrawl-delay: soon") == ([], [], 0)


def test_rules_df_roundtrip_into_engine_annotation(spark):
    fetched = spark.createDataFrame(
        [
            ("a.example.test", GOLDEN),
            ("b.example.test", "User-agent: *\nDisallow: /video/"),
            ("c.example.test", None),
        ],
        "host string, robots_txt string",
    )
    rules = robots_rules_df(fetched)
    got = {r["host"]: r for r in rules.collect()}
    assert got["a.example.test"]["disallow_prefixes"] == ["/private/", "/tmp/"]
    assert got["a.example.test"]["crawl_delay_ms"] == 1500
    assert got["c.example.test"]["disallow_prefixes"] == []

    # the parsed table drives the engine's broadcast blocked check
    from web_scraper_spark.plans.crawl import CrawlEngine

    batch = spark.createDataFrame(
        [
            ("a.example.test", "https://a.example.test/private/1"),
            ("a.example.test", "https://a.example.test/public/1"),
            ("b.example.test", "https://b.example.test/video/9"),
        ],
        "host string, url string",
    )
    ann = CrawlEngine._annotate_robots(None, batch, rules)
    blocked = {r["url"]: r["blocked"] for r in ann.collect()}
    assert blocked == {
        "https://a.example.test/private/1": True,
        "https://a.example.test/public/1": False,
        "https://b.example.test/video/9": True,
    }
    delays = {r["url"]: r["crawl_delay_ms"] for r in ann.collect()}
    assert delays["https://a.example.test/public/1"] == 1500


def test_crawl_delay_inf_nan_negative_ignored():
    # garbage that parses as float must not produce a bogus delay or
    # crash the Arrow batch (int(inf) raises OverflowError, not ValueError)
    assert parse_robots_text("User-agent: *\nCrawl-delay: inf") == ([], [], 0)
    assert parse_robots_text("User-agent: *\nCrawl-delay: nan") == ([], [], 0)
    assert parse_robots_text("User-agent: *\nCrawl-delay: -5") == ([], [], 0)
