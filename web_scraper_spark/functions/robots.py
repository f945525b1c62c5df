"""robots.txt parsing → the engine's broadcast rules table.

The crawl engine consumes robots rules as a broadcast table
``(host, disallow_prefixes, crawl_delay_ms)`` (plans/crawl.py
``_annotate_robots``); this module turns fetched ``robots.txt`` bodies
into that table. Reference parity: the reference scraper has no robots
handling anywhere (main_scraper.py / page_navigator.py fetch without
checking); robots support is part of this rebuild's north-star surface
("robots.txt caching as a broadcast table"), and this closes the loop
from fetched robots bodies to the cached rules.

Implemented subset of RFC 9309 (+ the de-facto ``Crawl-delay``
extension), chosen to be deterministic and auditable:

  * a group is a run of ``User-agent`` lines followed by its rules;
  * a group applies to product token ``agent`` on exact case-insensitive
    match; a ``*`` group is the fallback. A specific-agent group fully
    replaces ``*`` (RFC 9309 §2.2.1 — groups are not merged);
  * ``Disallow:`` with an empty value allows everything (no prefix
    recorded); ``Allow`` lines are parsed and returned for completeness
    (the engine's blocked check is prefix-disallow, the RFC's required
    minimum);
  * ``Crawl-delay`` is seconds (fractional ok) → ``crawl_delay_ms``;
  * comments (``#`` to end of line) are stripped; unknown directives and
    rules appearing before any ``User-agent`` line are ignored (RFC 9309
    §2.2.3 parseability rule).

Parsing runs in one scalar pandas UDF over the body column. Robots
fetches are metadata-path — one document per host, cached — never the
per-URL fetch hot path, so a (vectorized, Arrow-batched) Python parse is
the right tool where the per-URL path uses pure column expressions.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RULES_TYPE = T.StructType(
    [
        T.StructField("disallow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("allow_prefixes", T.ArrayType(T.StringType()), False),
        T.StructField("crawl_delay_ms", T.IntegerType(), False),
    ]
)


def parse_robots_text(text: str | None, agent: str = "*") -> tuple[list, list, int]:
    """Pure-Python single-document parse (shared by the UDF and tests)."""
    if not text:
        return [], [], 0
    groups: list[tuple[list[str], list[tuple[str, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[str, str]] = []
    in_agent_run = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, val = line.split(":", 1)
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur_agents and not in_agent_run:
                groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
            cur_agents.append(val.lower())
            in_agent_run = True
        elif key in ("disallow", "allow", "crawl-delay"):
            if not cur_agents:
                continue
            in_agent_run = False
            cur_rules.append((key, val))
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    wanted = agent.lower()
    rules = None
    for agents, grules in groups:  # exact-agent group wins over *
        if wanted != "*" and wanted in agents:
            rules = grules
            break
    if rules is None:
        for agents, grules in groups:
            if "*" in agents:
                rules = grules
                break
    if rules is None:
        return [], [], 0

    disallow, allow, delay_ms = [], [], 0
    for key, val in rules:
        if key == "disallow" and val:
            disallow.append(val)
        elif key == "allow" and val:
            allow.append(val)
        elif key == "crawl-delay":
            # quarantine-style: garbage values ("soon", "inf", negatives)
            # must not kill the parse or produce a bogus delay
            try:
                d = float(val)
            except ValueError:
                continue
            if math.isfinite(d) and d >= 0:
                delay_ms = int(d * 1000)
    return disallow, allow, delay_ms


def parse_robots_txt(body: Column, agent: str = "*") -> Column:
    """Column of robots.txt text → struct(disallow_prefixes,
    allow_prefixes, crawl_delay_ms) for ``agent``."""

    def _parse(texts: pd.Series) -> pd.DataFrame:
        rows = [parse_robots_text(t, agent) for t in texts]
        return pd.DataFrame(
            {
                "disallow_prefixes": [r[0] for r in rows],
                "allow_prefixes": [r[1] for r in rows],
                "crawl_delay_ms": pd.Series(
                    [r[2] for r in rows], dtype="int32"
                ),
            }
        )

    # registered without annotations: `from __future__ import annotations`
    # stringifies hints, which pandas_udf can't infer from
    udf = F.pandas_udf(_parse, RULES_TYPE)
    return udf(body)


def robots_rules_df(
    fetched: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """(host, robots.txt body) rows → the engine's ROBOTS_SCHEMA table,
    ready for ``CrawlEngine.init(..., robots=...)`` / the broadcast join.
    One row per host (robots.txt is host-scoped by definition)."""
    parsed = fetched.select(
        F.col(host_col).alias("host"), parse_robots_txt(F.col(body_col), agent).alias("r")
    )
    return parsed.select(
        "host",
        F.col("r.disallow_prefixes").alias("disallow_prefixes"),
        F.col("r.crawl_delay_ms").alias("crawl_delay_ms"),
    )
