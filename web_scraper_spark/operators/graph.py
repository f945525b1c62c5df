"""PageRank over a link graph — crawl-priority scoring.

The frontier engine schedules by a priority column (plans/crawl.py W2);
on a real web corpus that priority IS link authority: PageRank over the
crawl's discovered link graph is the canonical way to decide which of
10^10 frontier URLs to fetch next (the reference hardcodes "page N
descending", main_scraper.py:547-614 — a special case of a priority
score).  This operator computes the score a production frontier would
feed back into the schedule.

Algorithm: fixed-iteration power method (teleport + damped neighbor
mass).  Per round the plan is one join (ranks ⋈ edges on src) + one
groupBy-sum on dst + one left join back onto the node set — every step
keyed on node id, no full-graph materialization on the driver, lineage
cut per round with ``localCheckpoint`` exactly like
operators/clustering.py.  A fixed iteration count (not a convergence
loop) keeps the result a pure deterministic function of the input so an
external oracle can replay it.

Scale shape at 10^10 edges: the per-round cost is two shuffles keyed on
node id; pre-partitioning ``edges`` by src (and letting AQE reuse the
exchange) amortizes the big side, and the rank table is O(nodes) —
exactly the Pregel-style PageRank every large-graph system runs.
Dangling mass: this variant expects every node to have out-degree ≥ 1
(guaranteed by the synthetic graph in analytics.q_pagerank); nodes with
no IN-links are fine (they keep the teleport share).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 8,
    damping: float = 0.85,
    node_col: str = "node_id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node_id, pr) after ``n_iter`` power-method rounds.

    ``nodes`` must hold every vertex (one column ``node_col``); ``edges``
    is the directed link set.  Every node must appear as a source in
    ``edges`` (no dangling-mass redistribution — see module docstring).
    Arithmetic shape is pinned (one division per edge, teleport added
    after the damped sum) so an ANSI-SQL replay produces bit-equal
    doubles up to summation order.
    """
    n = nodes.count()
    teleport = (1.0 - damping) / n
    deg = edges.groupBy(src).agg(F.count("*").alias("deg"))
    ed = (
        edges.join(deg, src)
        .select(F.col(src).alias("__src"), F.col(dst).alias("__dst"), "deg")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select(
        F.col(node_col).alias("__node"), (F.lit(1.0) / n).alias("pr")
    ).localCheckpoint(eager=True)

    for _ in range(n_iter):
        contrib = (
            ed.join(ranks, ed["__src"] == ranks["__node"])
            .groupBy(F.col("__dst").alias("__node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("contrib"))
        )
        ranks = (
            ranks.select("__node")
            .join(contrib, "__node", "left")
            .select(
                "__node",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select(F.col("__node").alias(node_col), "pr")


def hits(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = 4,
    node_col: str = "node_id",
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node_id, hub, authority) after ``n_iter`` HITS rounds (Kleinberg)
    — the crawl-frontier complement to :func:`pagerank`: AUTHORITY ranks
    fetch targets, HUB ranks the listing pages a discovery plan should
    re-scan first (a high-hub page's outlinks reach many authorities —
    the reference's listing/detail split is exactly a hand-labeled
    hub/authority partition, page_navigator.py vs
    video_info_extractor.py).

    Per half-round: one join keyed on an endpoint + one groupBy-sum on
    the other — the same Pregel shape and lineage-cut discipline as
    pagerank. Normalization is by the MAX (not the L2/L1 norm): max is
    order-independent, so both engines divide by bit-identical scalars
    and the whole pipeline stays replayable by an unrolled-CTE oracle
    (an L2 norm would inject a full float sum whose order differs). The
    scalar max per half-round is a 1-row aggregate collect — bounded by
    design, like kmeans' centroid pull.

    Nodes with no in-links get authority 0, no out-links hub 0 (left
    joins onto the node set keep them present)."""
    ed = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).localCheckpoint(eager=True)
    h = nodes.select(
        F.col(node_col).alias("__node"), F.lit(1.0).alias("hub")
    ).localCheckpoint(eager=True)
    a = None
    for _ in range(n_iter):
        a_raw = (
            ed.join(h, ed["__src"] == h["__node"])
            .groupBy(F.col("__dst").alias("__node"))
            .agg(F.sum("hub").alias("raw"))
        )
        a_max = a_raw.agg(F.max("raw")).collect()[0][0]
        # degenerate edge set (empty, or all edges dropped — e.g. pure
        # self-links): the max aggregate is NULL (or a 0 sum) — divide by
        # 1 so every score collapses to 0 instead of float(None)/NaN
        a_den = float(a_max) if a_max else 1.0
        a = (
            nodes.select(F.col(node_col).alias("__node"))
            .join(a_raw, "__node", "left")
            .select(
                "__node",
                (F.coalesce("raw", F.lit(0.0)) / F.lit(a_den)).alias("auth"),
            )
            .localCheckpoint(eager=True)
        )
        h_raw = (
            ed.join(a, ed["__dst"] == a["__node"])
            .groupBy(F.col("__src").alias("__node"))
            .agg(F.sum("auth").alias("raw"))
        )
        h_max = h_raw.agg(F.max("raw")).collect()[0][0]
        h_den = float(h_max) if h_max else 1.0
        h = (
            nodes.select(F.col(node_col).alias("__node"))
            .join(h_raw, "__node", "left")
            .select(
                "__node",
                (F.coalesce("raw", F.lit(0.0)) / F.lit(h_den)).alias("hub"),
            )
            .localCheckpoint(eager=True)
        )
    return h.join(a, "__node").select(
        F.col("__node").alias(node_col), "hub", F.col("auth").alias("authority")
    )


def site_graph_from_pagerank(ranked: DataFrame, scale: int = 100) -> DataFrame:
    """(url, pr) rows → the site-graph shape ``CrawlEngine.init`` consumes
    (url, image_id, page, position): link authority becomes crawl
    priority, replacing the reference's hardcoded descending page order
    (main_scraper.py:547-614) with the score a production frontier uses.

    ``page`` = round(pr · n · scale): normalizing by node count puts the
    mean score at ``scale`` whatever the graph size, so the integer
    priority axis keeps resolution as the corpus grows.  Quantization —
    not a rank — on purpose: a rank-order priority needs a 10^10-row
    total sort; the quantized score needs one bounded count.
    ``position`` = 0: within equal priority the engine's crawl order
    falls through to url_hash ASC, which stays deterministic (same rule
    as functions/sitemap.site_graph_from_seeds)."""
    from ..functions.urlnorm import extract_item_id

    n = ranked.count()
    return ranked.select(
        "url",
        extract_item_id(F.col("url")).alias("image_id"),
        F.round(F.col("pr") * n * scale).cast("int").alias("page"),
        F.lit(0).alias("position"),
    )
