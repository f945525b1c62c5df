"""Connected components over a near-duplicate pair graph.

The step after any pairwise dedup (MinHash/LSH, SimHash, embedding
cosine): pairs say "A ~ B", but a training-data pipeline needs *clusters*
("keep one canonical doc per duplicate group"), and duplicate relations
are transitive only through the graph — A~B, B~C puts A and C in one
cluster even when the A-C pair was never emitted.

Algorithm: distributed min-label propagation.  Every node starts labeled
with its own id; each round, a node adopts the minimum label among itself
and its neighbors; converged when a round changes nothing.  Rounds needed
= graph diameter.  Near-dup clusters produced by LSH banding are
quasi-cliques (every member shares a band bucket with most others), so
diameter is small — 2-3 rounds in practice regardless of corpus size.
For adversarial long-chain graphs the large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
halves round count; not needed for the quasi-clique workload this engine
feeds.

Scale shape per round: one shuffle join (labels ⋈ edges on node id) + one
groupBy-min — both keyed on node id, so a fixed ``repartition`` on node id
lets AQE reuse the exchange across rounds.  Lineage is cut every round
with ``localCheckpoint`` (the same pattern plans/crawl.py uses for its
micro-batch state) so the plan does not grow with iteration count.
Convergence is detected with a bounded aggregate (count of changed
labels), never a collect of node data.

Reference parity: the reference scraper dedups per-URL only (seen-set,
parser.py's in-page set) and has no transitive grouping; this operator is
part of the LLM-training-data extension surface (brief: "Deduplication …
each as a queries() entry with an oracle on the documents table").
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, canonical_id) for every node in ``pairs``.

    ``canonical_id`` is the minimum node id in the node's component —
    deterministic, engine-agnostic (same answer from any traversal
    order), and the conventional "keep the smallest id" canonical-doc
    rule.  Only nodes that appear in at least one pair are returned;
    singleton documents are by definition their own canonical and need no
    row.

    Raises ``RuntimeError`` if not converged within ``max_iter`` rounds
    (diameter > max_iter would mean the input is nothing like a dedup
    pair graph).
    """
    # undirected: propagate both ways
    fwd = pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    rev = pairs.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    edges = fwd.union(rev).distinct().localCheckpoint(eager=True)

    labels = (
        edges.select(F.col("a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min label among neighbors, per node
        neigh = (
            edges.join(labels, edges["b"] == labels["doc_id"])
            .groupBy(F.col("a").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        nxt = (
            labels.join(neigh, "doc_id", "left")
            .select(
                "doc_id",
                F.least("label", "nlabel").alias("label"),
                (F.col("nlabel") < F.col("label")).alias("__chg"),
            )
        ).localCheckpoint(eager=True)
        changed = nxt.filter(F.col("__chg")).limit(1).count()
        labels = nxt.drop("__chg")
        if changed == 0:
            return labels.select("doc_id", F.col("label").alias("canonical_id"))
    raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")


def dedup_clusters(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Canonical-doc assignment per duplicate cluster.

    Returns (doc_id, canonical_id, cluster_size, is_canonical) for every
    document that participates in at least one near-dup pair.  A pipeline
    keeps ``is_canonical`` rows (or anti-joins the rest away) to collapse
    each cluster to one representative.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    sizes = cc.groupBy("canonical_id").agg(
        F.count("*").cast("long").alias("cluster_size")
    )
    return cc.join(sizes, "canonical_id").select(
        "doc_id",
        "canonical_id",
        "cluster_size",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_canonical"),
    )
