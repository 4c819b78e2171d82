"""Graph operators over edge DataFrames.

Connected components live in ``operators.dedup.dedup_clusters`` (min-label
propagation); this module adds PageRank — the centrality step a dedup
pipeline uses to pick the REPRESENTATIVE document of a near-dup cluster
(the most-connected member, rather than min-id), and the second classic
iterative-algorithm shape in the engine next to label propagation and the
BPE merge loop.

Scale posture shared by all iterations here: per round, one join of the
rank vector against the edge list (both shuffled on node id — a real
deployment pre-partitions both by node id so rounds reuse the exchange),
one map-side-combined aggregation, and a ``localCheckpoint`` lineage cut.
Driver-side state is two scalars (node count, dangling mass) per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    num_iter: int = 15,
    damping: float = 0.85,
    undirected: bool = False,
) -> DataFrame:
    """Power-iteration PageRank over an edge list. Returns ``(id, rank)``
    with ranks summing to 1 over the nodes that appear in any edge.

    ``undirected=True`` symmetrizes the edge list first (each edge walks
    both ways) — the right setting for similarity graphs, whose pairs are
    unordered.

    Dangling nodes (no out-edges) redistribute their mass uniformly each
    round, the standard correction — without it rank leaks and the vector
    no longer sums to 1. The dangling mass is a one-scalar driver read per
    round (an aggregate of a node-count-sized frame, not corpus data).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct().localCheckpoint(eager=True)

    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(num_iter):
        with_deg = ranks.join(
            out_deg, ranks["id"] == out_deg["src"], "left"
        ).select("id", "rank", "out_deg")
        # mass of dangling nodes, redistributed uniformly this round
        dangling = (
            with_deg.where(F.col("out_deg").isNull())
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .first()[0]
        )
        contribs = (
            with_deg.where(F.col("out_deg").isNotNull())
            .join(e, with_deg["id"] == e["src"])
            .select(
                F.col("dst").alias("id"),
                (F.col("rank") / F.col("out_deg")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = (
            nodes.join(contribs, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
