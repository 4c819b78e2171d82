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
from data_etl_with_dbt_spark.materialize import materialize


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
    no longer sums to 1. The dangling mass stays INSIDE the round's plan
    (a one-row aggregate broadcast back via crossJoin), so a round is ONE
    Spark job (the eager checkpoint) with no driver round-trip — measured
    2 jobs -> 1 per round, and at cluster scale the driver sync point
    disappears from the critical path.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.unionByName(
            edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
        )
    e = e.distinct().transform(materialize, eager=True)

    nodes = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
        .transform(materialize, eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    # out-degrees are loop-invariant but referenced TWICE per round (the
    # dangling split + the contribution join) — without the checkpoint the
    # groupBy re-aggregated the edge list 2 x num_iter times (r11; no
    # cross-consumer CSE)
    out_deg = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .transform(materialize)
    )

    # A symmetrized graph has NO dangling nodes by construction: every
    # node that appears anywhere appears as a src (each edge walks both
    # ways), so the dangling mass is exactly 0.0 every round and
    # ``rank + damping * 0.0 / n`` is bit-identical to ``rank`` (both
    # addends are strictly positive — no -0.0 corner). Skipping the
    # per-round dangling scan+aggregate+broadcast halves the per-round
    # consumers of the ranks-with-degrees join (r12; interleaved mins
    # 4.33 -> 4.07 s on the similarity-graph query — the bigger saving
    # is one fewer full ranks pass per iteration at real node counts.
    # Two rejected alternatives,
    # both measured: checkpointing with_deg per round 5.16 s — one extra
    # job per round; a precomputed dangling-id semi-join 4.73 s — pays
    # the extra materialization even when the set is empty).
    dangling_possible = not undirected

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(num_iter):
        with_deg = ranks.join(
            out_deg, ranks["id"] == out_deg["src"], "left"
        ).select("id", "rank", "out_deg")
        # mass of dangling nodes, redistributed uniformly this round —
        # a one-row aggregate that rides the round's own plan (broadcast
        # crossJoin), not a driver read
        if dangling_possible:
            dangling = with_deg.where(F.col("out_deg").isNull()).agg(
                F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dang")
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
        new_ranks = nodes.join(contribs, "id", "left")
        if dangling_possible:
            new_ranks = new_ranks.crossJoin(F.broadcast(dangling))
            base_mass = (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.col("__dang") / F.lit(float(n))
            )
        else:
            base_mass = F.lit((1.0 - damping) / n)
        ranks = new_ranks.select(
            "id",
            (
                base_mass
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        ).transform(materialize, eager=True)
    return ranks


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle counts over an undirected edge list (one row per
    edge, any orientation). Canonical-ordering enumeration: orient every
    edge low→high, join e1(a,b) ⋈ e2(b,c) ⋈ e3(a,c) so each triangle
    materializes exactly once (a<b<c), then credit all three corners.

    The joins shuffle on node id; work ∝ Σ deg(v)² (the wedge count) — the
    standard distributed triangle bound. At 100 TB you pre-partition the
    edge list by node and, for skewed degree distributions, split
    high-degree nodes first (the count is unaffected: wedges through a hub
    are enumerated from the hub's sorted adjacency)."""
    e = _canonical_edges(edges, src, dst)
    return _triangle_counts_canonical(e)


def _canonical_edges(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Low→high oriented, self-loop-free, deduped edge list ``(u, v)``."""
    return (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _triangle_counts_canonical(e: DataFrame) -> DataFrame:
    """Triangle enumeration over an ALREADY-canonical edge list — shared
    with clustering_coefficients, which canonicalizes once for both its
    degree count and this (re-canonicalizing a canonical list paid a
    redundant full distinct-exchange; round-5 review)."""
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"])
    corners = (
        tri.select(F.col("a").alias("id"))
        .unionAll(tri.select(F.col("b").alias("id")))
        .unionAll(tri.select(F.col("c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


def clustering_coefficients(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Local clustering coefficient per node: C(v) = 2·T(v) / (d(v)·(d(v)−1)),
    the fraction of a node's neighbor pairs that are themselves connected —
    the classic cohesion diagnostic for a similarity/dedup candidate graph
    (high C = dense near-dup cliques, low C = hub-and-spoke false-positive
    buckets). Degree from the deduped undirected edge list; triangles from
    the shared canonical-edge enumeration; isolated-or-degree-1 nodes pin
    to 0.0."""
    e = _canonical_edges(edges, src, dst)
    # e feeds both the degree count and the triangle enumeration — cut the
    # lineage once (no cross-consumer CSE in Catalyst)
    e = e.transform(materialize)
    deg = (
        e.select(F.col("u").alias("id"))
        .unionAll(e.select(F.col("v").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = _triangle_counts_canonical(e)
    coeff = F.when(
        F.col("degree") < 2, F.lit(0.0).cast("double")
    ).otherwise(
        (F.lit(2.0) * F.col("n_triangles").cast("double"))
        / (F.col("degree") * (F.col("degree") - 1)).cast("double")
    )
    return (
        deg.join(tri, "id", "left")
        .withColumn("n_triangles", F.coalesce(F.col("n_triangles"), F.lit(0).cast("long")))
        .select("id", "degree", "n_triangles", coeff.alias("clustering_coeff"))
    )
