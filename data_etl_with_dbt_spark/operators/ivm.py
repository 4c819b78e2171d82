"""Incremental view maintenance (IVM) for join views: given insert-only
deltas of the base tables, compute the exact delta of the join without
rescanning the bases' full cross product.

The algebra (bag semantics, inserts only):

    (A ∪ ΔA) ⋈ (B ∪ ΔB)  =  A⋈B  ∪  ΔA⋈B  ∪  A⋈ΔB  ∪  ΔA⋈ΔB

so the view's delta is the last three terms — each a join with at least
one delta side, which at 100 TB means two broadcast-ish joins (deltas are
batch-sized) plus one delta×delta join (tiny). The old base snapshots are
scanned once each per refresh; the materialized view itself is appended,
never rebuilt. Chain the result into :func:`relational.additive_merge` and
an aggregate over the join maintains incrementally too (delta rows →
partial sums → rollup merge), which is the standard IVM composition for
SUM/COUNT views.

Deletions/updates need retraction rows (signed multiplicities) — out of
scope here by contract; the CDC path (``apply_cdc`` + snapshot rewrite)
covers update-heavy tables, IVM covers append-only facts, and the two are
asserted equivalent on inserts in tests/test_ivm.py."""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_delta(
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on,
    how: str = "inner",
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Exact delta of the inner-join view for insert-only base deltas.

    ``on`` is anything ``DataFrame.join`` accepts (column list or
    expression). Only ``how='inner'`` is supported: outer joins are not
    incrementally maintainable from insert deltas alone (a new B row must
    RETRACT a previously-emitted null-padded A row), so asking for one
    raises instead of silently corrupting the view."""
    if how != "inner":
        raise ValueError(
            f"join_delta maintains inner joins only (got how={how!r}); "
            "outer joins need retractions — rebuild or use the CDC path"
        )
    da = F.broadcast(delta_a) if broadcast_deltas else delta_a
    db = F.broadcast(delta_b) if broadcast_deltas else delta_b
    return (
        a_old.join(db, on, "inner")
        .unionByName(da.join(b_old, on, "inner"))
        .unionByName(da.join(db, on, "inner"))
    )


def refresh_join_view(
    spark,
    view_path: str,
    a_old: DataFrame,
    delta_a: DataFrame,
    b_old: DataFrame,
    delta_b: DataFrame,
    on,
    broadcast_deltas: bool = True,
) -> DataFrame:
    """Append the join delta to a parquet-materialized view and return the
    refreshed view. First call (no view at ``view_path``) materializes the
    full join of the CURRENT bases plus deltas.

    The delta is ``localCheckpoint``ed before the append: the plan reads
    base snapshots and then writes to a path — the repo's read-then-append
    lineage rule (a task retry must not recompute against post-append
    state)."""
    from pyspark.errors import AnalysisException

    delta = join_delta(
        a_old, delta_a, b_old, delta_b, on, broadcast_deltas=broadcast_deltas
    )
    try:
        existing = spark.read.parquet(view_path)
        existing.limit(1).collect()
    except AnalysisException:
        full = a_old.unionByName(delta_a).join(
            b_old.unionByName(delta_b), on, "inner"
        )
        full.write.mode("overwrite").parquet(view_path)
        return spark.read.parquet(view_path)
    delta.localCheckpoint(eager=True).write.mode("append").parquet(view_path)
    return spark.read.parquet(view_path)


def agg_view_delta(
    join_delta_df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
) -> DataFrame:
    """Partial-aggregate a join delta for the additive rollup composition:
    the output merges into the materialized aggregate with
    :func:`relational.additive_merge` (SUM/COUNT views only — MIN/MAX are
    not maintainable under inserts-with-retractions and AVG should be
    stored as sum+count)."""
    return join_delta_df.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in sum_cols],
        F.count(F.lit(1)).cast("bigint").alias("__delta_rows"),
    )
