"""Incremental view maintenance: the delta algebra is exact (view ∪ delta
== full recompute, bag semantics), the materialized refresh converges over
multiple batches, and the aggregate composition merges correctly."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.operators.ivm import (
    agg_view_delta,
    join_delta,
    refresh_join_view,
)
from data_etl_with_dbt_spark.operators.relational import additive_merge


def _counted(df, cols):
    return {tuple(r) for r in df.groupBy(*cols).count().collect()}


@pytest.fixture()
def bases(spark):
    a_old = spark.createDataFrame(
        [Row(k=1, av=10), Row(k=1, av=11), Row(k=2, av=20), Row(k=9, av=90)]
    )
    b_old = spark.createDataFrame([Row(k=1, bv=100), Row(k=3, bv=300)])
    da = spark.createDataFrame([Row(k=2, av=21), Row(k=3, av=30)])
    db = spark.createDataFrame([Row(k=1, bv=101), Row(k=2, bv=200), Row(k=3, bv=301)])
    return a_old, da, b_old, db


def test_join_delta_is_exact_bag_difference(spark, bases):
    a_old, da, b_old, db = bases
    old_view = a_old.join(b_old, "k")
    full = a_old.unionByName(da).join(b_old.unionByName(db), "k")
    delta = join_delta(a_old, da, b_old, db, "k")
    cols = ["k", "av", "bv"]
    assert _counted(old_view.unionByName(delta.select(*old_view.columns)), cols) == _counted(full, cols)
    # and the delta itself is disjoint-exact: |delta| == |full| - |old|
    assert delta.count() == full.count() - old_view.count()


def test_join_delta_rejects_outer(spark, bases):
    a_old, da, b_old, db = bases
    with pytest.raises(ValueError, match="inner joins only"):
        join_delta(a_old, da, b_old, db, "k", how="left")


def test_refresh_converges_over_batches(spark, bases, tmp_path):
    a_old, da, b_old, db = bases
    path = str(tmp_path / "view")
    # batch 0: full materialization of (a_old ∪ da) ⋈ (b_old ∪ db)
    v0 = refresh_join_view(spark, path, a_old, da, b_old, db, "k")
    a1, b1 = a_old.unionByName(da), b_old.unionByName(db)
    assert v0.count() == a1.join(b1, "k").count()
    # batch 1: fresh deltas against the grown bases
    da2 = spark.createDataFrame([Row(k=9, av=91)])
    db2 = spark.createDataFrame([Row(k=9, bv=900)])
    v1 = refresh_join_view(spark, path, a1, da2, b1, db2, "k")
    full = a1.unionByName(da2).join(b1.unionByName(db2), "k")
    assert _counted(v1, ["k", "av", "bv"]) == _counted(full, ["k", "av", "bv"])


def test_agg_composition_matches_full_recompute(spark, bases):
    a_old, da, b_old, db = bases
    old_view = a_old.join(b_old, "k")
    snapshot = old_view.groupBy("k").agg(
        F.sum("av").alias("av"), F.count(F.lit(1)).cast("bigint").alias("__delta_rows")
    )
    delta = agg_view_delta(join_delta(a_old, da, b_old, db, "k"), ["k"], ["av"])
    merged = additive_merge(snapshot, delta, ["k"], ["av", "__delta_rows"])
    full = (
        a_old.unionByName(da)
        .join(b_old.unionByName(db), "k")
        .groupBy("k")
        .agg(F.sum("av").alias("av"), F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    got = {tuple(r) for r in merged.select("k", "av", "__delta_rows").collect()}
    want = {tuple(r) for r in full.collect()}
    assert got == want


def test_delta_plan_broadcasts_delta_sides(spark, bases):
    a_old, da, b_old, db = bases
    plan = (
        join_delta(a_old, da, b_old, db, "k")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
