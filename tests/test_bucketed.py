"""Bucketed-table behavior: the exchanges really disappear, point lookups
really prune buckets, and the alignment probe tells the truth. These are
plan-shape assertions — the whole value of bucketing is invisible in row
counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.sources.bucketed import (
    aligned_for_join,
    bucket_spec,
    write_bucketed,
)
from data_etl_with_dbt_spark.sources.io import read_parquet
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    orders = read_parquet(spark, f"{SF_DIR}/orders.parquet")
    customer = read_parquet(spark, f"{SF_DIR}/customer.parquet")
    write_bucketed(orders, "b_orders", "o_custkey", n_buckets=8, sort_cols="o_custkey")
    write_bucketed(customer, "b_customer", "c_custkey", n_buckets=8, sort_cols="c_custkey")
    write_bucketed(customer, "b_customer4", "c_custkey", n_buckets=4)
    yield
    for t in ("b_orders", "b_customer", "b_customer4"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force SortMergeJoin so the exchange elision is observable (the
    fixtures are broadcast-sized; 100 TB fact-fact sides are not)."""
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
    spark.conf.set("spark.sql.adaptive.enabled", old_aqe)


def test_bucketed_join_elides_both_exchanges(spark, bucketed_tables, no_broadcast):
    j = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    plan = _plan(j)
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    # same join over the raw parquet shuffles both sides
    raw = read_parquet(spark, f"{SF_DIR}/orders.parquet").join(
        read_parquet(spark, f"{SF_DIR}/customer.parquet"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    assert "Exchange hashpartitioning" in _plan(raw)
    # and the result is identical either way
    assert j.count() == raw.count()


def test_bucketed_groupby_elides_exchange(spark, bucketed_tables, no_broadcast):
    agg = spark.table("b_orders").groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange hashpartitioning" not in _plan(agg)
    raw_agg = (
        read_parquet(spark, f"{SF_DIR}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert "Exchange hashpartitioning" in _plan(raw_agg)
    assert agg.count() == raw_agg.count()


def test_point_lookup_prunes_to_one_bucket(spark, bucketed_tables):
    import contextlib
    import io

    # autoBucketedScan disables bucketed reads for plans with no join/agg
    # to gain from them — which also forfeits bucket PRUNING; a lookup-heavy
    # workload should pin it off (documented in sources/bucketed.py).
    old = spark.conf.get("spark.sql.sources.bucketing.autoBucketedScan.enabled")
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try:
        key = spark.table("b_orders").select(F.min("o_custkey")).first()[0]
        probe = spark.table("b_orders").where(F.col("o_custkey") == F.lit(int(key)))
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            probe.explain("formatted")
        assert "SelectedBucketsCount: 1 out of 8" in buf.getvalue()
        assert probe.count() > 0
    finally:
        spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", old)


def test_bucket_spec_and_alignment_probe(spark, bucketed_tables):
    spec = bucket_spec(spark, "b_orders")
    assert spec == {
        "n_buckets": 8,
        "bucket_cols": ["o_custkey"],
        "sort_cols": ["o_custkey"],
    }
    assert aligned_for_join(
        spark, "b_orders", "b_customer", ["o_custkey"], ["c_custkey"]
    ) is True
    # wrong key on a side -> not aligned
    assert aligned_for_join(
        spark, "b_orders", "b_customer", ["o_custkey"], ["c_name"]
    ) is False
    # mismatched bucket counts are not aligned
    assert aligned_for_join(spark, "b_customer", "b_customer4", ["c_custkey"]) is False


def test_unbucketed_table_has_no_spec(spark, bucketed_tables, tmp_path):
    read_parquet(spark, f"{SF_DIR}/nation.parquet").write.mode("overwrite").option(
        "path", str(tmp_path / "plain_nation")
    ).saveAsTable("plain_nation")
    try:
        assert bucket_spec(spark, "plain_nation") is None
        assert aligned_for_join(spark, "plain_nation", "b_orders", ["o_custkey"]) is False
    finally:
        spark.sql("DROP TABLE IF EXISTS plain_nation")


def test_one_file_per_bucket(spark, bucketed_tables):
    import os

    loc = (
        spark.sql("DESCRIBE TABLE EXTENDED b_orders")
        .where(F.col("col_name") == "Location")
        .first()
        .data_type
    )
    path = loc.removeprefix("file:")
    files = [f for f in os.listdir(path) if f.startswith("part-")]
    # repartition-by-bucket-cols write => exactly one file per non-empty bucket
    assert len(files) <= 8
