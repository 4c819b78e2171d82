"""Catalog-statistics surface: ANALYZE populates table/column stats, the
CBO sees row counts in EXPLAIN COST, and the stats reflect reality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.plans.stats import (
    analyze_table,
    column_stats,
    cost_of,
    enable_cbo,
    table_stats,
)
from data_etl_with_dbt_spark.sources.io import read_parquet
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def stats_table(spark):
    read_parquet(spark, f"{SF_DIR}/orders.parquet").write.mode(
        "overwrite"
    ).saveAsTable("stats_orders")
    yield "stats_orders"
    spark.sql("DROP TABLE IF EXISTS stats_orders")


def test_analyze_populates_table_stats(spark, stats_table):
    assert table_stats(spark, stats_table)["row_count"] is None  # pre-ANALYZE
    analyze_table(spark, stats_table)
    st = table_stats(spark, stats_table)
    true_rows = spark.table(stats_table).count()
    assert st["row_count"] == true_rows
    assert st["size_bytes"] > 0


def test_analyze_populates_column_stats(spark, stats_table):
    analyze_table(spark, stats_table, columns=["o_custkey", "o_orderstatus"])
    cs = column_stats(spark, stats_table, "o_orderstatus")
    assert cs["null_count"] == "0"
    assert cs["distinct_count"] is not None and int(cs["distinct_count"]) <= 3
    ck = column_stats(spark, stats_table, "o_custkey")
    assert int(ck["min"]) >= 0 and int(ck["max"]) > int(ck["min"])


def test_explain_cost_carries_row_count(spark, stats_table):
    analyze_table(spark, stats_table)
    enable_cbo(spark)
    cost = cost_of(spark.table(stats_table))
    assert cost["row_count"] == spark.table(stats_table).count()
    assert cost["size_bytes"] > 0
    # a filter shrinks the estimate, never grows it
    filtered = cost_of(spark.table(stats_table).where(F.col("o_totalprice") > 100.0))
    assert filtered["size_bytes"] <= cost["size_bytes"]


def test_pathscan_has_no_catalog_stats(spark, stats_table):
    # the operational lesson: path reads never see ANALYZE results
    cost = cost_of(read_parquet(spark, f"{SF_DIR}/orders.parquet"))
    assert cost["row_count"] is None


def test_cost_of_large_units_report_root_not_leaf(spark, stats_table):
    """Round-5 review: the unit regex stopped at TiB, so a root printing
    PiB/EiB (cross joins; 8.0 EiB is Spark's unknown-stats cap) fell
    through and a stats-bearing LEAF was reported as the root."""
    from data_etl_with_dbt_spark.plans.stats import cost_of

    # 'Join Cross, Statistics(sizeInBytes=5.7 PiB)' over two range leaves
    # that DO carry rowCount — the old regex matched the first leaf and
    # returned its 76.3 MiB / 1e7 rows as the root's
    df = spark.range(10**7).crossJoin(spark.range(10**7))
    got = cost_of(df)
    assert got["size_bytes"] >= 2**50  # PiB scale, not the leaf's MiB
    # the ROOT's rowCount (1e14 with CBO on, absent without) — never the
    # leaf's 1e7
    assert got["row_count"] in (None, 10**14)
