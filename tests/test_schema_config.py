"""dbt schema.yml-shaped declarative config → registry wiring."""

from __future__ import annotations

import datetime as dt

import pytest

from data_etl_with_dbt_spark.plans.config import apply_schema_config, register_test
from data_etl_with_dbt_spark.plans.dag import ModelRegistry
from data_etl_with_dbt_spark.models.taxi import build_core_taxi, build_raw_taxi

from tests.test_taxi_pipeline import SCHEMA, taxi_row

# The reference's schema.yml (models/schema.yml:1-27), as the parsed dict.
REFERENCE_SCHEMA = {
    "version": 2,
    "sources": [
        {"name": "Texi_data", "tables": [{"name": "Texi_data_src"}]},
    ],
    "models": [
        {
            "name": "core_texi_cfg",
            "columns": [
                {"name": "unique_id", "tests": ["not_null", "unique"]},
                {
                    "name": "trip_duration_minutes",
                    "tests": ["not_null", "custom_positive_test"],
                },
                {
                    "name": "avg_speed_mph",
                    "tests": [{"custom_speed_limit": {"max_speed": 300.0}}],
                },
            ],
        }
    ],
}


def test_reference_schema_config_end_to_end(spark):
    raw = spark.createDataFrame([taxi_row(), taxi_row(passenger_count=2)], SCHEMA)
    registry = ModelRegistry()

    @registry.model(name="core_texi_cfg", materialized="view")
    def core_texi_cfg(ctx):
        return build_core_taxi(build_raw_taxi(ctx.source("Texi_data_src")), ingestion_date=dt.date(2015, 2, 1))

    registry.add_source("Texi_data_src", lambda s: raw)
    n = apply_schema_config(registry, REFERENCE_SCHEMA)
    assert n == 5  # T1-T5

    registry.run(spark)
    results = registry.test(spark)
    assert [r.passed for r in results] == [True] * 5
    assert {(r.test, r.column) for r in results} == {
        ("not_null", "unique_id"),
        ("unique", "unique_id"),
        ("not_null", "trip_duration_minutes"),
        ("positive", "trip_duration_minutes"),
        ("speed_limit", "avg_speed_mph"),
    }


def test_unknown_test_raises():
    registry = ModelRegistry()

    @registry.model(name="m")
    def m(ctx):
        return None

    with pytest.raises(KeyError, match="unknown test"):
        apply_schema_config(
            registry,
            {"models": [{"name": "m", "columns": [{"name": "c", "tests": ["nope"]}]}]},
        )


def test_register_custom_test(spark):
    from pyspark.sql import functions as F

    def max_length(df, column, n=10):
        return df.where(F.length(column) > n)

    register_test("max_length", max_length)
    registry = ModelRegistry()
    df = spark.createDataFrame([("short",), ("also short",)], "s string")

    @registry.model(name="m2", materialized="view")
    def m2(ctx):
        return df

    apply_schema_config(
        registry,
        {"models": [{"name": "m2", "columns": [{"name": "s", "tests": [{"max_length": {"n": 15}}]}]}]},
    )
    registry.run(spark)
    results = registry.test(spark)
    assert results[0].passed
