"""The reference's two-model ELT DAG, re-expressed as DataFrame transforms.

* ``raw_texi`` — schema-on-read passthrough of the ingested CSV table
  (reference ``models/raw_texi.sql:3-6``: ``SELECT * FROM source``).
* ``core_texi`` — the real transform (reference ``models/core_texi.sql:8-101``):
  md5 surrogate key over 9 business columns, 17 explicit casts,
  NULL-timestamp filter, window dedup keeping one row per key, derived
  duration/speed/long-trip columns, sanity filters (duration > 0,
  speed <= 300 mph).

Scale notes (SURVEY.md §4.2):

* The window dedup partitions by ``unique_id`` — md5 keys are near-unique so
  the exchange is uniform (no skew); at 100 TB the semantically-equivalent
  ``dropDuplicates(["unique_id"])`` (hash-agg, partial+final, no sort) is
  preferable when tie-break order is immaterial — exposed via
  ``dedup_strategy="hash"``. Default stays the faithful window form.
* All expressions are built-in Catalyst functions — the whole model compiles
  to a single whole-stage-codegen span around one shuffle.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.functions.pg_compat import epoch_seconds, surrogate_key

#: Business columns feeding the md5 surrogate key (core_texi.sql:11-30).
KEY_COLUMNS = [
    "VendorID",
    "tpep_pickup_datetime",
    "tpep_dropoff_datetime",
    "passenger_count",
    "RateCodeID",
    "payment_type",
    "dropoff_longitude",
    "dropoff_latitude",
    "fare_amount",
]

#: (source column, target name, cast type) — core_texi.sql:33-51. PG FLOAT is
#: float8, so DoubleType everywhere (never FloatType).
CASTS = [
    ("VendorID", "vendor_id", "int"),
    ("tpep_pickup_datetime", "pickup_datetime", "timestamp"),
    ("tpep_dropoff_datetime", "dropoff_datetime", "timestamp"),
    ("passenger_count", "passenger_count", "int"),
    ("trip_distance", "trip_distance", "double"),
    ("pickup_longitude", "pickup_longitude", "double"),
    ("pickup_latitude", "pickup_latitude", "double"),
    ("RateCodeID", "rate_code_id", "int"),
    ("dropoff_longitude", "dropoff_longitude", "double"),
    ("dropoff_latitude", "dropoff_latitude", "double"),
    ("payment_type", "payment_type", "int"),
    ("fare_amount", "fare_amount", "double"),
    ("extra", "extra", "double"),
    ("mta_tax", "mta_tax", "double"),
    ("tip_amount", "tip_amount", "double"),
    ("tolls_amount", "tolls_amount", "double"),
    ("improvement_surcharge", "improvement_surcharge", "double"),
    ("total_amount", "total_amount", "double"),
]

FINAL_COLUMNS = [
    "unique_id",
    "ingestion_date",
    "vendor_id",
    "pickup_datetime",
    "dropoff_datetime",
    "passenger_count",
    "trip_distance",
    "pickup_longitude",
    "pickup_latitude",
    "rate_code_id",
    "dropoff_longitude",
    "dropoff_latitude",
    "payment_type",
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "store_and_fwd_flag",
    "trip_duration_minutes",
    "avg_speed_mph",
    "is_long_trip",
]


def build_raw_taxi(source: DataFrame) -> DataFrame:
    """Staging passthrough (raw_texi.sql:5-6) — identity projection."""
    return source.select("*")


def build_core_taxi(
    raw: DataFrame,
    ingestion_date: dt.date | None = None,
    dedup_strategy: str = "window",
) -> DataFrame:
    """The core transform (core_texi.sql:8-101), column-for-column.

    ``ingestion_date`` pins ``current_date`` for deterministic tests
    (SURVEY.md §7 hazard #2); None keeps the faithful run-date stamp.
    ``dedup_strategy``: 'window' = faithful row_number dedup;
    'hash' = dropDuplicates (equivalent output set, cheaper at scale).
    """
    if dedup_strategy not in ("hash", "window"):
        # validate up front: a typo ('dropDuplicates') must not silently
        # run the slow window plan — mirror train_fare_model's check
        raise ValueError(
            f"dedup_strategy must be hash|window, got {dedup_strategy!r}"
        )
    ing = F.lit(ingestion_date).cast("date") if ingestion_date else F.current_date()

    # CTE `transformed`: key + casts + NULL-timestamp filter (sql:8-56).
    transformed = (
        raw.where(
            F.col("tpep_pickup_datetime").isNotNull()
            & F.col("tpep_dropoff_datetime").isNotNull()
        )
        .select(
            surrogate_key(raw.schema, KEY_COLUMNS).alias("unique_id"),
            ing.alias("ingestion_date"),
            *[F.col(src).cast(typ).alias(dst) for src, dst, typ in CASTS],
            F.col("store_and_fwd_flag"),
        )
    )

    # CTE `unique_records` + `row_number = 1` (sql:57-62,99): keep one row
    # per surrogate key, newest ingestion first. The reference's sort key
    # (ingestion_date) is constant within a run, so the tie-break is
    # nondeterministic in PG too — semantics preserved.
    if dedup_strategy == "hash":
        deduped = transformed.dropDuplicates(["unique_id"])
    else:
        w = Window.partitionBy("unique_id").orderBy(F.desc("ingestion_date"))
        deduped = (
            transformed.withColumn("row_number", F.row_number().over(w))
            .where(F.col("row_number") == 1)
            .drop("row_number")
        )

    # Derived columns + sanity filters (sql:86-101). EXTRACT(EPOCH ...) keeps
    # fractional seconds — epoch_seconds() preserves that.
    dur_s = epoch_seconds("dropoff_datetime", "pickup_datetime")
    speed = F.col("trip_distance") / (dur_s / 3600.0)
    return (
        deduped.withColumn("trip_duration_minutes", dur_s / 60.0)
        .withColumn(
            "avg_speed_mph",
            F.when((F.col("trip_distance") > 0) & (dur_s > 0), speed).otherwise(F.lit(None)),
        )
        .withColumn(
            "is_long_trip",
            F.when(F.col("trip_distance") > 10, F.lit(True)).otherwise(F.lit(False)),
        )
        .where((dur_s > 0) & (speed <= 300))
        .select(*FINAL_COLUMNS)
    )


def register_taxi_models(registry, source_name: str = "Texi_data"):
    """Wire the two models into a ModelRegistry (DAG edge raw→core), with the
    reference's declared tests (schema.yml:14-27)."""
    from data_etl_with_dbt_spark.plans import dq

    @registry.model(name="raw_texi", materialized="view")
    def raw_texi(ctx):
        return build_raw_taxi(ctx.source(source_name))

    @registry.model(name="core_texi", materialized="table", unique_key="unique_id", deps=["raw_texi"])
    def core_texi(ctx):
        return build_core_taxi(ctx.ref("raw_texi"))

    registry.add_test("core_texi", dq.not_null, "unique_id")
    registry.add_test("core_texi", dq.unique, "unique_id")
    registry.add_test("core_texi", dq.not_null, "trip_duration_minutes")
    registry.add_test("core_texi", dq.positive, "trip_duration_minutes")
    registry.add_test("core_texi", dq.speed_limit, "avg_speed_mph")
