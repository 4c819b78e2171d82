"""The flagship core transform (reference ``core_texi.sql:8-101`` shape on
the events fixture), factored so the BATCH suite query and the STREAMING
upsert sink share one set of expression trees.

Sharing matters twice over: (a) the driver hash-matches the batch form
against DuckDB, so its expressions are pinned bit-for-bit (see
``suite/registry`` determinism rules — raw per-row doubles, never
quantized); (b) the stream-vs-batch equivalence test is only meaningful if
both paths run literally the same columns.

Stage order is semantic, not cosmetic: dedup (newest record per surrogate
key) runs BEFORE the positivity filter, so a key whose newest record fails
the filter emits NOTHING — even when an older record would have passed.
Keep-newest, then filter; the streaming sink must preserve exactly that.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import big, epoch_diff_seconds

EPOCH_BASE = "2024-01-01"


def event_surrogate_key() -> "F.Column":
    """The flagship's md5 surrogate key, with PG ``concat()`` semantics:
    PG (core_texi.sql:10-31) and DuckDB treat NULL concat parts as empty
    strings, while Spark's ``F.concat`` returns NULL for the whole key —
    which would both diverge from the oracle on NULL-bearing data AND
    collapse every NULL-keyed row into one dedup survivor (row_number
    groups NULLs together). Coalescing each part restores the reference
    semantics. Shared by the batch flagship and the streaming dedup sink
    so the two key sets can never drift."""
    return F.md5(
        F.concat(
            F.coalesce(F.col("user_id").cast("string"), F.lit("")),
            F.lit("-"),
            F.coalesce(F.col("event_type"), F.lit("")),
        )
    )


def project_events(ev: DataFrame) -> DataFrame:
    """Stage 1 — row-local projection (core_texi.sql:8-31 shape): md5
    surrogate key over the business columns, JSON prop extraction, NULL-ts
    guard. Narrow, stateless, embarrassingly parallel."""
    return ev.where(F.col("ts").isNotNull()).select(
        event_surrogate_key().alias("unique_id"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("event_type"),
        F.col("ts").alias("event_ts"),
        F.col("value"),
        F.get_json_object("props", "$.k").alias("prop_k"),
    )


def dedup_newest(projected: DataFrame) -> DataFrame:
    """Stage 2 — keep the newest record per surrogate key (core_texi.sql:
    57-62), event_id as the total tie-break so the winner is deterministic.
    One exchange on unique_id; md5 keys are uniform, no skew."""
    w = Window.partitionBy("unique_id").orderBy(
        F.desc("event_ts"), F.desc("event_id")
    )
    return (
        projected.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def finalize_events(deduped: DataFrame) -> DataFrame:
    """Stage 3 — epoch math with fractional seconds, guarded CASE
    derivation, positivity filter (core_texi.sql:64-101 shape)."""
    base = F.lit(EPOCH_BASE).cast("timestamp")
    secs = epoch_diff_seconds(F.col("event_ts"), base)
    return deduped.where(secs > 0).select(
        "unique_id",
        "event_id",
        "user_id",
        "event_type",
        "event_ts",
        "value",
        big(F.col("prop_k")).alias("prop_k"),
        # Raw doubles, deliberately unquantized: with matching expression
        # trees ((Δµs)/1e6, then /60) the bits are identical across
        # engines, whereas Spark's double→decimal cast rounds the
        # *shortest repr* (HALF_UP) and DuckDB rounds the binary value —
        # quantizing would CREATE mismatches on the µs grid.
        (secs / 60).alias("minutes_since_start"),
        F.when((F.col("value") > 0) & (secs > 0), F.col("value") / (secs / 3600))
        .otherwise(F.lit(None))
        .alias("value_per_hour"),
        (F.col("value") > 10).alias("is_high_value"),
    )


def transform_events(ev: DataFrame) -> DataFrame:
    """The full batch flagship: project → keep-newest dedup → finalize."""
    return finalize_events(dedup_newest(project_events(ev)))
