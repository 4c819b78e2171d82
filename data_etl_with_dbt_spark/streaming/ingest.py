"""Streaming ingestion into managed tables — the streaming form of the
reference's batch loader (``ETL/ETL.py``), and the bridge from a stream into
the model DAG's incremental materialization.

``foreachBatch`` gives each micro-batch to a plain batch function, so the
same dedup/merge logic the DAG runner uses for incremental models applies
verbatim: append only rows whose key isn't present. Exactly-once at the
table level comes from the checkpoint (offsets) + idempotent merge (keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.sources.io import write_table


def append_new_keys(spark: SparkSession, batch_df: DataFrame, table: str, unique_key: str) -> None:
    """Idempotent micro-batch merge: anti-join the batch against existing
    keys, append the remainder. Re-delivered batches (checkpoint replay)
    become no-ops — the streaming-safe version of the reference's
    truncate-then-append idempotency.

    A warehouse directory from a PREVIOUS session is re-registered before
    the existence check: the in-memory catalog dies with the session while
    the stream's checkpoint survives, so without this a restarted stream's
    first batch would take the create-with-overwrite branch and clobber
    every previously ingested row (and the checkpoint would prevent their
    re-delivery — permanent loss). Same pattern as plans/monitor.

    The anti-join reads the very table the batch then appends to — the
    repo's read-then-append lineage trap — so the fresh rows are pinned
    with localCheckpoint(eager=True) before the write: a task retry that
    recomputed the anti-join from the directory AFTER the append landed
    would see the batch's own rows and silently drop them."""
    from data_etl_with_dbt_spark.plans.monitor import _ensure_registered

    _ensure_registered(spark, table)
    if spark.catalog.tableExists(table):
        existing = spark.table(table).select(unique_key)
        fresh = (
            batch_df.dropDuplicates([unique_key])
            .join(existing, unique_key, "left_anti")
            .localCheckpoint(eager=True)
        )
        fresh.write.mode("append").format("parquet").saveAsTable(table)
    else:
        write_table(batch_df.dropDuplicates([unique_key]), table, mode="overwrite")


def stream_to_incremental_table(
    stream_df: DataFrame,
    table: str,
    unique_key: str,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Wire a stream into an incrementally-maintained table. Returns the
    started StreamingQuery (caller awaits/stops)."""
    spark = stream_df.sparkSession

    def process(batch_df: DataFrame, batch_id: int) -> None:
        append_new_keys(spark, batch_df, table, unique_key)

    writer = (
        stream_df.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
