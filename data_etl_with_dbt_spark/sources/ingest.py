"""Batch ingestion (reference ``ETL/ETL.py`` — SURVEY.md §3.2).

The reference streams 100k-row pandas chunks into Postgres, truncating first
and stopping after 13 chunks (~1.3M rows). In Spark that whole loop is one
declarative job: a partitioned CSV scan, an optional row cap, and a single
distributed overwrite — chunking, memory bounding, and parallelism come from
the engine, not hand-rolled iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_etl_with_dbt_spark.sources.io import read_csv, write_table


def ingest_csv(
    spark: SparkSession,
    path: str,
    table: str,
    schema: T.StructType | None = None,
    row_cap: int | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """CSV → managed table (reference S1-S4 + O3 in one job).

    ``row_cap`` reproduces the reference's 13-chunk ≈ 1.3M-row cap
    (``ETL/ETL.py:50-54``); like the reference's, the cap is an arbitrary
    subset (no ordering), so downstream must not depend on *which* rows.
    ``mode='overwrite'`` is the reference's TRUNCATE-then-append
    (``ETL/ETL.py:45,52``) as one atomic operation.
    """
    df = read_csv(spark, path, schema=schema)
    if row_cap is not None:
        df = df.limit(row_cap)
    write_table(df, table, mode=mode)
    return spark.table(table)


def ingest_csv_quarantine(
    spark: SparkSession,
    path: str,
    table: str,
    schema: T.StructType,
    quarantine_table: str | None = None,
    mode: str = "overwrite",
) -> tuple[DataFrame, DataFrame]:
    """CSV ingest with corrupt-row quarantine instead of silent nulling:
    rows that fail the schema land in ``<table>_quarantine`` with their raw
    line intact for replay/debugging, clean rows in ``table``. The
    production answer to the reference's pandas loop silently coercing bad
    rows (``ETL/ETL.py:48-54``) — at 100 TB you can't eyeball the load.

    One PERMISSIVE scan captures failed lines in a corrupt-record column;
    the split is two filters over the same cached scan (Spark disallows
    filtering the corrupt column on an uncached frame — it would have to
    re-parse). Returns (clean, quarantined).
    """
    corrupt = "_corrupt_record"
    full = T.StructType(list(schema.fields) + [T.StructField(corrupt, T.StringType())])
    raw = (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt)
        .csv(path)
        .cache()
    )
    clean = raw.where(F.col(corrupt).isNull()).drop(corrupt)
    bad = raw.where(F.col(corrupt).isNotNull()).select(
        F.col(corrupt).alias("raw_line")
    )
    write_table(clean, table, mode=mode)
    write_table(bad, quarantine_table or f"{table}_quarantine", mode=mode)
    raw.unpersist()
    return spark.table(table), spark.table(quarantine_table or f"{table}_quarantine")
