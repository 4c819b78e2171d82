"""Batch ingestion (reference ``ETL/ETL.py`` — SURVEY.md §3.2).

The reference streams 100k-row pandas chunks into Postgres, truncating first
and stopping after 13 chunks (~1.3M rows). In Spark that whole loop is one
declarative job: a partitioned CSV scan, an optional row cap, and a single
distributed overwrite — chunking, memory bounding, and parallelism come from
the engine, not hand-rolled iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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
