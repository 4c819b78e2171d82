"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

The actual suite lives in ``data_etl_with_dbt_spark/suite`` — one entry per
operator from SURVEY.md §2 plus the LLM-data-pipeline extensions; this module
is just the adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_with_dbt_spark.session import apply_engine_conf
from data_etl_with_dbt_spark.suite import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the reference's core transform shape (md5 surrogate key,
    window dedup, epoch-derived columns, CASE flags, sanity filters —
    ``core_texi.sql:8-101``) applied to the events fixture."""
    apply_engine_conf(spark)
    return QUERIES["core_transform_events"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(q):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_engine_conf(spark)
            return q.fn(spark, sf_dir)

        run.__name__ = q.name
        return run

    return {name: wrap(q) for name, q in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query; approximate (LSH-family) operators
    are intentionally omitted — each has an exact oracle-checked baseline in
    the suite (see data_etl_with_dbt_spark/suite/llm_ops.py)."""
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle}
