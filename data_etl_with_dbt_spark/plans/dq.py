"""Declarative data-quality test framework (the dbt test surface).

Protocol (dbt generic-test contract, SURVEY.md §2.12): a test is a function
``(df, column, **params) -> violations DataFrame``; the test **passes iff the
violation query returns zero rows**. Built-ins ``not_null`` and ``unique``
mirror dbt's (reference ``models/schema.yml:14-27``); ``positive`` and
``speed_limit`` mirror the reference's custom Jinja macros
(``macros/custom_positive_test.sql:1-5``, ``macros/custom_speed_limit.sql:1-5``)
as plain Python callables — the engine's "macro system" is Python.

Scale note: pass/fail uses ``.limit(1).isEmpty()`` so a passing test reads
only until the first violation could exist (filter pushed to the scan);
violation counts are computed lazily only when a report asks for them.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TestResult:
    model: str
    column: str
    test: str
    passed: bool
    violations: DataFrame  # lazy; .count() it only if you need the number


def not_null(df: DataFrame, column: str) -> DataFrame:
    """dbt built-in `not_null`: violations are rows where column IS NULL."""
    return df.where(F.col(column).isNull())


def unique(df: DataFrame, column: str) -> DataFrame:
    """dbt built-in `unique`: violations are values with count(*) > 1
    (compiled form: SELECT col FROM t GROUP BY col HAVING count(*) > 1)."""
    return (
        df.groupBy(column)
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .select(column, "n")
    )


def positive(df: DataFrame, column: str) -> DataFrame:
    """Reference `custom_positive_test`: violations where col <= 0."""
    return df.where(F.col(column) <= 0)


def speed_limit(df: DataFrame, column: str, max_speed: float = 300.0) -> DataFrame:
    """Reference `custom_speed_limit`: violations where col > 300 mph."""
    return df.where(F.col(column) > F.lit(max_speed))


def accepted_values(df: DataFrame, column: str, values: list) -> DataFrame:
    """dbt built-in `accepted_values`: violations outside the allowed set."""
    return df.where(~F.col(column).isin(values) | F.col(column).isNull())


def relationships(df: DataFrame, column: str, to: DataFrame, field: str) -> DataFrame:
    """dbt built-in `relationships` (referential integrity): violations are
    non-null FK values with no matching PK — a broadcast-able left-anti join."""
    return (
        df.where(F.col(column).isNotNull())
        .join(F.broadcast(to.select(F.col(field).alias(column)).distinct()), on=column, how="left_anti")
    )


def run_test(test_fn, df: DataFrame, column: str, model: str = "", **kwargs) -> TestResult:
    violations = test_fn(df, column, **kwargs)
    return TestResult(
        model=model,
        column=column,
        test=test_fn.__name__,
        passed=violations.limit(1).isEmpty(),
        violations=violations,
    )
