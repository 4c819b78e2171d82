"""Unit tests for the PG-compatibility helpers (SURVEY.md §2.9 F1/F2/F4 —
the byte-exact surrogate-key hazards)."""

from __future__ import annotations

import datetime as dt
import hashlib

from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_etl_with_dbt_spark.functions.pg_compat import (
    epoch_seconds,
    pg_concat_sep,
    pg_text,
    surrogate_key,
)


def test_pg_text_double_integral_renders_without_fraction(spark):
    df = spark.createDataFrame([(1.0, 1.5, -73.99, 0.0, None)], "a double, b double, c double, d double, e double")
    row = df.select(
        *[pg_text(F.col(c), T.DoubleType()).alias(c) for c in df.columns]
    ).first()
    assert row.a == "1"  # PG: SELECT 1.0::float8::text -> '1'
    assert row.b == "1.5"
    assert row.c == "-73.99"
    assert row.d == "0"
    assert row.e is None


def test_pg_text_timestamp_and_bool(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2015, 1, 15, 19, 5, 39), True, False)],
        "ts timestamp, t boolean, f boolean",
    )
    row = df.select(
        pg_text(F.col("ts"), T.TimestampType()).alias("ts"),
        pg_text(F.col("t"), T.BooleanType()).alias("t"),
        pg_text(F.col("f"), T.BooleanType()).alias("f"),
    ).first()
    assert row.ts == "2015-01-15 19:05:39"
    assert row.t == "true"
    assert row.f == "false"


def test_pg_concat_null_keeps_separator(spark):
    # PG concat('a','-',NULL,'-','c') = 'a--c'; Spark concat would be NULL,
    # concat_ws would drop a separator ('a-c'). We must produce 'a--c'.
    df = spark.createDataFrame([("a", None, "c")], "x string, y string, z string")
    row = df.select(pg_concat_sep([F.col("x"), F.col("y"), F.col("z")]).alias("k")).first()
    assert row.k == "a--c"


def test_surrogate_key_matches_reference_md5(spark):
    # Reproduce PG: md5(concat(1, '-', '2015-01-15 19:05:39', '-', 2.5))
    df = spark.createDataFrame(
        [(1, dt.datetime(2015, 1, 15, 19, 5, 39), 2.5)],
        "a int, ts timestamp, d double",
    )
    row = df.select(surrogate_key(df.schema, ["a", "ts", "d"]).alias("k")).first()
    expected = hashlib.md5(b"1-2015-01-15 19:05:39-2.5").hexdigest()
    assert row.k == expected


def test_surrogate_key_null_and_integral_double(spark):
    df = spark.createDataFrame(
        [(2, None, 3.0)],
        "a int, ts timestamp, d double",
    )
    row = df.select(surrogate_key(df.schema, ["a", "ts", "d"]).alias("k")).first()
    expected = hashlib.md5(b"2--3").hexdigest()  # NULL -> '', 3.0 -> '3'
    assert row.k == expected


def test_epoch_seconds_fractional(spark):
    df = spark.createDataFrame(
        [(dt.datetime(2015, 1, 1, 0, 0, 0, 500000), dt.datetime(2015, 1, 1, 0, 1, 0))],
        "a timestamp, b timestamp",
    )
    row = df.select(epoch_seconds("b", "a").alias("s")).first()
    assert row.s == 59.5  # unix_timestamp() would have truncated to 60-0=60... wrong


def test_non_ansi_cast_nulls_malformed_input(spark):
    """Engine semantics decision (SURVEY §1.3 / session.py): PG raises on
    malformed casts, Spark non-ANSI nulls them — we pin null-on-error and
    let data-quality tests catch the rows."""
    df = spark.createDataFrame([("12", "oops", "3.5x")], "a string, b string, c string")
    row = df.select(
        F.col("a").cast("int").alias("a"),
        F.col("b").cast("int").alias("b"),
        F.col("c").cast("double").alias("c"),
    ).first()
    assert row.a == 12
    assert row.b is None
    assert row.c is None
