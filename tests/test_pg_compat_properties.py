"""Property-style cross-engine tests for the PG-compat layer: generated
value grids run through the Spark expressions AND DuckDB equivalents in one
batch each, compared exactly. Hardens the SURVEY §7 hazard-#1 surface beyond
the hand-picked unit cases."""

from __future__ import annotations

import datetime as dt
import random

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_etl_with_dbt_spark.functions.pg_compat import pg_text
from data_etl_with_dbt_spark.suite.registry import epoch_diff_seconds


def _double_cases() -> list[float]:
    rng = random.Random(42)
    cases = [0.0, 1.0, -1.0, 0.5, -0.5, 2.675, 1.5e14, -1.5e14, 123456.789012]
    cases += [round(rng.uniform(-1e6, 1e6), rng.randint(0, 6)) for _ in range(200)]
    cases += [float(rng.randint(-10**12, 10**12)) for _ in range(50)]
    return cases


def test_pg_text_double_matches_pg_rendering_rule(spark):
    """pg_text(double) must equal the spelled-out PG rule (integral floats
    render without a fractional part) evaluated by DuckDB."""
    vals = _double_cases()
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = [r.s for r in df.select(pg_text(F.col("x"), T.DoubleType()).alias("s")).collect()]

    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " + ",".join(f"({v!r}::DOUBLE)" for v in vals) + ") v(x)")
    want = [
        r[0]
        for r in con.execute(
            """
            SELECT CASE WHEN x = trunc(x) AND abs(x) < 1e15
                        THEN CAST(CAST(x AS BIGINT) AS VARCHAR)
                        ELSE CAST(x AS VARCHAR) END
            FROM t
            """
        ).fetchall()
    ]
    assert got == want


def test_epoch_diff_matches_duckdb_bitwise(spark):
    """epoch_diff_seconds must be bit-identical to DuckDB's
    extract(epoch FROM a - b) across random microsecond timestamps."""
    rng = random.Random(7)
    base = dt.datetime(2024, 1, 1)
    stamps = [
        base + dt.timedelta(microseconds=rng.randint(0, 3 * 365 * 86400 * 10**6))
        for _ in range(300)
    ]
    df = spark.createDataFrame([(s,) for s in stamps], "ts timestamp")
    got = [
        r.e
        for r in df.select(
            epoch_diff_seconds(F.col("ts"), F.lit("2024-01-01").cast("timestamp")).alias("e")
        ).collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute(
            "SELECT extract(epoch FROM ?::TIMESTAMP - TIMESTAMP '2024-01-01')", [s]
        ).fetchone()[0]
        for s in stamps
    ]
    import struct

    for s, g, w in zip(stamps, got, want):
        assert struct.pack(">d", g) == struct.pack(">d", w), (s, g, w)


def test_pg_concat_null_positions(spark):
    """Every NULL position pattern keeps its separators (PG concat)."""
    from data_etl_with_dbt_spark.functions.pg_compat import pg_concat_sep

    rows = [
        ("a", "b", "c", "a-b-c"),
        (None, "b", "c", "-b-c"),
        ("a", None, "c", "a--c"),
        ("a", "b", None, "a-b-"),
        (None, None, None, "--"),
    ]
    df = spark.createDataFrame([(x, y, z) for x, y, z, _ in rows], "x string, y string, z string")
    got = [
        r.k
        for r in df.select(
            pg_concat_sep([F.col("x"), F.col("y"), F.col("z")]).alias("k")
        ).collect()
    ]
    assert got == [want for *_, want in rows]


def test_ephemeral_materialization_inlines(spark):
    """'ephemeral' models never hit the catalog — downstream plans inline
    them (dbt ephemeral CTE semantics)."""
    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    reg = ModelRegistry()
    reg.add_source("src", lambda s: s.range(10))

    @reg.model(name="eph", materialized="ephemeral")
    def eph(ctx):
        return ctx.source("src").withColumn("y", F.col("id") * 2)

    @reg.model(name="final_v", materialized="view", deps=["eph"])
    def final_v(ctx):
        return ctx.ref("eph").where(F.col("y") > 10)

    out = reg.run(spark)
    assert out["final_v"].count() == 4
    assert not spark.catalog.tableExists("eph")
    assert "eph" not in [t.name for t in spark.catalog.listTables()]
