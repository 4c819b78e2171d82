"""Driver-protocol mimic: run every suite query on Spark AND its DuckDB
oracle on the same parquet, then compare row count, column names, and values
order-insensitively — exact for strings/ints/decimals/timestamps, bit-exact
for doubles (the suite's determinism rules claim bit-identity; this test
enforces the claim)."""

from __future__ import annotations

import decimal
import math

import pandas as pd
import pytest

from data_etl_with_dbt_spark.suite import QUERIES

ORACLE_QUERIES = [name for name, q in sorted(QUERIES.items()) if q.oracle]
ROWS_ONLY_QUERIES = [name for name, q in sorted(QUERIES.items()) if not q.oracle]


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        vals = df[c]
        if vals.dtype == object:
            df[c] = vals.map(
                lambda v: str(v) if isinstance(v, decimal.Decimal) else v
            )
        # datetimes → ISO strings so tz-naive representations compare equal
        if pd.api.types.is_datetime64_any_dtype(vals):
            df[c] = vals.astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str):
    assert sorted(spark_pdf.columns) == sorted(duck_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(duck_pdf.columns)}"
    )
    assert len(spark_pdf) == len(duck_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(duck_pdf)}"
    )
    s = canonicalize(spark_pdf)
    d = canonicalize(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(dv):
            both_nan = sv.isna() & dv.isna()
            eq = (sv == dv) | both_nan
        else:
            eq = (sv.isna() & dv.isna()) | (sv.astype(str) == dv.astype(str))
        if not eq.all():
            bad = (~eq).idxmax()
            raise AssertionError(
                f"{name}: column {c} differs at canonical row {bad}: "
                f"spark={sv[bad]!r} duck={dv[bad]!r} "
                f"({int((~eq).sum())}/{len(eq)} rows differ)"
            )


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, duck, name):
    from tests.conftest import SF_DIR

    q = QUERIES[name]
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    from tests.conftest import SF_DIR

    q = QUERIES[name]
    df = q.fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_harness_detects_value_mismatch(spark, duck):
    """Meta-test: the comparator must actually fail on wrong values — guards
    against a vacuous canonicalization."""
    from tests.conftest import SF_DIR

    q = QUERIES["q1_pricing_summary"]
    spark_pdf = q.fn(spark, SF_DIR).toPandas()
    duck_pdf = duck.execute(q.oracle).df()
    tampered = spark_pdf.copy()
    tampered.loc[0, "sum_qty"] = tampered.loc[0, "sum_qty"] + 1.0
    with pytest.raises(AssertionError):
        assert_frames_match(tampered, duck_pdf, "tampered")
    dropped = spark_pdf.iloc[1:].reset_index(drop=True)
    with pytest.raises(AssertionError):
        assert_frames_match(dropped, duck_pdf, "dropped-row")
