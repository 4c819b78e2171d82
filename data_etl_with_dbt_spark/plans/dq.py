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
    #: dbt severity: a failing 'warn' test reports but does not gate the run
    severity: str = "error"
    #: set when store_failures persisted the violation rows
    failures_table: str | None = None

    @property
    def blocking(self) -> bool:
        """True only for a FAILING test at severity 'error' — the dbt gate:
        warn-severity failures surface in reports but never stop a run."""
        return (not self.passed) and self.severity == "error"


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


def accepted_values(
    df: DataFrame, column: str, values: list, flag_nulls: bool = False
) -> DataFrame:
    """dbt built-in `accepted_values`: violations outside the allowed set.

    dbt's compiled form is ``WHERE column NOT IN (values)``, which PASSES
    NULLs (three-valued logic; ``not_null`` is the separate test) — so a
    nullable enum declared with this test must not spuriously fail a port.
    ``flag_nulls=True`` opts in to treating NULL as a violation for
    pipelines that want one test to cover both."""
    outside = ~F.col(column).isin(values)
    if flag_nulls:
        return df.where(outside | F.col(column).isNull())
    return df.where(outside)


def relationships(df: DataFrame, column: str, to: DataFrame, field: str) -> DataFrame:
    """dbt built-in `relationships` (referential integrity): violations are
    non-null FK values with no matching PK — a broadcast-able left-anti join."""
    return (
        df.where(F.col(column).isNotNull())
        .join(to.select(F.col(field).alias(column)).distinct(), on=column, how="left_anti")
    )


def run_test(
    test_fn,
    df: DataFrame,
    column: str,
    model: str = "",
    severity: str = "error",
    store_failures: bool = False,
    **kwargs,
) -> TestResult:
    """Run one test. dbt-parity knobs:

    * ``severity='warn'`` — a failure reports (``passed=False``) but
      ``blocking`` stays False, so orchestration continues (dbt severity).
    * ``store_failures=True`` — persist the violation rows to an audit
      table ``dq_failures__<model>__<test>__<column>`` (dbt
      store_failures); written ONLY when the test fails, so the passing
      path still costs one ``limit(1)`` probe.
    """
    if severity not in ("error", "warn"):
        raise ValueError(f"severity must be 'error' or 'warn', got {severity!r}")
    violations = test_fn(df, column, **kwargs)
    passed = violations.limit(1).isEmpty()
    failures_table = None
    if store_failures and not passed:
        from data_etl_with_dbt_spark.sources.io import write_table

        safe = lambda x: "".join(ch if ch.isalnum() else "_" for ch in x)
        failures_table = (
            f"dq_failures__{safe(model or 'adhoc')}__"
            f"{safe(test_fn.__name__)}__{safe(column)}"
        )
        write_table(violations, failures_table, mode="overwrite")
    return TestResult(
        model=model,
        column=column,
        test=test_fn.__name__,
        passed=passed,
        violations=violations,
        severity=severity,
        failures_table=failures_table,
    )


def check_source_freshness(
    df: DataFrame,
    loaded_at_col: str,
    warn_after_minutes: float,
    error_after_minutes: float,
    now=None,
) -> dict:
    """dbt source-freshness check: age of ``max(loaded_at)`` against
    warn/error thresholds → status 'pass' | 'warn' | 'error' (an empty
    source is 'error' — no data is the stalest possible state). The scan is
    a single MAX aggregate — at scale parquet footer stats answer it
    without reading data pages. ``now`` is injectable for determinism."""
    if now is None:
        # Both clocks must come from the same engine: PySpark collects
        # timestamps as naive datetimes in the DRIVER's local timezone, so
        # comparing them against a Python-side UTC "now" skews the age by
        # the UTC offset on any non-UTC driver. Compute the age entirely
        # inside Spark instead (same session timezone on both operands).
        row = df.agg(
            F.max(loaded_at_col).alias("m"),
            (
                (
                    F.unix_micros(F.current_timestamp())
                    - F.unix_micros(F.max(loaded_at_col).cast("timestamp"))
                )
                / 60_000_000.0
            ).alias("age"),
        ).first()
        max_loaded, age = row["m"], row["age"]
        if max_loaded is None:
            return {"status": "error", "max_loaded_at": None, "age_minutes": None}
    else:
        row = df.agg(F.max(loaded_at_col).alias("m")).first()
        max_loaded = row["m"]
        if max_loaded is None:
            return {"status": "error", "max_loaded_at": None, "age_minutes": None}
        age = (now - max_loaded).total_seconds() / 60.0
    status = (
        "error" if age >= error_after_minutes
        else "warn" if age >= warn_after_minutes
        else "pass"
    )
    return {"status": status, "max_loaded_at": max_loaded, "age_minutes": age}


def quarantine(df: DataFrame, rules: list[tuple[str, "F.Column"]]) -> DataFrame:
    """Annotate every row with which DQ rules it FAILS: adds ``dq_reasons``
    (comma-joined failed-rule names in declaration order, '' when clean)
    and ``dq_ok``. The ETL quarantine pattern — instead of silently
    filtering bad rows, route them to a reject table with machine-readable
    reasons so upstream producers get actionable feedback.

    One projection, no shuffle, scan-parallel at any scale. Rules are
    (name, predicate-that-GOOD-rows-satisfy); NULL predicate results count
    as failures (a rule that cannot evaluate did not pass). Split with
    ``where(dq_ok)`` / ``where(~dq_ok)`` — two consumers of one scan, which
    parquet re-reads per consumer with each side's filter pushed down."""
    reason_cols = [
        F.when(~F.coalesce(pred, F.lit(False)), F.lit(name)) for name, pred in rules
    ]
    reasons = F.concat_ws(
        ",", F.filter(F.array(*reason_cols), lambda r: r.isNotNull())
    )
    return df.withColumn("dq_reasons", reasons).withColumn(
        "dq_ok", F.col("dq_reasons") == F.lit("")
    )


_BENFORD = {
    1: 0.3010299956639812, 2: 0.17609125905568124, 3: 0.12493873660829992,
    4: 0.09691001300805642, 5: 0.07918124604762482, 6: 0.06694678963061322,
    7: 0.05799194697768673, 8: 0.05115252244738129, 9: 0.04575749056067514,
}


def benford_check(df: DataFrame, column: str) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column vs
    Benford's law — the classic screen for fabricated or truncated data
    (naturally-occurring multi-magnitude amounts follow
    P(d) = log10(1 + 1/d); padded defaults, capped values, or synthetic
    fills show up as spikes). Output: one row per digit 1-9 with observed
    count/share, the expected share, and the absolute deviation.

    Determinism: the digit comes from the FIRST CHARACTER OF THE INTEGER
    PART'S STRING — integer rendering is identical across engines, where a
    ``floor(log10(x))`` spelling would hang the digit on libm rounding at
    power-of-ten boundaries. Shares are one IEEE division of exact counts;
    expected shares are pasted double literals (same parse both engines).
    One map-side-combined 9-group aggregation; the total broadcasts back."""
    digits = (
        df.where(F.col(column).isNotNull() & (F.col(column) > 0))
        .select(
            F.substring(
                F.floor(F.col(column)).cast("bigint").cast("string"), 1, 1
            )
            .cast("int")
            .alias("digit")
        )
        .where(F.col("digit") >= 1)  # |x| < 1 has integer part '0': excluded
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # two consumers: total + per-digit rows
    )
    total = digits.agg(F.sum("n").cast("bigint").alias("__total"))
    expected = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )
    return (
        digits.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            (F.col("n").cast("double") / F.col("__total").cast("double")).alias(
                "share"
            ),
            expected[F.col("digit")].alias("expected_share"),
        )
        .withColumn(
            "abs_dev",
            F.abs(F.col("share") - F.col("expected_share")),
        )
        .orderBy("digit")
    )


_MASK_STRATEGIES = ("hash", "partial", "null", "bucket")


def apply_masking_policy(df: DataFrame, policy: dict) -> DataFrame:
    """Column-level masking (the warehouse governance surface — Snowflake
    masking policies / BigQuery column-level security — as a projection the
    engine owns): ``policy`` maps column → strategy:

    * ``'hash'``    — md5 of the string rendering: joinable/groupable
      pseudonym, original unrecoverable
    * ``'partial'`` — last 4 characters kept, the rest ``*`` (audit-
      friendly display form)
    * ``'null'``    — removed outright (type preserved)
    * ``'bucket'``  — numeric → power-of-ten bucket floor (coarse analytics
      without point values)

    Pure projection: no shuffle, pushdown-transparent for untouched
    columns, and the masked view is a DataFrame — materialize it, grant it,
    or ref() it like any model. Unknown strategies/columns raise at build
    time, not silently pass PII through."""
    unknown_cols = sorted(set(policy) - set(df.columns))
    if unknown_cols:
        raise ValueError(f"masking policy names absent columns: {unknown_cols}")
    out = []
    for f in df.schema.fields:
        strat = policy.get(f.name)
        c = F.col(f.name)
        if strat is None:
            out.append(c)
        elif strat == "hash":
            out.append(F.md5(c.cast("string")).alias(f.name))
        elif strat == "partial":
            # pure Column API: an F.expr with the interpolated column name
            # breaks on names needing backtick quoting (spaces, keywords)
            s = c.cast("string")
            masked = F.concat(
                F.repeat(F.lit("*"), F.greatest(F.length(s) - F.lit(4), F.lit(0))),
                F.substring(s, -4, 4),
            )
            out.append(masked.alias(f.name))
        elif strat == "null":
            out.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif strat == "bucket":
            out.append(
                (F.floor(c / F.lit(1000)) * F.lit(1000))
                .cast(f.dataType.simpleString())
                .alias(f.name)
            )
        else:
            raise ValueError(
                f"unknown masking strategy {strat!r} for {f.name!r}; "
                f"supported: {_MASK_STRATEGIES}"
            )
    return df.select(*out)
