"""dbt schema.yml-shaped declarative config → registry wiring."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.plans.config import apply_schema_config, register_test
from data_etl_with_dbt_spark.plans.dag import ModelRegistry
from data_etl_with_dbt_spark.models.taxi import build_core_taxi, build_raw_taxi

from tests.test_taxi_pipeline import SCHEMA, taxi_row

# The reference's schema.yml (models/schema.yml:1-27), as the parsed dict.
REFERENCE_SCHEMA = {
    "version": 2,
    "sources": [
        {"name": "Texi_data", "tables": [{"name": "Texi_data_src"}]},
    ],
    "models": [
        {
            "name": "core_texi_cfg",
            "columns": [
                {"name": "unique_id", "tests": ["not_null", "unique"]},
                {
                    "name": "trip_duration_minutes",
                    "tests": ["not_null", "custom_positive_test"],
                },
                {
                    "name": "avg_speed_mph",
                    "tests": [{"custom_speed_limit": {"max_speed": 300.0}}],
                },
            ],
        }
    ],
}


def test_reference_schema_config_end_to_end(spark):
    raw = spark.createDataFrame([taxi_row(), taxi_row(passenger_count=2)], SCHEMA)
    registry = ModelRegistry()

    @registry.model(name="core_texi_cfg", materialized="view")
    def core_texi_cfg(ctx):
        return build_core_taxi(build_raw_taxi(ctx.source("Texi_data_src")), ingestion_date=dt.date(2015, 2, 1))

    registry.add_source("Texi_data_src", lambda s: raw)
    n = apply_schema_config(registry, REFERENCE_SCHEMA)
    assert n == 5  # T1-T5

    registry.run(spark)
    results = registry.test(spark)
    assert [r.passed for r in results] == [True] * 5
    assert {(r.test, r.column) for r in results} == {
        ("not_null", "unique_id"),
        ("unique", "unique_id"),
        ("not_null", "trip_duration_minutes"),
        ("positive", "trip_duration_minutes"),
        ("speed_limit", "avg_speed_mph"),
    }


def test_unknown_test_raises():
    registry = ModelRegistry()

    @registry.model(name="m")
    def m(ctx):
        return None

    with pytest.raises(KeyError, match="unknown test"):
        apply_schema_config(
            registry,
            {"models": [{"name": "m", "columns": [{"name": "c", "tests": ["nope"]}]}]},
        )


def test_register_custom_test(spark):
    from pyspark.sql import functions as F

    def max_length(df, column, n=10):
        return df.where(F.length(column) > n)

    register_test("max_length", max_length)
    registry = ModelRegistry()
    df = spark.createDataFrame([("short",), ("also short",)], "s string")

    @registry.model(name="m2", materialized="view")
    def m2(ctx):
        return df

    apply_schema_config(
        registry,
        {"models": [{"name": "m2", "columns": [{"name": "s", "tests": [{"max_length": {"n": 15}}]}]}]},
    )
    registry.run(spark)
    results = registry.test(spark)
    assert results[0].passed


class TestOnSchemaChange:
    def _registry(self, strategy, on_schema_change, cols):
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(
            name="osc_target",
            materialized="incremental",
            unique_key="id",
            incremental_strategy=strategy,
            on_schema_change=on_schema_change,
        )
        def osc_target(ctx):
            df = ctx.spark.range(self.n0, self.n1).select(F.col("id"))
            for name, expr in cols:
                df = df.withColumn(name, expr)
            return df

        return reg

    def test_append_new_columns_widens_table(self, spark):
        from pyspark.sql import functions as F

        spark.sql("DROP TABLE IF EXISTS osc_target")
        self.n0, self.n1 = 0, 5
        r1 = self._registry("append", "append_new_columns", [("a", F.lit(1))])
        r1.run(spark, select=["osc_target"])
        self.n0, self.n1 = 5, 10
        r2 = self._registry(
            "append", "append_new_columns", [("a", F.lit(2)), ("b", F.lit("x"))]
        )
        r2.run(spark, select=["osc_target"])
        out = spark.table("osc_target")
        assert set(out.columns) == {"id", "a", "b"}
        assert out.count() == 10
        # pre-existing rows read the new column as null
        assert out.where(F.col("id") < 5).where(F.col("b").isNull()).count() == 5
        assert out.where(F.col("id") >= 5).where(F.col("b") == "x").count() == 5

    def test_ignore_projects_onto_table_schema(self, spark):
        from pyspark.sql import functions as F

        spark.sql("DROP TABLE IF EXISTS osc_target")
        self.n0, self.n1 = 0, 5
        self._registry("append", "ignore", [("a", F.lit(1))]).run(spark, select=["osc_target"])
        self.n0, self.n1 = 5, 10
        self._registry("append", "ignore", [("b", F.lit(9))]).run(spark, select=["osc_target"])
        out = spark.table("osc_target")
        assert set(out.columns) == {"id", "a"}  # extra column dropped
        assert out.where(F.col("id") >= 5).where(F.col("a").isNull()).count() == 5

    def test_fail_raises_on_difference(self, spark):
        import pytest
        from pyspark.sql import functions as F

        spark.sql("DROP TABLE IF EXISTS osc_target")
        self.n0, self.n1 = 0, 5
        self._registry("append", "fail", [("a", F.lit(1))]).run(spark, select=["osc_target"])
        self.n0, self.n1 = 5, 10
        with pytest.raises(ValueError, match="on_schema_change"):
            self._registry("append", "fail", [("c", F.lit(2))]).run(spark, select=["osc_target"])

    def test_sync_all_columns_adopts_fresh_schema(self, spark):
        from pyspark.sql import functions as F

        spark.sql("DROP TABLE IF EXISTS osc_target")
        self.n0, self.n1 = 0, 5
        self._registry("merge", "sync_all_columns", [("a", F.lit(1))]).run(spark, select=["osc_target"])
        self.n0, self.n1 = 5, 10
        self._registry("merge", "sync_all_columns", [("b", F.lit(7))]).run(spark, select=["osc_target"])
        out = spark.table("osc_target")
        assert set(out.columns) == {"id", "b"}  # 'a' removed, 'b' added
        assert out.count() == 10


class TestQuarantineIngest:
    def test_bad_rows_quarantined_not_nulled(self, spark, tmp_path):
        from pyspark.sql import types as T

        from data_etl_with_dbt_spark.sources.ingest import ingest_csv_quarantine

        csv = tmp_path / "in.csv"
        csv.write_text(
            "id,qty,price\n"
            "1,2,3.5\n"
            "2,notanint,9.9\n"   # corrupt: qty fails IntegerType
            "3,4,oops\n"          # corrupt: price fails DoubleType
            "4,5,6.25\n"
        )
        schema = T.StructType([
            T.StructField("id", T.IntegerType()),
            T.StructField("qty", T.IntegerType()),
            T.StructField("price", T.DoubleType()),
        ])
        spark.sql("DROP TABLE IF EXISTS q_clean")
        spark.sql("DROP TABLE IF EXISTS q_clean_quarantine")
        clean, bad = ingest_csv_quarantine(spark, str(csv), "q_clean", schema)
        assert sorted(r.id for r in clean.collect()) == [1, 4]
        raws = sorted(r.raw_line for r in bad.collect())
        assert len(raws) == 2 and any("notanint" in r for r in raws)


class TestRunStatsMonitor:
    def test_anomalous_run_flagged_against_history(self, spark):
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans import monitor

        spark.sql("DROP TABLE IF EXISTS dq_run_stats")
        # five healthy runs: ~1000 rows, ~1% nulls; run 6 collapses to 100
        # rows with 50% nulls
        for run in range(1, 6):
            df = spark.range(1000 + run).select(
                "id",
                F.when(F.col("id") % 100 == 0, None).otherwise(F.col("id") * 1.0).alias("v"),
            )
            monitor.record_stats(df, "feed", run, numeric_cols=["v"])
        bad = spark.range(100).select(
            "id", F.when(F.col("id") % 2 == 0, None).otherwise(F.col("id") * 1.0).alias("v")
        )
        monitor.record_stats(bad, "feed", 6, numeric_cols=["v"])

        flagged = monitor.detect_anomalies(spark, "feed", z_threshold=3.0).collect()
        assert flagged, "the collapsed run must be flagged"
        assert {r.run_id for r in flagged} == {6}
        flagged_metrics = {r.metric for r in flagged}
        assert "row_count" in flagged_metrics and "null_frac_v" in flagged_metrics
        # healthy runs never flag
        assert all(r.run_id == 6 for r in flagged)

    def test_constant_history_break_flags(self, spark):
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans import monitor

        spark.sql("DROP TABLE IF EXISTS dq_run_stats")
        # null_frac is EXACTLY 0.0 for every healthy run (zero variance),
        # then jumps — must flag even though a z-score is undefined
        for run in range(1, 5):
            monitor.record_stats(
                spark.range(500).select("id", (F.col("id") * 1.0).alias("v")),
                "feed2", run, numeric_cols=["v"],
            )
        bad = spark.range(500).select(
            "id", F.when(F.col("id") % 2 == 0, None).otherwise(F.col("id") * 1.0).alias("v")
        )
        monitor.record_stats(bad, "feed2", 5, numeric_cols=["v"])
        fl = monitor.detect_anomalies(spark, "feed2").collect()
        assert any(r.metric == "null_frac_v" and r.run_id == 5 and r.z is None for r in fl)
        assert all(r.run_id == 5 for r in fl)

    def test_cold_start_never_flags(self, spark):
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans import monitor

        spark.sql("DROP TABLE IF EXISTS dq_run_stats")
        monitor.record_stats(spark.range(10).select("id"), "tiny", 1)
        monitor.record_stats(spark.range(99999).select("id"), "tiny", 2)
        assert monitor.detect_anomalies(spark, "tiny").isEmpty()


class TestObservedWrite:
    """One-pass DQ: metrics ride the write job itself (df.observe) — values
    must equal separately-computed counts, measured over exactly the rows
    the write consumed."""

    def test_metrics_match_separate_counts(self, spark, tmp_path):
        from data_etl_with_dbt_spark.plans.observe import (
            observed_write,
            standard_metrics,
            violation_metrics,
        )

        df = spark.range(1000).select(
            F.col("id"),
            F.when(F.col("id") % 10 == 0, None).otherwise(F.col("id") * 2).alias("v"),
            (F.col("id") - 500).alias("signed"),
        )
        out = str(tmp_path / "observed")
        metrics = standard_metrics(df, ["v"]) + violation_metrics(
            {"nonpositive_signed": F.col("signed") <= 0}
        )
        got = observed_write(
            df, lambda d: d.write.mode("overwrite").parquet(out), metrics=metrics
        )
        assert got["n_rows"] == 1000
        assert got["nulls_v"] == df.where(F.col("v").isNull()).count() == 100
        assert got["violations_nonpositive_signed"] == 501
        # the write actually happened, with all rows
        assert spark.read.parquet(out).count() == 1000

    def test_default_metrics_cover_all_columns(self, spark, tmp_path):
        from data_etl_with_dbt_spark.plans.observe import observed_write

        df = spark.range(50).select(
            F.col("id"), F.lit(None).cast("string").alias("always_null")
        )
        got = observed_write(
            df,
            lambda d: d.write.mode("overwrite").parquet(str(tmp_path / "o2")),
        )
        assert got["n_rows"] == 50
        assert got["nulls_id"] == 0
        assert got["nulls_always_null"] == 50


class TestSeverityAndFailures:
    """dbt test-protocol completeness: warn severity never blocks,
    store_failures persists violation rows, freshness grades source age."""

    def test_warn_severity_reports_but_does_not_block(self, spark):
        from data_etl_with_dbt_spark.plans import dq

        df = spark.createDataFrame([(1,), (None,), (3,)], "v int")
        err = dq.run_test(dq.not_null, df, "v")
        warn = dq.run_test(dq.not_null, df, "v", severity="warn")
        assert not err.passed and err.blocking
        assert not warn.passed and not warn.blocking
        clean = dq.run_test(dq.not_null, df.where("v IS NOT NULL"), "v")
        assert clean.passed and not clean.blocking
        import pytest
        with pytest.raises(ValueError, match="severity"):
            dq.run_test(dq.not_null, df, "v", severity="fatal")

    def test_store_failures_persists_violations(self, spark):
        from data_etl_with_dbt_spark.plans import dq

        df = spark.createDataFrame([(1,), (-5,), (-7,)], "amount int")
        r = dq.run_test(dq.positive, df, "amount", model="m1", store_failures=True)
        assert not r.passed
        assert r.failures_table == "dq_failures__m1__positive__amount"
        stored = spark.table(r.failures_table)
        assert sorted(x.amount for x in stored.collect()) == [-7, -5]
        # passing test never writes a table
        ok = dq.run_test(
            dq.positive, df.where("amount > 0"), "amount",
            model="m1", store_failures=True,
        )
        assert ok.passed and ok.failures_table is None
        spark.sql(f"DROP TABLE IF EXISTS {r.failures_table}")

    def test_schema_config_flattens_dbt_config_block(self, spark):
        from data_etl_with_dbt_spark.plans.config import apply_schema_config
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="cfg_model")
        def cfg_model(ctx):
            return ctx.spark.createDataFrame([(None,)], "v int")

        apply_schema_config(
            reg,
            {
                "models": [
                    {
                        "name": "cfg_model",
                        "columns": [
                            {
                                "name": "v",
                                "tests": [
                                    {"not_null": {"config": {"severity": "warn"}}}
                                ],
                            }
                        ],
                    }
                ]
            },
        )
        reg.run(spark)
        results = reg.test(spark)
        assert len(results) == 1
        assert not results[0].passed and results[0].severity == "warn"
        assert not results[0].blocking

    def test_source_freshness_statuses(self, spark):
        import datetime as dt
        from data_etl_with_dbt_spark.plans.dq import check_source_freshness

        now = dt.datetime(2024, 6, 1, 12, 0, 0)
        mk = lambda ts: spark.createDataFrame([(ts,)], "loaded_at timestamp")
        fresh = check_source_freshness(
            mk(now - dt.timedelta(minutes=5)), "loaded_at", 30, 120, now=now
        )
        assert fresh["status"] == "pass"
        stale = check_source_freshness(
            mk(now - dt.timedelta(minutes=45)), "loaded_at", 30, 120, now=now
        )
        assert stale["status"] == "warn" and abs(stale["age_minutes"] - 45) < 1e-6
        dead = check_source_freshness(
            mk(now - dt.timedelta(hours=3)), "loaded_at", 30, 120, now=now
        )
        assert dead["status"] == "error"
        empty = check_source_freshness(
            mk(now).where("1=0"), "loaded_at", 30, 120, now=now
        )
        assert empty["status"] == "error" and empty["max_loaded_at"] is None


class TestFreshnessDefaultClock:
    def test_default_now_computes_age_in_spark(self, spark):
        """Without now=, the age must come from Spark's own clock pair
        (current_timestamp vs max(loaded_at) in one agg) — a Python-side
        UTC now vs a driver-local-tz collected timestamp skews the age by
        the UTC offset on non-UTC drivers."""
        from data_etl_with_dbt_spark.plans.dq import check_source_freshness

        just_loaded = spark.range(3).select(
            F.current_timestamp().alias("loaded_at")
        )
        out = check_source_freshness(just_loaded, "loaded_at", 30, 120)
        assert out["status"] == "pass"
        # freshly stamped rows: any tz-offset bug shows up as hours
        assert 0 <= out["age_minutes"] < 5
        empty = check_source_freshness(
            just_loaded.where("1=0"), "loaded_at", 30, 120
        )
        assert empty["status"] == "error" and empty["age_minutes"] is None


class TestProfileFrame:
    def test_nulls_and_distincts(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import profile_frame

        df = spark.createDataFrame(
            [(1, "a", None), (2, "a", 1.0), (3, None, 1.0), (3, "b", None)],
            "k int, s string, v double",
        )
        got = {r.col_name: (r.n_null, r.n_distinct) for r in profile_frame(df).collect()}
        assert got == {"k": (0, 3), "s": (1, 2), "v": (2, 1)}

    def test_single_scan_and_approx_variant(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import profile_frame

        df = spark.createDataFrame([(i, i % 3) for i in range(100)], "a int, b int")
        exact = profile_frame(df)
        plan = exact._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Scan ") <= 1  # one pass over the input
        approx = profile_frame(df, exact=False)
        aplan = approx._jdf.queryExecution().executedPlan().toString()
        assert "Expand" not in aplan  # HLL partials need no multi-distinct Expand
        got = {r.col_name: r.n_distinct for r in approx.collect()}
        # HLL estimates carry a small relative error even at low cardinality
        assert got["b"] == 3
        assert abs(got["a"] - 100) <= 5


class TestPsiDrift:
    def test_identical_distributions_score_zero(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import psi_drift

        df = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
        assert psi_drift(df, df, "v") == pytest.approx(0.0, abs=1e-9)

    def test_shifted_distribution_flags(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import psi_drift

        base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
        shifted = spark.range(2000).select(
            ((F.col("id") % 100) + 80).cast("double").alias("v")
        )
        psi = psi_drift(shifted, base, "v")
        assert psi > 0.25  # "drifted" band

    def test_categorical_column_new_category(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import psi_drift

        base = spark.createDataFrame([("a",)] * 50 + [("b",)] * 50, "c string")
        same = psi_drift(base, base, "c")
        moved = spark.createDataFrame([("a",)] * 10 + [("z",)] * 90, "c string")
        assert same == pytest.approx(0.0, abs=1e-9)
        assert psi_drift(moved, base, "c") > 0.25


class TestBenfordCheck:
    def test_log_uniform_passes_uniform_flagged(self, spark):
        import math

        from data_etl_with_dbt_spark.plans.dq import benford_check

        n = 20_000
        # log-uniform over 5 decades: first digits follow Benford closely
        natural = spark.range(n).select(
            F.pow(F.lit(10.0), (F.col("id") % 5000) / F.lit(1000.0)).alias("v")
        )
        rows = benford_check(natural, "v").collect()
        assert [r.digit for r in rows] == list(range(1, 10))
        assert abs(sum(r.share for r in rows) - 1.0) < 1e-12
        assert max(r.abs_dev for r in rows) < 0.01

        # uniform over [1000, 2000): every first digit is 1 — a screaming spike
        fabricated = spark.range(n).select((F.col("id") % 1000 + 1000.0).alias("v"))
        frows = {r.digit: r for r in benford_check(fabricated, "v").collect()}
        assert frows[1].share == 1.0
        assert frows[1].abs_dev > 0.65

    def test_nonpositive_and_subunit_rows_excluded(self, spark):
        from data_etl_with_dbt_spark.plans.dq import benford_check

        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (0.42,), (None,), (7.9,)], "v double"
        )
        rows = benford_check(df, "v").collect()
        assert [(r.digit, r.n) for r in rows] == [(7, 1)]


class TestTableDiff:
    def test_row_level_statuses_and_null_safety(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import table_diff

        a = spark.createDataFrame(
            [(1, "x", 1.0), (2, None, 2.0), (3, "z", None), (4, "w", 4.0)],
            "k int, s string, v double",
        )
        b = spark.createDataFrame(
            [(1, "x", 1.0), (2, None, 2.0), (3, "z", 3.0), (5, "n", 5.0)],
            "k int, s string, v double",
        )
        rows = {r.k: r for r in table_diff(a, b, ["k"]).collect()}
        assert rows[1].diff_status == "equal"
        assert rows[2].diff_status == "equal"  # NULL == NULL is equal
        assert rows[3].diff_status == "changed" and rows[3].changed_cols == "v"
        assert rows[4].diff_status == "only_a"
        assert rows[5].diff_status == "only_b"
        # non-changed rows carry an empty changed_cols, never NULL
        assert rows[4].changed_cols == "" and rows[1].changed_cols == ""


class TestMaskingPolicy:
    def test_strategies_and_validation(self, spark):
        from data_etl_with_dbt_spark.plans.dq import apply_masking_policy

        df = spark.createDataFrame(
            [(1, "alice@example.com", "555-123-9876", 4321.5)],
            "id long, email string, phone string, bal double",
        )
        [r] = apply_masking_policy(
            df,
            {"email": "hash", "phone": "partial", "bal": "bucket"},
        ).collect()
        assert r.id == 1
        assert len(r.email) == 32 and "@" not in r.email
        assert r.phone.endswith("9876") and set(r.phone[:-4]) == {"*"}
        assert r.bal == 4000.0

        [n] = apply_masking_policy(df, {"email": "null"}).select("email").collect()
        assert n.email is None

        import pytest

        with pytest.raises(ValueError, match="absent columns"):
            apply_masking_policy(df, {"nope": "hash"})
        with pytest.raises(ValueError, match="unknown masking strategy"):
            apply_masking_policy(df, {"email": "rot13"})

    def test_masked_hash_stays_joinable(self, spark):
        from data_etl_with_dbt_spark.plans.dq import apply_masking_policy

        a = spark.createDataFrame([(1, "x@y.z"), (2, "p@q.r")], "id long, email string")
        b = spark.createDataFrame([("x@y.z", 10)], "email string, n long")
        ma = apply_masking_policy(a, {"email": "hash"})
        mb = apply_masking_policy(b, {"email": "hash"})
        joined = ma.join(mb, "email").collect()
        assert len(joined) == 1 and joined[0].id == 1


class TestDqReviewFixes:
    def test_accepted_values_passes_nulls_like_dbt(self, spark):
        """dbt's compiled accepted_values is `NOT IN (...)`: NULLs pass
        (three-valued logic; not_null is the separate test). flag_nulls=True
        opts in to the stricter form."""
        from data_etl_with_dbt_spark.plans.dq import accepted_values

        df = spark.createDataFrame(
            [("card",), ("cash",), (None,), ("wire",)], "pay string"
        )
        default = [r.pay for r in accepted_values(df, "pay", ["card", "cash"]).collect()]
        assert default == ["wire"]
        strict = sorted(
            (r.pay or "") for r in
            accepted_values(df, "pay", ["card", "cash"], flag_nulls=True).collect()
        )
        assert strict == ["", "wire"]

    def test_partial_masking_handles_quotable_column_names(self, spark):
        """'partial' is pure Column API now: names with spaces or reserved
        words used to break the interpolated F.expr form."""
        from data_etl_with_dbt_spark.plans.dq import apply_masking_policy

        df = spark.createDataFrame([("555-123-9876", "k")], ["user phone", "select"])
        [r] = apply_masking_policy(
            df, {"user phone": "partial", "select": "partial"}
        ).collect()
        assert r["user phone"].endswith("9876")
        assert set(r["user phone"][:-4]) == {"*"}
        assert r["select"] == "k"  # shorter than 4 chars: kept as-is
