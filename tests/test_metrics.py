"""Metrics layer + model contracts + quarantine: the dbt-semantic-parity
surface added in round 3."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.plans.metrics import MetricRegistry


@pytest.fixture()
def reg(spark):
    r = MetricRegistry()
    orders = lambda s: s.createDataFrame(  # noqa: E731
        [
            ("us", "open", 10.0),
            ("us", "done", 20.0),
            ("eu", "done", 5.0),
            ("eu", "open", 7.0),
            ("us", "done", 3.0),
        ],
        "region string, status string, amount double",
    )
    r.define(
        "revenue",
        orders,
        lambda: F.sum("amount"),
        dimensions=["region", "status"],
        description="total order amount",
    )
    r.define(
        "order_count",
        orders,
        lambda: F.count(F.lit(1)).cast("long"),
        dimensions=["region", "status"],
    )
    r.define(
        "done_revenue",
        orders,
        lambda: F.sum("amount"),
        dimensions=["region"],
        filter=lambda: F.col("status") == "done",
    )
    return r


class TestMetricRegistry:
    def test_single_metric_grand_total(self, spark, reg):
        [row] = reg.query(spark, ["revenue"]).collect()
        assert row.revenue == 45.0

    def test_two_metrics_one_scan_one_groupby(self, spark, reg):
        df = reg.query(spark, ["revenue", "order_count"], ["region"])
        got = {r.region: (r.revenue, r.order_count) for r in df.collect()}
        assert got == {"us": (33.0, 3), "eu": (12.0, 2)}
        # same loader+filter -> ONE aggregate node, not a join of two
        assert "Join" not in df._jdf.queryExecution().optimizedPlan().toString()

    def test_filtered_metric_joins_on_dims(self, spark, reg):
        df = reg.query(spark, ["revenue", "done_revenue"], ["region"])
        got = {r.region: (r.revenue, r.done_revenue) for r in df.collect()}
        assert got == {"us": (33.0, 23.0), "eu": (12.0, 5.0)}

    def test_disallowed_dimension_rejected(self, spark, reg):
        with pytest.raises(ValueError, match="cannot slice by"):
            reg.query(spark, ["done_revenue"], ["status"])

    def test_unknown_metric_rejected(self, spark, reg):
        with pytest.raises(KeyError, match="unknown metric"):
            reg.query(spark, ["nope"])


class TestModelContract:
    def _registry(self, contract):
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="m_contract", materialized="ephemeral", contract=contract)
        def m_contract(ctx):
            return ctx.spark.range(3).select(
                F.col("id").alias("k"), F.lit("x").alias("v")
            )

        return reg

    def test_conforming_model_builds(self, spark):
        reg = self._registry({"k": "bigint", "v": "string"})
        out = reg.run(spark)
        assert out["m_contract"].count() == 3

    def test_missing_and_unexpected_and_mistyped_fail(self, spark):
        reg = self._registry({"k": "int", "w": "string"})
        with pytest.raises(ValueError) as e:
            reg.run(spark)
        msg = str(e.value)
        assert "missing=['w']" in msg
        assert "unexpected=['v']" in msg
        assert "k: declared int, got bigint" in msg

    def test_contract_checks_before_materialization(self, spark, tmp_path):
        """A violating 'table' model must fail WITHOUT writing anything."""
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="m_bad_table", materialized="table", contract={"z": "string"})
        def m_bad_table(ctx):
            return ctx.spark.range(1)

        with pytest.raises(ValueError, match="violates its contract"):
            reg.run(spark)
        assert not spark.catalog.tableExists("m_bad_table")


class TestQuarantine:
    def test_reasons_and_split(self, spark):
        from data_etl_with_dbt_spark.plans.dq import quarantine

        df = spark.createDataFrame(
            [(1, 5.0, "view"), (2, -1.0, "view"), (3, 4.0, "bogus"), (4, None, None)],
            "id long, v double, t string",
        )
        q = quarantine(
            df,
            [
                ("positive", F.col("v") > 0),
                ("known", F.col("t").isin("view", "click")),
            ],
        )
        got = {r.id: (r.dq_reasons, r.dq_ok) for r in q.collect()}
        assert got[1] == ("", True)
        assert got[2] == ("positive", False)
        assert got[3] == ("known", False)
        # NULL predicate results are failures, both rules, declaration order
        assert got[4] == ("positive,known", False)
        assert q.where("dq_ok").count() == 1


class TestParallelRunner:
    def _registry(self):
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="p_base", materialized="ephemeral")
        def p_base(ctx):
            return ctx.spark.range(100).select(
                F.col("id"), (F.col("id") % 5).alias("g")
            )

        @reg.model(name="p_left", materialized="table", deps=["p_base"])
        def p_left(ctx):
            return ctx.ref("p_base").groupBy("g").agg(F.sum("id").alias("s"))

        @reg.model(name="p_right", materialized="table", deps=["p_base"])
        def p_right(ctx):
            return ctx.ref("p_base").groupBy("g").agg(F.count("*").alias("c"))

        @reg.model(name="p_join", materialized="table", deps=["p_left", "p_right"])
        def p_join(ctx):
            return ctx.ref("p_left").join(ctx.ref("p_right"), "g")

        return reg

    def test_parallel_equals_sequential(self, spark):
        seq = self._registry().run(spark)
        seq_rows = sorted(map(tuple, seq["p_join"].collect()))
        par = self._registry().run(spark, threads=4)
        par_rows = sorted(map(tuple, par["p_join"].collect()))
        assert par_rows == seq_rows
        assert set(par) == {"p_base", "p_left", "p_right", "p_join"}
        for t in ("p_left", "p_right", "p_join"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_parallel_propagates_model_failure(self, spark):
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="p_boom", materialized="ephemeral")
        def p_boom(ctx):
            raise RuntimeError("boom")

        with pytest.raises(RuntimeError, match="boom"):
            reg.run(spark, threads=4)


def test_manifest_shape_and_topo_order(spark):
    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    reg = ModelRegistry()

    @reg.model(name="mf_a", materialized="ephemeral", description="base")
    def mf_a(ctx):
        return ctx.spark.range(1)

    @reg.model(
        name="mf_b",
        materialized="incremental",
        unique_key="id",
        deps=["mf_a"],
        contract={"id": "bigint"},
    )
    def mf_b(ctx):
        return ctx.ref("mf_a")

    man = reg.manifest()
    names = [m["name"] for m in man]
    assert names.index("mf_a") < names.index("mf_b")
    b = next(m for m in man if m["name"] == "mf_b")
    assert b["depends_on"] == ["mf_a"]
    assert b["incremental_strategy"] == "append"
    assert b["contract"] == {"id": "bigint"}
    a = next(m for m in man if m["name"] == "mf_a")
    assert a["description"] == "base" and a["incremental_strategy"] is None


def test_corpus_dag_example_runs(spark, tmp_path, capsys):
    """The corpus DAG example end to end: parallel run (threads=2),
    contract-checked stats model, mixture branch, DQ tests pass, rerun
    idempotent (asserted inside the example)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "corpus_dag",
        os.path.join(os.path.dirname(__file__), "..", "examples", "corpus_dag.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    cwd = os.getcwd()
    try:
        mod.main(3000, str(tmp_path / "wd"))
    finally:
        os.chdir(cwd)
    out = capsys.readouterr().out
    assert "idempotent rerun" in out
    assert "n_training_copies" in out
    assert "manifest: 4 models" in out
    assert "FAIL" not in out


class TestMetricTimeGrain:
    def _registry(self, spark):
        from data_etl_with_dbt_spark.plans.metrics import MetricRegistry

        reg = MetricRegistry()

        def loader(sp):
            return sp.range(60).select(
                F.col("id"),
                (F.col("id") % 3).alias("region"),
                F.expr("date_add(DATE '2024-01-15', CAST(id AS INT))").alias("d"),
                (F.col("id") * 10.0).alias("amount"),
            )

        reg.define(
            "revenue", loader, lambda: F.sum("amount"),
            dimensions=["region"], time_dimension="d",
        )
        reg.define(
            "orders", loader, lambda: F.count(F.lit(1)),
            dimensions=["region"], time_dimension="d",
        )
        reg.define("no_time", loader, lambda: F.count(F.lit(1)), dimensions=["region"])
        return reg

    def test_monthly_grain_rolls_up_one_definition(self, spark):
        reg = self._registry(spark)
        out = reg.query(spark, ["revenue", "orders"], grain="month")
        rows = {str(r.metric_time): (r.revenue, r.orders) for r in out.collect()}
        # 2024-01-15..2024-03-14 spans three months
        assert set(rows) == {"2024-01-01", "2024-02-01", "2024-03-01"}
        assert sum(v[1] for v in rows.values()) == 60
        assert rows["2024-01-01"][1] == 17  # Jan 15..31
        # one scan for both metrics: single groupBy, no join in the plan
        assert "Join" not in out._jdf.queryExecution().executedPlan().toString()

    def test_grain_with_dimensions(self, spark):
        reg = self._registry(spark)
        out = reg.query(spark, ["revenue"], dimensions=["region"], grain="month")
        assert set(out.columns) == {"region", "metric_time", "revenue"}
        assert out.count() == 9  # 3 regions x 3 months

    def test_grain_requires_time_dimension(self, spark):
        import pytest

        reg = self._registry(spark)
        with pytest.raises(ValueError, match="no time_dimension"):
            reg.query(spark, ["no_time"], grain="day")
        with pytest.raises(ValueError, match="grain must be one of"):
            reg.query(spark, ["revenue"], grain="fortnight")


class TestPlansReviewFixes:
    """Round-5 review regressions: grain-None scan grouping, ReusedExchange
    shuffle counting, empty config: keys, dotted diff columns."""

    def test_grain_none_groups_across_time_dimensions(self, spark):
        from data_etl_with_dbt_spark.plans.metrics import MetricRegistry

        calls = {"n": 0}

        def loader(s):
            calls["n"] += 1
            return s.createDataFrame(
                [(1, 10.0, 2.0)], "id long, rev double, refund double"
            )

        reg = MetricRegistry()
        reg.define("revenue", loader, lambda: F.sum("rev"), [],
                   time_dimension="order_ts")
        reg.define("refunds", loader, lambda: F.sum("refund"), [],
                   time_dimension="refund_ts")
        [row] = reg.query(spark, ["revenue", "refunds"]).collect()
        assert (row.revenue, row.refunds) == (10.0, 2.0)
        # one scan: differing time_dimensions must not split the group
        # when no grain is requested (the column never enters the plan)
        assert calls["n"] == 1

    def test_shuffle_budget_ignores_reused_exchanges(self):
        from data_etl_with_dbt_spark.plans.lint import count_exchanges

        plan = "\n".join([
            "*(3) SortMergeJoin [k#1], [k#9], Inner",
            "+- Exchange hashpartitioning(k#1, 200), ENSURE_REQUIREMENTS",
            "   +- LocalTableScan [k#1]",
            "+- ReusedExchange [k#9], Exchange hashpartitioning(k#1, 200)",
        ])
        assert count_exchanges(plan) == 1

    def test_empty_config_key_tolerated(self, spark):
        from data_etl_with_dbt_spark.plans.config import apply_schema_config
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()

        @reg.model(name="m1")
        def m1(ctx):
            return ctx.spark.createDataFrame([(1,)], "id long")

        n = apply_schema_config(
            reg,
            {"models": [{"name": "m1", "columns": [
                {"name": "id",
                 "tests": [{"unique": {"config": None}}]},
            ]}]},
        )
        assert n == 1
        reg.run(spark)
        try:
            assert all(r.passed for r in reg.test(spark))
        finally:
            spark.catalog.dropTempView("m1")

    def test_table_diff_handles_dotted_column_names(self, spark):
        from data_etl_with_dbt_spark.plans.monitor import table_diff

        a = spark.createDataFrame([(1, 5.0)], ["id", "payload.amount"])
        b = spark.createDataFrame([(1, 6.0)], ["id", "payload.amount"])
        [row] = table_diff(a, b, keys=["id"]).collect()
        assert row.diff_status == "changed"
        assert row.changed_cols == "payload.amount"
