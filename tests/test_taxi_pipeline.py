"""End-to-end test of the reference core transform on adversarial taxi-shaped
fixtures (FIXTURES.md §1 must-include rows), plus the DAG runner and the
declared data-quality tests (SURVEY.md §2.12 T1-T5)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.models.taxi import FINAL_COLUMNS, build_core_taxi, register_taxi_models
from data_etl_with_dbt_spark.plans.dag import ModelRegistry

PICK = dt.datetime(2015, 1, 15, 19, 5, 39)
DROP = dt.datetime(2015, 1, 15, 19, 25, 39)  # 20 min


def taxi_row(**kw):
    base = dict(
        VendorID=1,
        tpep_pickup_datetime=PICK,
        tpep_dropoff_datetime=DROP,
        passenger_count=1,
        trip_distance=5.0,
        pickup_longitude=-73.99,
        pickup_latitude=40.73,
        RateCodeID=1,
        store_and_fwd_flag="N",
        dropoff_longitude=-73.98,
        dropoff_latitude=40.75,
        payment_type=1,
        fare_amount=17.5,
        extra=0.5,
        mta_tax=0.5,
        tip_amount=2.0,
        tolls_amount=0.0,
        improvement_surcharge=0.3,
        total_amount=20.8,
    )
    base.update(kw)
    return Row(**base)


SCHEMA = (
    "VendorID int, tpep_pickup_datetime timestamp, tpep_dropoff_datetime timestamp, "
    "passenger_count int, trip_distance double, pickup_longitude double, "
    "pickup_latitude double, RateCodeID int, store_and_fwd_flag string, "
    "dropoff_longitude double, dropoff_latitude double, payment_type int, "
    "fare_amount double, extra double, mta_tax double, tip_amount double, "
    "tolls_amount double, improvement_surcharge double, total_amount double"
)


@pytest.fixture(scope="module")
def raw_df(spark):
    rows = [
        taxi_row(),  # 1 clean row
        taxi_row(),  # exact duplicate on key columns -> dedup keeps one
        taxi_row(tip_amount=99.0),  # differs only in non-key column -> same unique_id
        taxi_row(VendorID=2, trip_distance=15.0),  # clean long trip
        taxi_row(VendorID=2, tpep_pickup_datetime=None),  # NULL pickup -> dropped
        taxi_row(VendorID=2, tpep_dropoff_datetime=None),  # NULL dropoff -> dropped
        taxi_row(passenger_count=3, tpep_dropoff_datetime=PICK),  # zero duration -> dropped
        taxi_row(passenger_count=4, trip_distance=50.0,
                 tpep_dropoff_datetime=PICK + dt.timedelta(minutes=5)),  # 600 mph -> dropped
        taxi_row(passenger_count=5, dropoff_longitude=None),  # NULL in key column -> kept
        taxi_row(passenger_count=6, trip_distance=0.0),  # zero distance -> speed NULL, kept
    ]
    return spark.createDataFrame(rows, SCHEMA)


@pytest.fixture(scope="module")
def core_df(spark, raw_df):
    return build_core_taxi(raw_df, ingestion_date=dt.date(2015, 2, 1)).cache()


def test_core_columns_and_filters(core_df):
    assert core_df.columns == FINAL_COLUMNS
    # survivors: deduped base row, the vendor-2 long trip, the NULL-key row,
    # the zero-distance row; dropped: NULL timestamps, zero duration, 600 mph
    assert core_df.count() == 4


def test_dedup_keeps_exactly_one_per_key(core_df):
    assert core_df.where("passenger_count = 1 and vendor_id = 1").count() == 1


def test_derived_columns(core_df):
    clean = core_df.where("passenger_count = 1 and vendor_id = 1").first()
    assert clean.trip_duration_minutes == pytest.approx(20.0)
    assert clean.avg_speed_mph == pytest.approx(15.0)  # 5 mi / (1200s/3600)
    assert clean.is_long_trip is False
    long_trip = core_df.where("vendor_id = 2").first()
    assert long_trip.is_long_trip is True
    zero_dist = core_df.where("passenger_count = 6").first()
    assert zero_dist.avg_speed_mph is None


def test_null_key_column_still_keyed(core_df):
    r = core_df.where("passenger_count = 5").first()
    assert r.unique_id is not None and len(r.unique_id) == 32


def test_dedup_strategies_agree_on_key_set(spark, raw_df):
    w = build_core_taxi(raw_df, ingestion_date=dt.date(2015, 2, 1), dedup_strategy="window")
    h = build_core_taxi(raw_df, ingestion_date=dt.date(2015, 2, 1), dedup_strategy="hash")
    assert sorted(r.unique_id for r in w.select("unique_id").collect()) == sorted(
        r.unique_id for r in h.select("unique_id").collect()
    )


def test_dag_runner_and_dq_tests(spark, raw_df):
    registry = ModelRegistry()
    registry.add_source("Texi_data", lambda s: raw_df)
    register_taxi_models(registry)
    out = registry.run(spark)
    assert set(out) == {"raw_texi", "core_texi"}
    assert out["core_texi"].count() == 4
    results = registry.test(spark)
    assert len(results) == 5
    failures = [r for r in results if not r.passed]
    assert failures == [], [f"{r.model}.{r.column} {r.test}" for r in failures]


def test_dag_topo_order_respects_deps():
    registry = ModelRegistry()
    registry.add_source("src", lambda s: None)

    @registry.model(name="c", deps=["b"])
    def c(ctx):
        return None

    @registry.model(name="b", deps=["a"])
    def b(ctx):
        return None

    @registry.model(name="a")
    def a(ctx):
        return None

    order = registry.topo_order()
    assert order.index("a") < order.index("b") < order.index("c")


def test_registry_docs_manifest(spark):
    """docs() must expose the dbt-docs-shaped manifest: materialization,
    dependencies, and declared tests per model."""
    from data_etl_with_dbt_spark.models.taxi import register_taxi_models
    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    reg = ModelRegistry()
    register_taxi_models(reg)
    docs = reg.docs()
    assert "core_texi" in docs and "raw_texi" in docs
    core = docs["core_texi"]
    assert core["depends_on"] == ["raw_texi"]
    assert core["tests"], "core model must declare DQ tests"
    assert {t["test"] for t in core["tests"]} & {"unique", "not_null", "positive"}
    import json

    json.dumps(docs)  # must be JSON-serializable as-is


class TestSqlModels:
    def test_sql_dag_with_incremental_this_macro(self, spark, tmp_path):
        """A two-model DAG authored entirely in SQL: a staging view and an
        incremental model whose second run filters on {{ this }} via
        is_incremental() — the reference's dbt authoring shape end-to-end."""
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        src_path = str(tmp_path / "events_src")
        spark.range(0, 100).select(
            "id", (F.col("id") % 10).alias("k"), (F.col("id") * 1.0).alias("v")
        ).write.mode("overwrite").parquet(src_path)

        def build_registry():
            reg = ModelRegistry()
            reg.add_source("events_src", lambda s: s.read.parquet(src_path))
            reg.sql_model(
                "stg_events",
                "SELECT id, k, v FROM {{ source('events_src') }} WHERE v >= 0",
                materialized="ephemeral",
            )
            reg.sql_model(
                "fct_events",
                """
                {{ config(materialized='incremental', unique_key='id') }}
                SELECT id, k, v FROM {{ ref('stg_events') }}
                {% if is_incremental() %}
                  WHERE id > (SELECT max(id) FROM {{ this }})
                {% endif %}
                """,
            )
            return reg

        spark.sql("DROP TABLE IF EXISTS fct_events")
        reg = build_registry()
        assert sorted(reg._deps["fct_events"]) == ["stg_events"]
        reg.run(spark, select=["fct_events"])
        assert spark.table("fct_events").count() == 100

        # second batch: 50 new rows appear in the source
        spark.range(100, 150).select(
            "id", (F.col("id") % 10).alias("k"), (F.col("id") * 1.0).alias("v")
        ).write.mode("append").parquet(src_path)
        build_registry().run(spark, select=["fct_events"])
        out = spark.table("fct_events")
        assert out.count() == 150
        assert out.agg(F.max("id")).first()[0] == 149

    def test_unknown_jinja_rejected(self, spark):
        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()
        reg.add_source("s", lambda s: s.range(3))
        reg.sql_model("bad_model", "SELECT {{ mystery_macro() }} FROM {{ source('s') }}")
        import pytest

        with pytest.raises(ValueError, match="unsupported template"):
            reg.run(spark, select=["bad_model"])

    def test_unknown_config_key_rejected(self, spark):
        import pytest

        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        reg = ModelRegistry()
        with pytest.raises(ValueError, match="unsupported config"):
            reg.sql_model(
                "m", "{{ config(materialized='table', cluster_by='x') }} SELECT 1"
            )


def test_corpus_pipeline_example_runs(spark, tmp_path, monkeypatch, capsys):
    """The corpus-pipeline example must run end to end at the smallest scale
    and produce a non-empty packed train export."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "corpus_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples", "corpus_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setenv("SPARK_MASTER", "local[4]")
    monkeypatch.chdir(tmp_path)
    from tests.conftest import SF_DIR

    mod.main(SF_DIR, str(tmp_path))
    out = capsys.readouterr().out
    assert "pack_export" in out and "TOTAL" in out
    packed = spark.read.parquet(str(tmp_path / "corpus_shards"))
    assert packed.count() > 0
    assert "seq_id" in packed.columns


def test_seeds_materialize_before_models(spark, tmp_path):
    """dbt seeds: a registered CSV materializes as a table at run start and
    is ref()-able from models like any other relation."""
    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    seed_csv = tmp_path / "rate_codes.csv"
    seed_csv.write_text("rate_code_id,description\n1,standard\n2,jfk\n3,newark\n")

    reg = ModelRegistry()
    reg.add_seed("rate_codes", str(seed_csv))

    @reg.model(name="rates_used", deps=["rate_codes"])
    def rates_used(ctx):
        return ctx.ref("rate_codes").where(F.col("rate_code_id") >= 2)

    out = reg.run(spark)
    assert set(out) >= {"rate_codes", "rates_used"}
    assert spark.table("rate_codes").count() == 3
    assert {r.description for r in out["rates_used"].collect()} == {"jfk", "newark"}
    spark.sql("DROP TABLE IF EXISTS rate_codes")


def test_sql_model_additive_config(spark):
    """SQL-text models accept the additive strategy through config()."""
    from data_etl_with_dbt_spark.plans.dag import ModelRegistry

    reg = ModelRegistry()
    state = {"i": 0}
    batches = [[("a", 10)], [("a", 5), ("b", 2)]]
    reg.add_source(
        "delta_src",
        lambda s: s.createDataFrame(batches[state["i"]], "k string, v long"),
    )
    reg.sql_model(
        "sql_rollup",
        """{{ config(materialized='incremental', incremental_strategy='additive',
                     unique_key='k', additive_cols=['v']) }}
           SELECT k, v FROM {{ source('delta_src') }}""",
    )
    reg.run(spark)
    state["i"] = 1
    reg.run(spark)
    rows = {r.k: r.v for r in spark.table("sql_rollup").collect()}
    assert rows == {"a": 15, "b": 2}
    spark.sql("DROP TABLE IF EXISTS sql_rollup")


class TestSqlThisShadowing:
    def test_temp_view_cannot_shadow_this_macro(self, spark, tmp_path):
        """Round-5 review: {{ this }} rendered to the BARE model name, so a
        session temp view with the model's name shadowed the materialized
        table — the incremental high-water mark came from the wrong
        relation (the exact failure materialized_df already qualifies
        against). Render now emits `cat`.`db`.`name`."""
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.plans.dag import ModelRegistry

        src_path = str(tmp_path / "shadow_src")
        spark.range(0, 10).select("id").write.mode("overwrite").parquet(src_path)

        def build_registry():
            reg = ModelRegistry()
            reg.add_source("shadow_src", lambda s: s.read.parquet(src_path))
            reg.sql_model(
                "fct_shadowed",
                """
                {{ config(materialized='incremental', unique_key='id') }}
                SELECT id FROM {{ source('shadow_src') }}
                {% if is_incremental() %}
                  WHERE id > (SELECT max(id) FROM {{ this }})
                {% endif %}
                """,
            )
            return reg

        spark.sql("DROP TABLE IF EXISTS fct_shadowed")
        try:
            build_registry().run(spark, select=["fct_shadowed"])
            # a notebook user shadows the model name with a LOW max(id):
            # the bare-name render would re-ingest rows 4..9 as duplicates
            spark.range(0, 4).select("id").createOrReplaceTempView("fct_shadowed")
            spark.range(10, 15).select("id").write.mode("append").parquet(src_path)
            build_registry().run(spark, select=["fct_shadowed"])
            out = spark.table("`spark_catalog`.`default`.`fct_shadowed`")
            assert out.count() == 15  # no duplicates: watermark was 9, not 3
            assert out.agg(F.max("id")).first()[0] == 14
        finally:
            spark.catalog.dropTempView("fct_shadowed")
            spark.sql("DROP TABLE IF EXISTS fct_shadowed")
