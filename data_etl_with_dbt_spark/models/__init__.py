from data_etl_with_dbt_spark.models.taxi import build_core_taxi, build_raw_taxi  # noqa: F401
