"""End-to-end reproduction of the reference workflow, Spark-native:

    ETL/ETL.py            → ingest_csv (one distributed job)
    dbt run               → ModelRegistry.run (raw_texi → core_texi)
    dbt test              → registry.test (T1-T5)
    Data-Insights/train.py→ train_fare_model → save
    AI.py / Application.py→ parse_nl_trip → predict_batch

Run:  python examples/taxi_pipeline.py [n_rows] [workdir]

Generates a synthetic NYC-taxi-shaped CSV (defaults to the reference's
1.3M-row ingest cap — `ETL/ETL.py:50-54`), then runs the whole flow and
prints per-stage wall-clock. This is the "reference's own workload at the
reference's own scale" demonstration; the reference does the ingest alone in
minutes over chunked INSERTs, single-threaded.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.ml import parse_nl_trip, predict_batch, train_fare_model
from data_etl_with_dbt_spark.ml.pipeline import extract_training_frame, save_model
from data_etl_with_dbt_spark.models.taxi import register_taxi_models
from data_etl_with_dbt_spark.plans.dag import ModelRegistry
from data_etl_with_dbt_spark.sources import ingest_csv


def generate_taxi_csv(spark, path: str, n_rows: int) -> None:
    """Deterministic taxi-shaped CSV with adversarial rows mixed in
    (duplicates, NULL timestamps, >300 mph) so the transform has real work."""
    from pyspark.sql import functions as F

    df = spark.range(n_rows).select(
        (F.col("id") % 2 + 1).cast("int").alias("VendorID"),
        F.when(F.col("id") % 997 == 0, None)  # NULL pickups (dropped by P6)
        .otherwise(
            F.timestamp_seconds(F.lit(1421280000) + (F.col("id") % 2592000))
        )
        .alias("tpep_pickup_datetime"),
        F.timestamp_seconds(
            F.lit(1421280000)
            + (F.col("id") % 2592000)
            + F.when(F.col("id") % 499 == 0, 30)  # 30s trips -> speed cap fodder
            .otherwise(300 + F.col("id") % 3600)
        ).alias("tpep_dropoff_datetime"),
        (F.col("id") % 6 + 1).cast("int").alias("passenger_count"),
        F.round((F.col("id") % 200) / 10.0 + 0.3, 2).alias("trip_distance"),
        F.round(F.lit(-73.99) + (F.col("id") % 100) / 1000.0, 6).alias("pickup_longitude"),
        F.round(F.lit(40.73) + (F.col("id") % 100) / 1000.0, 6).alias("pickup_latitude"),
        (F.col("id") % 6 + 1).cast("int").alias("RateCodeID"),
        F.when(F.col("id") % 2 == 0, "N").otherwise("Y").alias("store_and_fwd_flag"),
        F.round(F.lit(-73.98) + (F.col("id") % 90) / 1000.0, 6).alias("dropoff_longitude"),
        F.round(F.lit(40.75) + (F.col("id") % 90) / 1000.0, 6).alias("dropoff_latitude"),
        (F.col("id") % 2 + 1).cast("int").alias("payment_type"),
        F.round((F.col("id") % 200) / 10.0 * 2.5 + 2.5, 2).alias("fare_amount"),
        F.lit(0.5).alias("extra"),
        F.lit(0.5).alias("mta_tax"),
        F.round((F.col("id") % 40) / 10.0, 2).alias("tip_amount"),
        F.lit(0.0).alias("tolls_amount"),
        F.lit(0.3).alias("improvement_surcharge"),
        F.round((F.col("id") % 200) / 10.0 * 2.5 + 3.8, 2).alias("total_amount"),
    )
    # ~0.1% exact duplicates on the key columns (id collision via modulo)
    df.write.mode("overwrite").option("header", True).csv(path)


def main():
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_300_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/taxi_pipeline_demo"
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)

    spark = get_spark("taxi-pipeline-demo")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    t0 = time.perf_counter()
    generate_taxi_csv(spark, "taxi_csv", n_rows)
    timings["generate_csv"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    raw = ingest_csv(spark, "taxi_csv", "Texi_data", row_cap=1_300_000)
    n_ingested = raw.count()
    timings["ingest"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    registry = ModelRegistry()
    registry.add_source("Texi_data", "Texi_data")
    register_taxi_models(registry)
    out = registry.run(spark)
    n_core = out["core_texi"].count()
    timings["model_dag_run"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = registry.test(spark)
    timings["dq_tests"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    training = extract_training_frame(spark.table("core_texi"))
    model, metrics = train_fare_model(training, num_trees=50)
    save_model(model, "fare_model")
    timings["ml_train"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    request = parse_nl_trip("7.5 miles, 2 passengers, 22 minutes")
    fare = predict_batch(model, spark.createDataFrame([request])).first().predicted_fare
    timings["nl_predict"] = time.perf_counter() - t0

    print(f"rows ingested:      {n_ingested:,}")
    print(f"core_texi rows:     {n_core:,}")
    print("dq tests:          ", ", ".join(f"{r.test}={'PASS' if r.passed else 'FAIL'}" for r in results))
    for model, m in registry.run_metrics.items():
        nulls = sum(v for k, v in m.items() if k.startswith("nulls_"))
        print(f"observed[{model}]:   rows={m['n_rows']:,} null_cells={nulls:,} (one-pass, on the write job)")
    print(f"ml mse/rmse:        {metrics['mse']:.3f} / {metrics['rmse']:.3f}")
    print(f"nl request fare:    {fare}")
    for k, v in timings.items():
        print(f"{k:>18}: {v:6.1f} s")
    print(f"{'TOTAL':>18}: {sum(timings.values()):6.1f} s")
    spark.stop()


if __name__ == "__main__":
    main()
