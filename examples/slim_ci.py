"""Slim CI over the model DAG — the dbt deployment loop composed from this
engine's selector surface:

    1. build the full project once (build(): materialize + test per node,
       descendants of a blocking test failure are SKIPPED)
    2. persist the definition fingerprints (the dbt "state" manifest)
    3. ship a code change to ONE model
    4. CI rebuilds ONLY `state:modified+` — the changed model and its
       downstream — with prerequisites resolved automatically

Run:  python examples/slim_ci.py [rows] [workdir]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.plans import dq
from data_etl_with_dbt_spark.plans.dag import ModelRegistry


def build_registry(rows: int, speed_cap: float) -> ModelRegistry:
    """stg_events -> fct_speeds -> mart_daily, plus an untouched side mart.
    ``speed_cap`` is the "code change" slim CI reacts to."""
    reg = ModelRegistry()

    @reg.model(name="stg_events", materialized="table", tags=["staging"])
    def stg_events(ctx):
        return ctx.spark.range(rows).select(
            F.col("id").alias("event_id"),
            (F.col("id") % 50).alias("user_id"),
            (F.col("id") % 7).alias("day"),
            (F.col("id") % 400 / 1.0).alias("speed"),
        )

    @reg.model(name="fct_speeds", deps=["stg_events"], materialized="table")
    def fct_speeds(ctx, _cap=speed_cap):
        return ctx.ref("stg_events").where(F.col("speed") <= _cap)

    @reg.model(name="mart_daily", deps=["fct_speeds"], materialized="table")
    def mart_daily(ctx):
        return (
            ctx.ref("fct_speeds")
            .groupBy("day")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    @reg.model(name="mart_users", deps=["stg_events"], materialized="table")
    def mart_users(ctx):
        return (
            ctx.ref("stg_events")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_events"))
        )

    reg.add_test("fct_speeds", dq.unique, "event_id")
    reg.add_test("mart_daily", dq.positive, "n_events")
    return reg


def main(rows: int = 50_000, workdir: str = "slim_ci_wd") -> None:
    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # saveAsTable writes spark-warehouse under cwd
    spark = get_spark("slim-ci-example", master="local[4]")
    state_path = "manifest_state.json"

    # -- deployment 1: full build, persist state -------------------------
    v1 = build_registry(50_000 if rows <= 0 else rows, speed_cap=300.0)
    out = v1.build(spark)
    assert not out["failed"] and not out["skipped"]
    print(f"full build: {len(out['results'])} models, "
          f"{sum(1 for t in out['tests'] if t.passed)}/{len(out['tests'])} tests pass")
    with open(state_path, "w") as fh:
        json.dump(v1.fingerprints(), fh)

    # -- deployment 2: one model's code changes --------------------------
    with open(state_path) as fh:
        old_state = json.load(fh)
    v2 = build_registry(50_000 if rows <= 0 else rows, speed_cap=250.0)
    changed = v2.select_nodes("state:modified", state=old_state)
    print(f"state:modified -> {changed}")
    assert changed == ["fct_speeds"]

    rebuilt = v2.build(spark, select="state:modified+", state=old_state)
    print(f"slim rebuild: {sorted(rebuilt['results'])} "
          f"(mart_users untouched by selection)")
    # prerequisites build, the selection is the changed cone
    assert set(rebuilt["results"]) == {"stg_events", "fct_speeds", "mart_daily"}
    n = spark.table("mart_daily").agg(F.sum("n_events")).first()[0]
    print(f"mart_daily rebuilt under the new filter: {n} events kept")
    print("slim CI OK")


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 50_000,
        sys.argv[2] if len(sys.argv) > 2 else "slim_ci_wd",
    )
