"""SparkSession factory with the engine's semantics pinned.

Semantics decisions (SURVEY.md §1.3):

* ``spark.sql.ansi.enabled = false`` — PostgreSQL raises on malformed casts;
  Spark non-ANSI returns NULL. The pipeline's *intent* (coerce, drop bad rows
  via data-quality tests) is closer to null-on-error, so we pin non-ANSI and
  document the divergence. (Spark 4 defaults ANSI on, hence explicit.)
* ``spark.sql.session.timeZone = UTC`` — deterministic timestamp semantics
  across engines (parquet fixtures are timezone-naive; DuckDB oracle runs UTC).
* ``spark.sql.caseSensitive = false`` (default) absorbs the reference's quoted
  mixed-case CSV headers ("VendorID" vs vendor_id).
* AQE on with skew-join handling — the 100 TB posture: runtime coalescing of
  shuffle partitions and skew splitting instead of hand-tuned partition counts.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster these are
# overridden by spark-submit conf. shuffle.partitions is a *starting* value —
# AQE coalesces small partitions and splits skewed ones at runtime, so the
# same code runs at sf0.001 and at 100 TB (where you'd submit with e.g.
# spark.sql.shuffle.partitions=4000 and let AQE trim).
_ENGINE_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    # Parquet TIMESTAMP(NANOS) columns (e.g. the round-1 events fixture) are
    # illegal for Spark's reader; read them as long and convert in the loader
    # (sources/io.py) — DuckDB truncates the same way, so semantics align.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive (isAdjustedToUTC=false) parquet timestamps — the round-2 events
    # fixture is TIMESTAMP(MICROS, naive) — default to TIMESTAMP_NTZ on
    # Spark 4, which unix_micros/window-range arithmetic rejects. Read them
    # as session-local TIMESTAMP instead: with the UTC session timezone the
    # wall-clock values are identical to DuckDB's naive semantics (how round
    # 1's nanos→timestamp_micros path already behaved).
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas_udf / applyInPandas / toPandas path.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Broadcast threshold: dims like region/nation/supplier must broadcast.
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # Parquet vectorized reader + pushdown are default-on; pin anyway.
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Spark still DEFAULTS timestamp output to the deprecated INT96, which
    # carries NO parquet min/max statistics — footer pruning, manifest
    # stats (sources/versioned), and cross-engine readers all lose on it.
    # TIMESTAMP_MICROS is the modern annotated type every engine reads.
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # Local shuffle: modest partition count, AQE coalesces below it.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    "spark.ui.enabled": "false",
}


def get_spark(
    app_name: str = "data-etl-with-dbt-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine semantics pinned.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster,
    leave it None and let spark-submit decide. ``extra_conf`` lets callers set
    static configs (e.g. a temp ``spark.sql.warehouse.dir`` in tests).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is not None:
        builder = builder.master(master)
    for k, v in {**_ENGINE_CONF, **(extra_conf or {})}.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Pin runtime-settable engine semantics on an externally-created session
    (the driver passes its own SparkSession to ``__spark_entry__.entry``)."""
    for k, v in _ENGINE_CONF.items():
        if k.startswith("spark.sql."):
            try:
                spark.conf.set(k, v)
            except Exception:
                pass  # static conf on a running session — keep going
    return spark
