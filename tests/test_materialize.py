"""The materialization scale-seam (r12): localCheckpoint at fixture scale,
one atomic versioned-table commit beyond a configured size threshold —
and the conditional spread for post-shuffle relations."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.materialize import (
    MAX_LOCAL_KEY,
    TABLE_DIR_KEY,
    _estimated_bytes,
    _size_conf_bytes,
    materialize,
    spread_small,
)


@pytest.fixture
def seam_conf(spark):
    """Restore the seam confs after a test that sets them."""
    yield spark
    for k in (MAX_LOCAL_KEY, TABLE_DIR_KEY):
        try:
            spark.conf.unset(k)
        except Exception:
            pass


def test_size_conf_parsing():
    assert _size_conf_bytes("134217728") == 128 * 1024**2
    assert _size_conf_bytes("128MB") == 128 * 1024**2
    assert _size_conf_bytes("1g") == 1024**3
    assert _size_conf_bytes("512b") == 512
    assert _size_conf_bytes(" 4K ") == 4096


def test_default_branch_is_local_checkpoint(spark):
    df = spark.range(100).withColumn("v", F.col("id") * 2)
    m = materialize(df)
    # localCheckpoint replaces the plan with an RDD scan — same rows,
    # no parquet relation, nothing written anywhere
    assert "LogicalRDD" in m._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r.v for r in m.collect()) == sorted(
        r.v for r in df.collect()
    )


def test_threshold_routes_to_versioned_table(seam_conf, tmp_path):
    from data_etl_with_dbt_spark.sources import versioned as V

    spark = seam_conf
    spark.conf.set(MAX_LOCAL_KEY, "1")  # force the over-threshold branch
    spark.conf.set(TABLE_DIR_KEY, str(tmp_path / "mat"))
    df = spark.range(50).withColumn("v", F.col("id") % 7)
    assert _estimated_bytes(df) > 1
    m = materialize(df)
    plan = m._jdf.queryExecution().optimizedPlan().toString()
    assert "parquet" in plan.lower()  # snapshot read of the committed table
    assert sorted((r.id, r.v) for r in m.collect()) == sorted(
        (r.id, r.v) for r in df.collect()
    )
    tables = list((tmp_path / "mat").iterdir())
    assert len(tables) == 1
    assert V.list_versions(str(tables[0])) == [1]


def test_over_threshold_without_table_dir_stays_local(seam_conf):
    spark = seam_conf
    spark.conf.set(MAX_LOCAL_KEY, "1")
    df = spark.range(10)
    m = materialize(df)
    assert "LogicalRDD" in m._jdf.queryExecution().optimizedPlan().toString()


def test_spread_small_fires_only_below_threshold(spark, testdata):
    docs = testdata["documents"].select("doc_id", "text").distinct()
    # fixture-sized relation ≪ cores x maxPartitionBytes → spread fires
    s = spread_small(docs)
    assert s is not docs
    assert (
        "RoundRobinPartitioning"
        in s._jdf.queryExecution().sparkPlan().toString()
    )
    # simulate warehouse scale by shrinking the threshold → no-op
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "1b")
        assert spread_small(docs) is docs
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
