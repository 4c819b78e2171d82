"""SCD2 snapshot tests: insert, change, no-op generations."""

from __future__ import annotations

import datetime as dt

import pytest

from data_etl_with_dbt_spark.plans.snapshot import snapshot

T1 = dt.datetime(2024, 1, 1, 0, 0, 0)
T2 = dt.datetime(2024, 1, 2, 0, 0, 0)
T3 = dt.datetime(2024, 1, 3, 0, 0, 0)


@pytest.fixture()
def clean(spark):
    yield
    spark.sql("DROP TABLE IF EXISTS snap_t")


def test_scd2_generations(spark, clean):
    g1 = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, bal double"
    )
    s1 = snapshot(spark, "snap_t", g1, "id", run_ts=T1)
    assert s1.count() == 2
    assert s1.where("valid_to IS NOT NULL").count() == 0

    # generation 2: bob's balance changes, carol appears
    g2 = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 25.0), (3, "carol", 5.0)],
        "id long, name string, bal double",
    )
    s2 = snapshot(spark, "snap_t", g2, "id", run_ts=T2)
    rows = {(r.id, r.valid_from, r.valid_to): r for r in s2.collect()}
    assert s2.count() == 4  # alice open, bob closed + bob v2 open, carol open
    bob_versions = s2.where("id = 2").orderBy("valid_from").collect()
    assert [v.bal for v in bob_versions] == [20.0, 25.0]
    assert bob_versions[0].valid_to == T2 and bob_versions[1].valid_to is None
    assert s2.where("id = 1").first().valid_to is None

    # generation 3: identical input → no-op
    s3 = snapshot(spark, "snap_t", g2, "id", run_ts=T3)
    assert s3.count() == 4
    assert s3.where("valid_to IS NOT NULL").count() == 1


def test_current_view_semantics(spark, clean):
    g1 = spark.createDataFrame([(1, "x")], "id long, v string")
    snapshot(spark, "snap_t", g1, "id", run_ts=T1)
    g2 = spark.createDataFrame([(1, "y")], "id long, v string")
    s = snapshot(spark, "snap_t", g2, "id", run_ts=T2)
    current = s.where("valid_to IS NULL")
    assert current.count() == 1
    assert current.first().v == "y"


def test_as_of_time_travel(spark, clean):
    from data_etl_with_dbt_spark.plans.snapshot import as_of

    g1 = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 20.0)], "id long, name string, bal double"
    )
    snapshot(spark, "snap_t", g1, "id", run_ts=T1)
    g2 = spark.createDataFrame(
        [(1, "alice", 10.0), (2, "bob", 25.0), (3, "carol", 5.0)],
        "id long, name string, bal double",
    )
    snap = snapshot(spark, "snap_t", g2, "id", run_ts=T2)

    # between generations: bob still at 20, carol absent
    mid = as_of(snap, T1 + dt.timedelta(hours=6))
    assert {(r.id, r.bal) for r in mid.collect()} == {(1, 10.0), (2, 20.0)}
    # exactly at T2: new versions current (valid_from <= ts < valid_to)
    now = as_of(snap, T2)
    assert {(r.id, r.bal) for r in now.collect()} == {
        (1, 10.0), (2, 25.0), (3, 5.0),
    }
    # before any history: empty
    assert as_of(snap, T1 - dt.timedelta(days=1)).count() == 0
    # bookkeeping columns dropped, version stamp kept
    assert "valid_to" not in mid.columns and "valid_from" in mid.columns


def test_duplicate_or_null_keys_rejected(spark, clean):
    """SCD2 corruption guard (round-5 review): duplicate unique_key rows
    would close the current version once PER duplicate and open multiple
    current versions; NULL keys join nothing and silently fork history."""
    dup = spark.createDataFrame(
        [(1, "alice", 10.0), (1, "alias", 11.0), (2, "bob", 20.0)],
        "id long, name string, bal double",
    )
    with pytest.raises(ValueError, match="duplicate"):
        snapshot(spark, "snap_t", dup, unique_key="id", run_ts=T1)
    nulls = spark.createDataFrame(
        [(None, "ghost", 0.0), (2, "bob", 20.0)],
        "id long, name string, bal double",
    )
    with pytest.raises(ValueError, match="NULL"):
        snapshot(spark, "snap_t", nulls, unique_key="id", run_ts=T1)
