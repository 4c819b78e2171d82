"""Executed JDBC source/sink coverage (reference S5/F11: ``train.py:26-34``
reads Postgres via a query; ``ETL/ETL.py:52`` appends chunked inserts).

No external database exists in this environment, but Spark bundles Apache
Derby — a real JDBC engine running embedded in the same JVM — so the whole
read/write surface executes for real here: round-trips, partitioned
parallel reads, pushed-down query sources, append and truncate-reload
modes. Against a networked warehouse only the URL/driver options change.
"""

from __future__ import annotations

import pytest

from data_etl_with_dbt_spark.sources.io import read_jdbc, write_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby")
    # Derby writes derby.log under derby.system.home; point it at the temp
    # dir BEFORE the engine first loads so the repo cwd stays clean.
    spark._jvm.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/testdb;create=true"


@pytest.fixture(scope="module")
def seeded(spark, derby_url):
    df = spark.range(0, 1000).selectExpr(
        "id", "CAST(id % 7 AS DOUBLE) AS v", "CONCAT('name_', id) AS name"
    )
    write_jdbc(df, derby_url, "people", mode="overwrite", driver=DRIVER)
    return df


class TestJdbc:
    def test_round_trip(self, spark, derby_url, seeded):
        back = read_jdbc(spark, derby_url, "people", driver=DRIVER)
        assert back.count() == 1000
        got = {(r.id, r.v, r.name) for r in back.collect()}
        want = {(r.id, r.v, r.name) for r in seeded.collect()}
        assert got == want

    def test_partitioned_parallel_read(self, spark, derby_url, seeded):
        """The 100 TB-relevant shape: bounds split the scan into concurrent
        per-partition range queries instead of one connection's full scan."""
        back = read_jdbc(
            spark,
            derby_url,
            "people",
            partition_column="id",
            num_partitions=4,
            lower_bound=0,
            upper_bound=1000,
            driver=DRIVER,
        )
        assert back.rdd.getNumPartitions() == 4
        assert back.count() == 1000
        # every partition carries rows — the split predicates cover the range
        sizes = back.rdd.mapPartitions(lambda it: [sum(1 for _ in it)]).collect()
        assert all(s > 0 for s in sizes)

    def test_query_source_pushes_down(self, spark, derby_url, seeded):
        """S5 is a *query* source: the subquery runs database-side, so Spark
        only ever sees the filtered projection (reference train.py reads
        `SELECT ... FROM table` the same way)."""
        back = read_jdbc(
            spark,
            derby_url,
            '(SELECT "id", "v" FROM people WHERE "id" < 50) q',
            driver=DRIVER,
        )
        assert back.count() == 50
        assert set(back.columns) == {"id", "v"}

    def test_append_mode(self, spark, derby_url, seeded):
        extra = spark.range(1000, 1100).selectExpr(
            "id", "CAST(0.5 AS DOUBLE) AS v", "CONCAT('name_', id) AS name"
        )
        write_jdbc(extra, derby_url, "people", mode="append", driver=DRIVER)
        assert read_jdbc(spark, derby_url, "people", driver=DRIVER).count() == 1100

    def test_truncate_before_load(self, spark, derby_url, seeded):
        """S4 over JDBC: TRUNCATE keeps the table's DDL while replacing the
        rows — rerunning a load is idempotent, not additive."""
        fresh = spark.range(0, 10).selectExpr(
            "id", "CAST(1.0 AS DOUBLE) AS v", "CONCAT('name_', id) AS name"
        )
        write_jdbc(fresh, derby_url, "people", mode="overwrite", truncate=True, driver=DRIVER)
        back = read_jdbc(spark, derby_url, "people", driver=DRIVER)
        assert back.count() == 10


def test_federated_three_source_join(spark, derby_url, seeded, testdata):
    """One Catalyst plan joining THREE source kinds — a parquet fixture
    (events), an embedded-JDBC table (Derby 'people'), and the Python Data
    Source generator (synthetic_docs) — the federation story: every
    connector surfaces as a DataFrame, so cross-source joins are just
    joins, with each source's own pushdown semantics intact."""
    from pyspark.sql import functions as F

    from data_etl_with_dbt_spark.sources import register_synthetic_source

    register_synthetic_source(spark)
    ev = testdata["events"].groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    people = read_jdbc(spark, derby_url, "people", driver=DRIVER).select(
        F.col("id").alias("user_id"), "name"
    )
    docs = (
        spark.read.format("synthetic_docs")
        .option("rows", 200)
        .load()
        .select((F.col("doc_id") % 15 + 1).alias("user_id"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    out = ev.join(people, "user_id").join(docs, "user_id")
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.name == f"name_{r.user_id}"
        assert r.n_events > 0 and r.n_docs > 0
    # totals survive the federation: every event user with a Derby row and
    # at least one synthetic doc appears exactly once
    assert out.groupBy("user_id").count().where("count > 1").count() == 0
