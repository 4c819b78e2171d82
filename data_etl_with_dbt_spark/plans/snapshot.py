"""dbt-style snapshots: slowly-changing-dimension (SCD2) history tables.

The reference's dbt project has a ``snapshots/`` directory (empty —
``dbt_postgres/snapshots/.gitkeep``); this implements the capability it's
scaffolded for: track row versions over time with ``valid_from``/``valid_to``
windows, dbt's "check" strategy (a content hash over tracked columns decides
whether a row changed).

Parquet-native merge: the new snapshot generation is composed as
(closed-out history) ∪ (unchanged current) ∪ (closed changed rows) ∪
(new versions), then atomically overwritten. ``localCheckpoint`` materializes
the new generation first — Spark cannot overwrite a table that the plan is
still reading. On a real deployment you'd target a table format with MERGE
(Delta/Iceberg); the composition is identical.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.sources.io import write_table

_META = ["valid_from", "valid_to", "row_hash"]


def _content_hash(df: DataFrame, cols: list[str]):
    return F.md5(
        F.concat_ws("||", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in cols])
    )


def snapshot(
    spark: SparkSession,
    name: str,
    df: DataFrame,
    unique_key: str,
    check_cols: list[str] | None = None,
    run_ts: dt.datetime | None = None,
) -> DataFrame:
    """Apply one snapshot generation of ``df`` into history table ``name``.

    * new key → insert with ``valid_from=run_ts, valid_to=NULL``
    * changed content (hash over ``check_cols``, default: all non-key
      columns) → close the current version at ``run_ts``, insert the new one
    * unchanged / departed keys → untouched (departed rows stay open, as in
      dbt's default; close them with a follow-up policy if needed)

    ``run_ts`` pins the clock for deterministic tests.
    """
    check_cols = check_cols or [c for c in df.columns if c != unique_key]
    ts = F.lit(run_ts).cast("timestamp") if run_ts else F.current_timestamp()

    fresh = df.select(
        unique_key, *check_cols
    ).withColumn("row_hash", _content_hash(df, check_cols))

    # SCD2's contract is one row per key per generation: duplicate keys
    # fan out BOTH joins below (the current row closes once per duplicate,
    # and every duplicate inserts an open version), corrupting the table
    # compoundingly — fail loudly instead, like dbt's uniqueness
    # expectation on a snapshot's unique_key. One metadata-scale aggregate.
    counts = fresh.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(F.col(unique_key)).alias("k"),
        F.count(F.when(F.col(unique_key).isNull(), 1)).alias("nulls"),
    ).first()
    if counts["n"] != counts["k"] or counts["nulls"]:
        raise ValueError(
            f"snapshot {name!r}: unique_key {unique_key!r} has "
            f"{counts['n'] - counts['k']} duplicate and {counts['nulls']} "
            "NULL key rows — deduplicate upstream (e.g. keep the latest "
            "per key) before snapshotting"
        )

    if not spark.catalog.tableExists(name):
        first = fresh.select(
            "*", ts.alias("valid_from"), F.lit(None).cast("timestamp").alias("valid_to")
        )
        write_table(first, name, mode="overwrite")
        return spark.table(name)

    snap = spark.table(name)
    history = snap.where(F.col("valid_to").isNotNull())
    current = snap.where(F.col("valid_to").isNull())

    fresh_k = fresh.select(
        F.col(unique_key).alias("__k"), F.col("row_hash").alias("__new_hash")
    )
    keyed = current.join(fresh_k, current[unique_key] == fresh_k["__k"], "left")

    unchanged = keyed.where(
        F.col("__new_hash").isNull() | (F.col("row_hash") == F.col("__new_hash"))
    ).select(*snap.columns)
    closed = keyed.where(
        F.col("__new_hash").isNotNull() & (F.col("row_hash") != F.col("__new_hash"))
    ).select(*[c for c in snap.columns if c != "valid_to"], ts.alias("valid_to")).select(*snap.columns)

    current_keyed = current.select(
        F.col(unique_key).alias("__k"), F.col("row_hash").alias("__cur_hash")
    )
    inserts = (
        fresh.join(current_keyed, fresh[unique_key] == current_keyed["__k"], "left")
        .where(F.col("__cur_hash").isNull() | (F.col("row_hash") != F.col("__cur_hash")))
        .select(
            *fresh.columns, ts.alias("valid_from"), F.lit(None).cast("timestamp").alias("valid_to")
        )
        .select(*snap.columns)
    )

    new_gen = history.unionByName(unchanged).unionByName(closed).unionByName(inserts)
    # Materialize before overwriting the table this plan reads from.
    new_gen = new_gen.localCheckpoint(eager=True)
    write_table(new_gen, name, mode="overwrite")
    return spark.table(name)


def as_of(snap: DataFrame, ts) -> DataFrame:
    """Point-in-time view of an SCD2 snapshot: the rows that were current
    at ``ts`` — ``valid_from <= ts < valid_to`` (open ``valid_to`` = still
    current). The query every consumer of a snapshot hand-writes; as a
    helper it can't be written with the half-open interval backwards.
    Returns the business columns plus ``valid_from`` (the version stamp),
    dropping ``valid_to``/``row_hash`` bookkeeping.

    At scale both predicates push into the parquet scan (min/max pruning
    on ``valid_from`` when snapshots are written time-partitioned)."""
    t = F.lit(ts).cast("timestamp")
    return (
        snap.where(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        )
        .drop("valid_to", "row_hash")
    )
