"""Reference-parity queries: the core-transform pipeline shape
(``core_texi.sql:8-101``) applied to the driver's fixtures, the dbt test
surface (SURVEY.md §2.12), and the ML feature extraction (§2.2 P4/P8, §2.6
O2) — each with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.plans import dq
from data_etl_with_dbt_spark.suite.registry import big, epoch_diff_seconds, load, query

# ---------------------------------------------------------------------------
# Flagship: the reference core transform re-targeted at the events table.
# Same operator chain as core_texi.sql — md5 surrogate key over business
# columns, window dedup (newest first, total tie-break for determinism),
# epoch math with fractional seconds, guarded CASE derivations, sanity
# filters. Key columns are int/string so the PG text rendering is trivially
# identical in both engines; the double/timestamp rendering edge is covered
# by unit tests (tests/test_pg_compat.py).
# ---------------------------------------------------------------------------

_FLAGSHIP_ORACLE = """
WITH transformed AS (
    SELECT
        md5(concat(user_id, '-', event_type)) AS unique_id,
        event_id, user_id, event_type, ts AS event_ts, value,
        json_extract_string(props, '$.k') AS prop_k
    FROM events
    WHERE ts IS NOT NULL
), unique_records AS (
    SELECT *,
        row_number() OVER (
            PARTITION BY unique_id ORDER BY event_ts DESC, event_id DESC
        ) AS rn
    FROM transformed
)
SELECT
    unique_id, event_id, user_id, event_type, event_ts, value,
    CAST(prop_k AS BIGINT) AS prop_k,
    extract(epoch FROM event_ts - TIMESTAMP '2024-01-01') / 60 AS minutes_since_start,
    CASE
        WHEN value > 0 AND extract(epoch FROM event_ts - TIMESTAMP '2024-01-01') > 0
        THEN value / (extract(epoch FROM event_ts - TIMESTAMP '2024-01-01') / 3600)
        ELSE NULL
    END AS value_per_hour,
    value > 10 AS is_high_value
FROM unique_records
WHERE rn = 1
  AND extract(epoch FROM event_ts - TIMESTAMP '2024-01-01') > 0
"""


@query(
    "core_transform_events",
    oracle=_FLAGSHIP_ORACLE,
    description="Reference core_texi pipeline shape on events: md5 key, window dedup, epoch math, CASE, filters",
    bench=True,
)
def core_transform_events(spark, sf_dir):
    # Expression trees live in models/events.py, shared verbatim with the
    # streaming upsert sink (streaming/pipeline.core_transform_sink) so the
    # stream-vs-batch equivalence test runs the same columns.
    from data_etl_with_dbt_spark.models.events import transform_events

    return transform_events(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Data-quality test surface (T1-T5 protocol): each test's *violation query*
# as a suite query — the dbt contract is "pass iff zero rows", and the
# violation relation itself is what dbt materializes on failure.
# ---------------------------------------------------------------------------

@query(
    "dq_unique_violations",
    oracle="""
    SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n
    FROM lineitem GROUP BY l_orderkey HAVING count(*) > 1
    """,
    description="dbt `unique` test compiled form (A1) on a deliberately non-unique column",
)
def dq_unique_violations(spark, sf_dir):
    df = dq.unique(load(spark, sf_dir, "lineitem"), "l_orderkey")
    return df.select("l_orderkey", big(F.col("n")).alias("n"))


@query(
    "dq_not_null_violations",
    oracle="""
    WITH staged AS (
        SELECT o_orderkey, NULLIF(o_orderstatus, 'F') AS status_open
        FROM orders
    )
    SELECT o_orderkey, status_open FROM staged WHERE status_open IS NULL
    """,
    description=(
        "dbt `not_null` test compiled form (A2). Fixture-calibrated round "
        "4: the raw fixture has no NULLs anywhere, so the original "
        "o_orderdate form was vacuously empty (0=0 proves nothing — the "
        "q8/q22 recalibration rationale); the test now runs on a staged "
        "column (NULLIF over order status, the dbt staging-model shape) "
        "where violations exist at every sf"
    ),
)
def dq_not_null_violations(spark, sf_dir):
    staged = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.expr("nullif(o_orderstatus, 'F')").alias("status_open"),
    )
    return dq.not_null(staged, "status_open").select("o_orderkey", "status_open")


@query(
    "dq_positive_violations",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal <= 0
    """,
    description="reference custom_positive_test macro (P9) — violation rows",
)
def dq_positive_violations(spark, sf_dir):
    return dq.positive(load(spark, sf_dir, "customer"), "c_acctbal").select(
        "c_custkey", "c_acctbal"
    )


@query(
    "dq_threshold_violations",
    oracle="SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 400000",
    description="reference custom_speed_limit macro shape (P9): threshold violation finder",
)
def dq_threshold_violations(spark, sf_dir):
    return dq.speed_limit(load(spark, sf_dir, "orders"), "o_totalprice", max_speed=400000).select(
        "o_orderkey", "o_totalprice"
    )


@query(
    "dq_accepted_values_violations",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
    WHERE l_returnflag NOT IN ('A', 'N') OR l_returnflag IS NULL
    """,
    description=(
        "dbt `accepted_values` test compiled form. Fixture-calibrated "
        "round 4: the full ('A','N','R') set matched every fixture row, "
        "so the violation query was vacuously empty; the accepted set is "
        "now ('A','N') — the fixture's 'R' rows are the violations, so "
        "the NOT IN + NULL-handling logic is verified on actual rows"
    ),
)
def dq_accepted_values_violations(spark, sf_dir):
    return dq.accepted_values(
        load(spark, sf_dir, "lineitem"), "l_returnflag", ["A", "N"],
        flag_nulls=True,  # mirrors the oracle's explicit OR IS NULL arm
    ).select("l_orderkey", "l_linenumber", "l_returnflag")


@query(
    "dq_relationships_violations",
    oracle="""
    SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orphans
    FROM orders
    WHERE o_custkey IS NOT NULL
      AND o_custkey NOT IN (
          SELECT c_custkey FROM customer WHERE c_acctbal > 0
      )
    GROUP BY o_custkey
    """,
    description=(
        "dbt `relationships` (referential integrity) test — anti join. "
        "Fixture-calibrated round 4: the raw FK has zero orphans at every "
        "sf (vacuous 0=0), so the parent is now the in-good-standing "
        "dimension slice (c_acctbal > 0, the SCD-current-rows shape dbt "
        "projects refer to) — orders of negative-balance customers are "
        "the violations, non-empty at every sf"
    ),
)
def dq_relationships_violations(spark, sf_dir):
    good = load(spark, sf_dir, "customer").where(F.col("c_acctbal") > 0)
    v = dq.relationships(
        load(spark, sf_dir, "orders"), "o_custkey", good, "c_custkey"
    )
    return v.groupBy("o_custkey").agg(big(F.count(F.lit(1))).alias("n_orphans"))


# ---------------------------------------------------------------------------
# ML feature extraction (train.py:26-34): projection + positivity filters +
# capped extraction, made deterministic with a total sort (SURVEY §2.6 O2).
# ---------------------------------------------------------------------------

@query(
    "ml_feature_extraction",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax
    FROM lineitem
    WHERE l_quantity > 0 AND l_extendedprice > 0
    ORDER BY l_orderkey, l_linenumber
    LIMIT 1000
    """,
    description="ML training extraction: project + filter + deterministic sorted LIMIT",
)
def ml_feature_extraction(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.where((F.col("l_quantity") > 0) & (F.col("l_extendedprice") > 0))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(1000)
    )


@query(
    "surrogate_keys_events",
    oracle="""
    SELECT
        event_id,
        md5(concat(
            coalesce(CAST(user_id AS VARCHAR), ''), '-',
            coalesce(CAST(ts AS VARCHAR), ''), '-',
            coalesce(event_type, ''), '-',
            coalesce(CASE WHEN value = trunc(value) AND abs(value) < 1e15
                          THEN CAST(CAST(value AS BIGINT) AS VARCHAR)
                          ELSE CAST(value AS VARCHAR) END, '')
        )) AS unique_id
    FROM events
    """,
    description="PG-compat md5 surrogate key over int/timestamp/string/double columns — the byte-exact rendering hazard (SURVEY §7 #1: NULL-as-empty concat, integral doubles render without fraction)",
)
def surrogate_keys_events(spark, sf_dir):
    """Exercises functions/pg_compat.surrogate_key against an oracle that
    spells out PostgreSQL's text renderings (cited hazards:
    core_texi.sql:10-31 via SURVEY §2.9 F1/F2)."""
    from data_etl_with_dbt_spark.functions.pg_compat import surrogate_key

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        surrogate_key(ev.schema, ["user_id", "ts", "event_type", "value"]).alias("unique_id"),
    )
