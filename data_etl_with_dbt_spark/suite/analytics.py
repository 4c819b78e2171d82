"""Product-analytics surface: ordered funnels, cohort retention, and
regression-by-aggregates over the events fixture.

Determinism: funnels and cohorts are counts over min-timestamps (exact in
both engines); the regression coefficients are computed from decimal-exact
component sums (Sx, Sy, Sxy, Sxx) with the closed-form slope/intercept
evaluated in per-row double arithmetic — bit-identical cross-engine,
unlike the built-in ``regr_*`` aggregates whose double accumulation is
summation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.suite.registry import big, davg, dec6, dsum, load, query

# ---------------------------------------------------------------------------
# Ordered funnel: view -> click -> purchase, strictly increasing timestamps.
# ---------------------------------------------------------------------------

@query(
    "funnel_view_click_purchase",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.t1
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.t2
        GROUP BY e.user_id
    )
    SELECT
        CAST((SELECT count(*) FROM v) AS BIGINT) AS n_view,
        CAST((SELECT count(*) FROM c) AS BIGINT) AS n_view_click,
        CAST((SELECT count(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
    description="Ordered 3-stage funnel (first view -> later click -> later purchase), stage-survivor counts",
)
def funnel_view_click_purchase(spark, sf_dir):
    ev = load(spark, sf_dir, "events")

    def first_after(event_type: str, prev, prev_t: str, out_t: str):
        e = ev.where(F.col("event_type") == event_type).select("user_id", "ts")
        return (
            e.join(prev, "user_id")
            .where(F.col("ts") > F.col(prev_t))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out_t))
        )

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c.select("user_id", "t2"), "t2", "t3")
    return (
        v.agg(big(F.count(F.lit(1))).alias("n_view"))
        .crossJoin(c.agg(big(F.count(F.lit(1))).alias("n_view_click")))
        .crossJoin(p.agg(big(F.count(F.lit(1))).alias("n_view_click_purchase")))
    )


# ---------------------------------------------------------------------------
# Cohort retention: users grouped by first-seen week x weeks since.
# ---------------------------------------------------------------------------

@query(
    "cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', min(ts)) AS cohort_week
        FROM events GROUP BY user_id
    )
    SELECT
        f.cohort_week,
        CAST(datediff('week', f.cohort_week, date_trunc('week', e.ts)) AS BIGINT) AS weeks_since,
        CAST(count(DISTINCT e.user_id) AS BIGINT) AS active_users
    FROM events e
    JOIN firsts f ON e.user_id = f.user_id
    GROUP BY f.cohort_week, weeks_since
    """,
    description="Cohort retention triangle: first-seen week x weeks-since, distinct active users",
)
def cohort_retention(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    weeks_since = (
        F.datediff(F.date_trunc("week", F.col("ts")), F.col("cohort_week")) / 7
    ).cast("bigint")
    return (
        ev.join(firsts, "user_id")
        .groupBy("cohort_week", weeks_since.alias("weeks_since"))
        .agg(big(F.countDistinct("user_id")).alias("active_users"))
    )


# ---------------------------------------------------------------------------
# Regression by exact aggregates (slope/intercept of price on quantity).
# ---------------------------------------------------------------------------

@query(
    "agg_linear_regression",
    oracle="""
    WITH comp AS (
        SELECT l_returnflag,
               CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sxx
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept,
           CAST(n AS BIGINT) AS n_points
    FROM comp
    """,
    description="OLS slope/intercept per group from decimal-exact component sums (deterministic alternative to regr_* aggregates)",
)
def agg_linear_regression(spark, sf_dir):

    li = load(spark, sf_dir, "lineitem")
    comp = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("l_quantity")).alias("sx"),
        dsum(F.col("l_extendedprice")).alias("sy"),
        dsum(F.col("l_quantity") * F.col("l_extendedprice")).alias("sxy"),
        dsum(F.col("l_quantity") * F.col("l_quantity")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    return comp.select(
        "l_returnflag",
        slope.alias("slope"),
        intercept.alias("intercept"),
        big(F.col("n")).alias("n_points"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average value per user (TWAP) — each observation weighted
# by its holding time until the next event.
# ---------------------------------------------------------------------------

@query(
    "time_weighted_average",
    oracle="""
    WITH seg AS (
        SELECT user_id, value,
               epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS dt_us
        FROM events
    )
    SELECT user_id,
           CAST(CAST(CAST(SUM(CAST(value AS DECIMAL(12,6)) * CAST(dt_us AS DECIMAL(25,0))) AS VARCHAR) AS DOUBLE)
              / CAST(SUM(dt_us) AS DOUBLE) AS DOUBLE) AS twap
    FROM seg
    WHERE dt_us IS NOT NULL
    GROUP BY user_id
    """,
    description="Per-user time-weighted average (TWAP): lead() holding intervals kept in INTEGER micros, weighted sum in exact decimal arithmetic",
)
def time_weighted_average(spark, sf_dir):
    # Determinism: the holding interval stays integer microseconds, and the
    # weight product happens in DECIMAL (value rounds like dsum; dt_us is
    # exact) — multiplying in doubles first would create timestamp-derived
    # doubles whose decimal cast rounds differently across engines
    # (registry rules / BENCH_NOTES). The final decimal→double conversion
    # goes through a STRING cast: direct conversion of decimals whose
    # unscaled value exceeds ~2^53 (21 digits here) is off by 1 ulp between
    # engines, while string→double is correctly rounded in both.

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt_us = F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))
    seg = ev.select("user_id", "value", dt_us.alias("dt_us")).where(
        F.col("dt_us").isNotNull()
    )
    # DECIMAL(12,6) x DECIMAL(25,0) -> DECIMAL(38,6) exactly, in BOTH engines
    # (wider operands overflow DuckDB's 38-digit product width).
    weighted = F.col("value").cast("decimal(12,6)") * F.col("dt_us").cast("decimal(25,0)")
    return seg.groupBy("user_id").agg(
        (F.sum(weighted).cast("string").cast("double") / F.sum("dt_us").cast("double"))
        .cast("double")
        .alias("twap")
    )


# ---------------------------------------------------------------------------
# Robust outlier detection: median / MAD (median absolute deviation) per
# group, then count points beyond the 3-sigma-equivalent robust band.
# ---------------------------------------------------------------------------

@query(
    "mad_outliers_by_type",
    oracle="""
    WITH med AS (
        SELECT event_type,
               CAST(CAST(quantile_cont(value, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, m.med, abs(e.value - m.med) AS dev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, med,
               CAST(CAST(quantile_cont(dev, 0.5) AS DECIMAL(38,6)) AS DOUBLE) AS mad
        FROM dev GROUP BY event_type, med
    )
    SELECT d.event_type, m.med, m.mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(CASE WHEN d.dev > m.mad * 4.4478 THEN 1 END) AS BIGINT)
               AS n_outliers
    FROM dev d JOIN mad m ON d.event_type = m.event_type
    GROUP BY d.event_type, m.med, m.mad
    """,
    description=(
        "Robust per-group outliers: median + MAD (both DECIMAL(38,6)-quantized "
        "so the robust band is bit-identical cross-engine), count beyond "
        "3*1.4826*MAD"
    ),
)
def mad_outliers_by_type(spark, sf_dir):
    # Two sort-aggs + two broadcast joins back; the group cardinality is tiny
    # (one row per event_type) so the median tables broadcast. The band
    # threshold is a SINGLE multiply (mad * 4.4478) — spelling it 3*1.4826*mad
    # would leave the association order to each engine's constant folder.
    # The exact-percentile noise is absorbed by the dec6 grid (registry rules);
    # dev = abs(x - med) is then one IEEE subtraction of identical bits.
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        dec6(F.expr("percentile(value, 0.5)")).alias("med")
    )
    # dev feeds TWO consumers (the MAD agg and the final outlier count);
    # without a lineage cut the events scan + median agg + join re-run
    dev = (
        ev.join(F.broadcast(med), "event_type")
        .select(
            "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("dev")
        )
        .transform(materialize)
    )
    mad = dev.groupBy("event_type", "med").agg(
        dec6(F.expr("percentile(dev, 0.5)")).alias("mad")
    )
    return (
        dev.select("event_type", "dev")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            big(F.count(F.lit(1))).alias("n"),
            big(
                F.count(F.when(F.col("dev") > F.col("mad") * F.lit(4.4478), 1))
            ).alias("n_outliers"),
        )
    )


# ---------------------------------------------------------------------------
# Deterministic per-group mode: most frequent prop_k per event_type (argmax
# with a total-order tie-break — max_by/arg_max tie behavior is engine-
# defined, so the window form is the only cross-engine-safe spelling).
# ---------------------------------------------------------------------------

@query(
    "mode_per_event_type",
    oracle="""
    SELECT event_type, prop_k AS mode_prop_k, CAST(c AS BIGINT) AS n
    FROM (
        SELECT event_type, prop_k, c,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY c DESC, prop_k
               ) AS rn
        FROM (
            SELECT event_type, json_extract_string(props, '$.k') AS prop_k,
                   count(*) AS c
            FROM events GROUP BY 1, 2
        )
    ) WHERE rn = 1
    """,
    description=(
        "Per-group mode of a JSON-extracted property (two-level agg + "
        "WindowGroupLimit argmax; ties broken by value for determinism)"
    ),
)
def mode_per_event_type(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.select(
            "event_type", F.get_json_object("props", "$.k").alias("prop_k")
        )
        .groupBy("event_type", "prop_k")
        .agg(F.count(F.lit(1)).alias("c"))
    )

    w = Window.partitionBy("event_type").orderBy(F.col("c").desc(), "prop_k")
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_type", F.col("prop_k").alias("mode_prop_k"), big(F.col("c")).alias("n"))
    )


# ---------------------------------------------------------------------------
# Mergeable HLL cardinality sketches (Apache DataSketches via Spark 3.5+
# hll_sketch_agg/hll_union_agg): the 100 TB distinct-count workflow — build
# per-group sketch partials once, merge them for any rollup WITHOUT
# re-scanning the fact table. Rows-only (the sketch estimate has no
# cross-engine oracle; DuckDB's approx_count_distinct is a different
# algorithm); accuracy vs exact distinct is asserted in pytest.
# ---------------------------------------------------------------------------

@query(
    "hll_user_cardinality",
    oracle=None,
    description=(
        "Per-event-type distinct-user estimates from HLL sketches plus an "
        "ALL row merged from the per-type sketches (hll_union_agg) — the "
        "mergeable-partials pattern: rollups come from sketch merges, not "
        "fact-table re-scans"
    ),
)
def hll_user_cardinality(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    # one sketch per type (5 rows): checkpoint so the merged ALL row reuses
    # the per-type partials instead of re-aggregating the fact table
    per_type = per_type.transform(materialize)
    typed = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    merged = per_type.agg(F.hll_union_agg("sk").alias("sk")).select(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate("sk").cast("bigint").alias("approx_users"),
    )
    return typed.unionByName(merged).orderBy("event_type")


# ---------------------------------------------------------------------------
# Spark 4 VARIANT path for semi-structured data: parse the JSON column ONCE
# into a variant and extract typed fields — the engine-native replacement
# for repeated get_json_object string re-parses (each get_json_object call
# re-parses the whole document; variant parses once and extraction is a
# binary-encoded path walk). Integer extraction keeps it oracle-exact.
# ---------------------------------------------------------------------------

@query(
    "variant_props_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS min_k,
           CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS max_k,
           CAST(count(DISTINCT CAST(json_extract(props, '$.k') AS BIGINT))
                AS BIGINT) AS distinct_k
    FROM events
    GROUP BY event_type
    """,
    description=(
        "Typed stats over a VARIANT-parsed JSON property per event type — "
        "parse once (parse_json), extract typed (variant_get), aggregate "
        "exact integers"
    ),
)
def variant_props_stats(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            big(F.count(F.lit(1))).alias("n"),
            big(F.sum("k")).alias("sum_k"),
            big(F.min("k")).alias("min_k"),
            big(F.max("k")).alias("max_k"),
            big(F.count_distinct("k")).alias("distinct_k"),
        )
    )


# ---------------------------------------------------------------------------
# Skew diagnosis over orders.o_custkey: deterministic end to end (integer
# counts, one IEEE share division, ceil on the 32-partition grid), so the
# operator's whole output — including the salt suggestions — oracle-checks.
# ---------------------------------------------------------------------------

@query(
    "skew_stats_orders",
    oracle="""
    WITH counts AS (
        SELECT o_custkey, count(*) AS key_rows FROM orders GROUP BY o_custkey
    ),
    total AS (SELECT sum(key_rows) AS t FROM counts),
    top AS (
        SELECT o_custkey, key_rows FROM counts
        ORDER BY key_rows DESC, o_custkey LIMIT 10
    )
    SELECT o_custkey,
           CAST(key_rows AS BIGINT) AS key_rows,
           CAST(key_rows AS DOUBLE) / CAST(t AS DOUBLE) AS key_share,
           greatest(CAST(1 AS BIGINT),
                    CAST(ceil(CAST(key_rows AS DOUBLE) / CAST(t AS DOUBLE)
                              * 32) AS BIGINT)) AS suggested_salt
    FROM top, total
    """,
    description=(
        "Key-skew diagnosis on orders.o_custkey: top-10 heaviest keys, row "
        "shares, salt-bucket suggestions at parallelism 32 — "
        "TakeOrderedAndProject + broadcast scalar total, fully "
        "oracle-checked"
    ),
)
def skew_stats_orders(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.relational import skew_stats

    out = skew_stats(
        load(spark, sf_dir, "orders"), ["o_custkey"], top_k=10, parallelism=32
    )
    return out.select(
        "o_custkey",
        big(F.col("key_rows")).alias("key_rows"),
        F.col("key_share"),
        big(F.col("suggested_salt")).alias("suggested_salt"),
    )


# ---------------------------------------------------------------------------
# Half-life time-decayed aggregation (recency-weighted engagement score).
# Cross-engine determinism without a transcendental in the hash path: the
# decay exponent is an INTEGER (age bucketed by the half-life), so the
# weight is an exact power of two — pow(0.5, k) is exactly representable
# and multiplying a double by it only shifts the exponent (lossless). The
# weighted values are then summed under the dsum decimal rule.
# ---------------------------------------------------------------------------

@query(
    "half_life_decay_value",
    oracle="""
    WITH base AS (
        SELECT user_id, value,
               date_diff('day', CAST(ts AS DATE), DATE '2024-02-01') AS age
        FROM events
    )
    SELECT user_id,
           CAST(SUM(CAST(value * pow(0.5, floor(age / 7)) AS DECIMAL(18,6))) AS DOUBLE)
               AS decayed_value,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(min(age) AS BIGINT) AS min_age_days
    FROM base GROUP BY user_id
    """,
    description=(
        "Per-user half-life decayed value sum (7-day half-life, integer "
        "age buckets -> exact power-of-two weights, no libm in the hash "
        "path)"
    ),
)
def half_life_decay_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    age = F.datediff(F.lit("2024-02-01").cast("date"), F.to_date("ts"))
    w = F.pow(F.lit(0.5), F.floor(age / F.lit(7)))
    return (
        ev.select("user_id", (F.col("value") * w).alias("__c"), age.alias("__age"))
        .groupBy("user_id")
        .agg(
            dsum(F.col("__c")).alias("decayed_value"),
            big(F.count(F.lit(1))).alias("n_events"),
            big(F.min("__age")).alias("min_age_days"),
        )
    )


# ---------------------------------------------------------------------------
# Schema-generic column profiling in one pass (the dbt-docs / warehouse
# profiling surface). Exact distinct counts here (oracle-comparable); the
# operator's exact=False flag switches to HLL partials for 100 TB runs.
# ---------------------------------------------------------------------------

@query(
    "profile_orders",
    oracle="""
    WITH a AS (
        SELECT count(*) AS n,
               count(o_orderkey) AS nn0, count(DISTINCT o_orderkey) AS nd0,
               count(o_custkey) AS nn1, count(DISTINCT o_custkey) AS nd1,
               count(o_orderstatus) AS nn2, count(DISTINCT o_orderstatus) AS nd2,
               count(o_totalprice) AS nn3, count(DISTINCT o_totalprice) AS nd3,
               count(o_orderdate) AS nn4, count(DISTINCT o_orderdate) AS nd4,
               count(o_orderpriority) AS nn5, count(DISTINCT o_orderpriority) AS nd5
        FROM orders
    )
    SELECT 'o_orderkey' AS col_name, CAST(n - nn0 AS BIGINT) AS n_null, CAST(nd0 AS BIGINT) AS n_distinct FROM a
    UNION ALL SELECT 'o_custkey', CAST(n - nn1 AS BIGINT), CAST(nd1 AS BIGINT) FROM a
    UNION ALL SELECT 'o_orderstatus', CAST(n - nn2 AS BIGINT), CAST(nd2 AS BIGINT) FROM a
    UNION ALL SELECT 'o_totalprice', CAST(n - nn3 AS BIGINT), CAST(nd3 AS BIGINT) FROM a
    UNION ALL SELECT 'o_orderdate', CAST(n - nn4 AS BIGINT), CAST(nd4 AS BIGINT) FROM a
    UNION ALL SELECT 'o_orderpriority', CAST(n - nn5 AS BIGINT), CAST(nd5 AS BIGINT) FROM a
    """,
    description=(
        "One-pass schema-generic column profile of orders: per-column null "
        "count + exact distinct count, reshaped long with stack()"
    ),
)
def profile_orders(spark, sf_dir):
    from data_etl_with_dbt_spark.plans.monitor import profile_frame

    return profile_frame(load(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Two-sample distribution drift: chi-square homogeneity statistic + the
# (binned) Kolmogorov-Smirnov statistic between two cohorts of one column,
# here even- vs odd-user events. Complements plans/monitor.psi_drift (PSI is
# scored driver-side over collected bucket rows; this one is end-to-end
# inside the engine and oracle-checked). Shape at 100 TB: one min/max agg
# (broadcast back as a 1-row frame), one map-side-combined count per bin —
# the windows and the chi-square/KS fold run over the N_BINS-row bucket
# frame, which is METADATA, not data (the single-partition window is over
# 20 rows by construction).
#
# Determinism: bin ids are floor((v - vmin)/step) with explicit floor on
# both sides (DuckDB's double->int CAST rounds, Spark's truncates — the
# repo's cast-rounding rule); per-bin chi-square terms and CDF diffs are
# identical IEEE trees; the cross-bin sum goes through the DECIMAL grid
# (dsum); max() of identical doubles needs no quantization.
# ---------------------------------------------------------------------------

@query(
    "two_sample_drift_events",
    oracle="""
    WITH stats AS (SELECT min(value) AS vmin, max(value) AS vmax FROM events),
    b AS (
        SELECT least(CAST(floor((value - vmin) / ((vmax - vmin) / 20.0)) AS BIGINT), 19) AS bin,
               (user_id % 2 = 0) AS is_a
        FROM events CROSS JOIN stats
    ),
    c AS (
        SELECT bin,
               CAST(SUM(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
               CAST(SUM(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM b GROUP BY bin
    ),
    t AS (
        SELECT bin, n_a, n_b,
               SUM(n_a) OVER () AS ta,
               SUM(n_b) OVER () AS tb,
               SUM(n_a) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS ca,
               SUM(n_b) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cb
        FROM c
    ),
    d AS (
        SELECT CAST(n_a AS DOUBLE) AS da, CAST(n_b AS DOUBLE) AS db,
               CAST(ta AS DOUBLE) AS tad, CAST(tb AS DOUBLE) AS tbd,
               CAST(ca AS DOUBLE) AS cad, CAST(cb AS DOUBLE) AS cbd,
               ta, tb
        FROM t
    ),
    e AS (
        SELECT da, db, tad, tbd, cad, cbd, ta, tb,
               tad * (da + db) / (tad + tbd) AS ea,
               tbd * (da + db) / (tad + tbd) AS eb
        FROM d
    )
    SELECT
        CAST(SUM(CAST((da - ea) * (da - ea) / ea + (db - eb) * (db - eb) / eb
                      AS DECIMAL(18,6))) AS DOUBLE) AS chi_square,
        MAX(abs(cad / tad - cbd / tbd)) AS ks_stat,
        CAST(MAX(ta) AS BIGINT) AS n_a,
        CAST(MAX(tb) AS BIGINT) AS n_b,
        CAST(count(*) AS BIGINT) AS n_bins
    FROM e
    """,
    description=(
        "Two-sample drift between even/odd-user cohorts of events.value: "
        "chi-square homogeneity + binned KS over 20 equal-width bins, "
        "computed end-to-end in the engine"
    ),
)
def two_sample_drift_events(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    stats = ev.agg(F.min("value").alias("vmin"), F.max("value").alias("vmax"))
    step = (F.col("vmax") - F.col("vmin")) / F.lit(20.0)
    binned = ev.crossJoin(F.broadcast(stats)).select(
        F.least(
            F.floor((F.col("value") - F.col("vmin")) / step),
            F.lit(19).cast("long"),
        ).alias("bin"),
        (F.col("user_id") % 2 == 0).alias("is_a"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when(~F.col("is_a"), 1).otherwise(0)).cast("bigint").alias("n_b"),
    )
    w_all = Window.partitionBy()
    w_cum = Window.partitionBy().orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    t = counts.select(
        "bin",
        "n_a",
        "n_b",
        F.sum("n_a").over(w_all).alias("ta"),
        F.sum("n_b").over(w_all).alias("tb"),
        F.sum("n_a").over(w_cum).alias("ca"),
        F.sum("n_b").over(w_cum).alias("cb"),
    )
    d = t.select(
        F.col("n_a").cast("double").alias("da"),
        F.col("n_b").cast("double").alias("db"),
        F.col("ta").cast("double").alias("tad"),
        F.col("tb").cast("double").alias("tbd"),
        F.col("ca").cast("double").alias("cad"),
        F.col("cb").cast("double").alias("cbd"),
        "ta",
        "tb",
    )
    e = d.select(
        "*",
        (F.col("tad") * (F.col("da") + F.col("db")) / (F.col("tad") + F.col("tbd"))).alias("ea"),
        (F.col("tbd") * (F.col("da") + F.col("db")) / (F.col("tad") + F.col("tbd"))).alias("eb"),
    )
    term = (
        (F.col("da") - F.col("ea")) * (F.col("da") - F.col("ea")) / F.col("ea")
        + (F.col("db") - F.col("eb")) * (F.col("db") - F.col("eb")) / F.col("eb")
    )
    diff = F.abs(F.col("cad") / F.col("tad") - F.col("cbd") / F.col("tbd"))
    return e.agg(
        dsum(term).alias("chi_square"),
        F.max(diff).alias("ks_stat"),
        big(F.max("ta")).alias("n_a"),
        big(F.max("tb")).alias("n_b"),
        big(F.count(F.lit(1))).alias("n_bins"),
    )


# ---------------------------------------------------------------------------
# Transcendental scalar gallery — ln/exp/sqrt/cbrt/log10/pow/sin/atan per
# row. libm implementations differ by ~1 ulp between engines, so every
# transcendental output is quantized on the DECIMAL(38,6) grid (the dec6
# rule — the same treatment tfidf's ln already ships with); sqrt is
# IEEE-754 correctly rounded and could go raw, but stays on the grid for a
# uniform contract. All codegen'd JVM expressions, scan-parallel.
# ---------------------------------------------------------------------------

@query(
    "scalar_math_gallery",
    oracle="""
    SELECT event_id,
           CAST(CAST(ln(abs(value) + 1.0) AS DECIMAL(38,6)) AS DOUBLE) AS ln1p_abs,
           CAST(CAST(exp(value / 1000.0) AS DECIMAL(38,6)) AS DOUBLE) AS exp_scaled,
           CAST(CAST(sqrt(abs(value)) AS DECIMAL(38,6)) AS DOUBLE) AS sqrt_abs,
           CAST(CAST(cbrt(value) AS DECIMAL(38,6)) AS DOUBLE) AS cbrt_v,
           CAST(CAST(log10(abs(value) + 1.0) AS DECIMAL(38,6)) AS DOUBLE) AS log10_1p,
           CAST(CAST(pow(abs(value) + 1.0, 1.5) AS DECIMAL(38,6)) AS DOUBLE) AS pow_15,
           CAST(CAST(sin(value) AS DECIMAL(38,6)) AS DOUBLE) AS sin_v,
           CAST(CAST(atan(value) AS DECIMAL(38,6)) AS DOUBLE) AS atan_v,
           CAST(sign(value) AS DOUBLE) AS sign_v
    FROM events
    ORDER BY event_id
    """,
    description=(
        "Transcendental scalar gallery (ln/exp/sqrt/cbrt/log10/pow/sin/"
        "atan/sign) with DECIMAL(38,6) quantization absorbing cross-engine "
        "libm ulp noise"
    ),
)
def scalar_math_gallery(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        dec6(F.log(F.abs(v) + F.lit(1.0))).alias("ln1p_abs"),
        dec6(F.exp(v / F.lit(1000.0))).alias("exp_scaled"),
        dec6(F.sqrt(F.abs(v))).alias("sqrt_abs"),
        dec6(F.cbrt(v)).alias("cbrt_v"),
        dec6(F.log10(F.abs(v) + F.lit(1.0))).alias("log10_1p"),
        dec6(F.pow(F.abs(v) + F.lit(1.0), F.lit(1.5))).alias("pow_15"),
        dec6(F.sin(v)).alias("sin_v"),
        dec6(F.atan(v)).alias("atan_v"),
        F.signum(v).cast("double").alias("sign_v"),
    ).orderBy("event_id")


# ---------------------------------------------------------------------------
# Pairwise correlation matrix over lineitem's three measures, long form —
# ONE pass computes every component sum (count + 3 sums + 3 squares + 3
# cross-products, all map-side combined through the DECIMAL grid); the
# closed-form r evaluates per pair in identical IEEE trees (sqrt is
# correctly rounded per IEEE-754, so even the normalization is exact).
# The deterministic alternative to corr()'s order-dependent accumulation,
# extending agg_linear_regression to the full matrix.
# ---------------------------------------------------------------------------

@query(
    "agg_correlation_matrix",
    oracle="""
    WITH comp AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s1,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s2,
               CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s3,
               CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS s11,
               CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s22,
               CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s33,
               CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS s12,
               CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s13,
               CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS s23
        FROM lineitem
    )
    SELECT 'quantity' AS var_a, 'extendedprice' AS var_b,
           (n * s12 - s1 * s2) / (sqrt(n * s11 - s1 * s1) * sqrt(n * s22 - s2 * s2)) AS r,
           CAST(n AS BIGINT) AS n_points
    FROM comp
    UNION ALL
    SELECT 'quantity', 'discount',
           (n * s13 - s1 * s3) / (sqrt(n * s11 - s1 * s1) * sqrt(n * s33 - s3 * s3)),
           CAST(n AS BIGINT)
    FROM comp
    UNION ALL
    SELECT 'extendedprice', 'discount',
           (n * s23 - s2 * s3) / (sqrt(n * s22 - s2 * s2) * sqrt(n * s33 - s3 * s3)),
           CAST(n AS BIGINT)
    FROM comp
    """,
    description=(
        "Pairwise Pearson correlation matrix (quantity/extendedprice/"
        "discount) from one pass of decimal-exact component sums — "
        "deterministic alternative to corr()"
    ),
)
def agg_correlation_matrix(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    q, p, d = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    comp = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(q).alias("s1"),
        dsum(p).alias("s2"),
        dsum(d).alias("s3"),
        dsum(q * q).alias("s11"),
        dsum(p * p).alias("s22"),
        dsum(d * d).alias("s33"),
        dsum(q * p).alias("s12"),
        dsum(q * d).alias("s13"),
        dsum(p * d).alias("s23"),
    )

    def r(sab, saa, sbb, sa, sb):
        return (F.col("n") * F.col(sab) - F.col(sa) * F.col(sb)) / (
            F.sqrt(F.col("n") * F.col(saa) - F.col(sa) * F.col(sa))
            * F.sqrt(F.col("n") * F.col(sbb) - F.col(sb) * F.col(sb))
        )

    wide = comp.select(
        r("s12", "s11", "s22", "s1", "s2").alias("r12"),
        r("s13", "s11", "s33", "s1", "s3").alias("r13"),
        r("s23", "s22", "s33", "s2", "s3").alias("r23"),
        big(F.col("n")).alias("n_points"),
    )
    return wide.selectExpr(
        "stack(3, "
        "'quantity', 'extendedprice', r12, "
        "'quantity', 'discount', r13, "
        "'extendedprice', 'discount', r23"
        ") AS (var_a, var_b, r)",
        "n_points",
    )


# ---------------------------------------------------------------------------
# Quarantine annotation — plans/dq.quarantine over events with three rules.
# Reasons surface as a comma-joined STRING (never an array column: the
# driver's canonicalizer chokes on arrays — the approx_aggregates lesson).
# ---------------------------------------------------------------------------

@query(
    "dq_quarantine_events",
    oracle="""
    SELECT event_id,
           concat_ws(',',
               CASE WHEN NOT coalesce(value > 1, FALSE) THEN 'material_value' END,
               CASE WHEN NOT coalesce(user_id IS NOT NULL, FALSE) THEN 'user_present' END,
               CASE WHEN NOT coalesce(event_type IN ('view', 'click', 'purchase'), FALSE)
                    THEN 'engagement_type' END
           ) AS dq_reasons,
           (concat_ws(',',
               CASE WHEN NOT coalesce(value > 1, FALSE) THEN 'material_value' END,
               CASE WHEN NOT coalesce(user_id IS NOT NULL, FALSE) THEN 'user_present' END,
               CASE WHEN NOT coalesce(event_type IN ('view', 'click', 'purchase'), FALSE)
                    THEN 'engagement_type' END
           ) = '') AS dq_ok
    FROM events
    """,
    description=(
        "Row-level quarantine annotation: failed-rule reasons per event "
        "(material value / user present / engagement type) — the "
        "reject-table ETL pattern, one scan-parallel projection. "
        "Fixture-calibrated round 5: the original rules (value > 0, the "
        "full type list) passed EVERY fixture row at the oracle-checked "
        "scales, so reason-joining and dq_ok=false were never exercised "
        "(the q8/q22 vacuous-green class); value > 1 and the narrowed "
        "type list fail 10/400 rows respectively at sf0.001, including "
        "multi-reason rows"
    ),
)
def dq_quarantine_events(spark, sf_dir):
    from data_etl_with_dbt_spark.plans.dq import quarantine

    ev = load(spark, sf_dir, "events")
    q = quarantine(
        ev,
        [
            ("material_value", F.col("value") > 1),
            ("user_present", F.col("user_id").isNotNull()),
            (
                "engagement_type",
                F.col("event_type").isin("view", "click", "purchase"),
            ),
        ],
    )
    return q.select("event_id", "dq_reasons", "dq_ok")


# ---------------------------------------------------------------------------
# Pareto / cumulative revenue share — "which customers are 80% of revenue".
# The running sum is over DECIMAL(18,6)-cast values: window aggregates are
# order-of-accumulation-dependent for doubles (DuckDB's segment-tree window
# sums group differently than Spark's running accumulation — only exact
# decimal arithmetic is safe), and the share divisions then run on
# identical exact numerators. Windows run over the per-customer AGGREGATE
# (customer cardinality), not order rows; at extreme customer counts the
# bucketed global-index machinery replaces the single-partition cumsum.
# ---------------------------------------------------------------------------

@query(
    "pareto_customer_revenue",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT o_custkey, rev,
               SUM(rev) OVER (ORDER BY rev DESC, o_custkey ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(rev) OVER () AS total,
               CAST(row_number() OVER (ORDER BY rev DESC, o_custkey) AS BIGINT) AS rnk
        FROM per_cust
    )
    SELECT o_custkey,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share,
           rnk,
           (CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8) AS in_top80
    FROM ranked
    """,
    description=(
        "Pareto analysis: per-customer revenue, decimal-exact cumulative "
        "share under a total order, top-80% contributor flag"
    ),
)
def pareto_customer_revenue(spark, sf_dir):

    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev")
    )
    w_cum = (
        Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy()
    w_rank = Window.orderBy(F.desc("rev"), F.asc("o_custkey"))
    ranked = per_cust.select(
        "o_custkey",
        "rev",
        F.sum("rev").over(w_cum).alias("cum"),
        F.sum("rev").over(w_all).alias("total"),
        big(F.row_number().over(w_rank)).alias("rnk"),
    )
    share = F.col("cum").cast("double") / F.col("total").cast("double")
    return ranked.select(
        "o_custkey",
        F.col("rev").cast("double").alias("revenue"),
        share.alias("cum_share"),
        "rnk",
        (share <= 0.8).alias("in_top80"),
    )


# ---------------------------------------------------------------------------
# Graph analytics: local clustering coefficients over a sparsified
# user co-occurrence graph.
# ---------------------------------------------------------------------------

@query(
    "graph_clustering_coefficients",
    oracle="""
    WITH votes AS (
        SELECT DISTINCT event_id // 10 AS item_id, user_id FROM events
    ),
    cooc AS (
        SELECT DISTINCT a.user_id AS u, b.user_id AS v
        FROM votes a JOIN votes b ON a.item_id = b.item_id AND a.user_id < b.user_id
    ),
    edges AS (
        SELECT u, v FROM cooc
        WHERE substr(md5(CAST(u AS VARCHAR) || ':' || CAST(v AS VARCHAR)), 1, 4) < '1999'
    ),
    deg AS (
        SELECT id, count(*) AS degree FROM (
            SELECT u AS id FROM edges UNION ALL SELECT v AS id FROM edges
        ) GROUP BY id
    ),
    tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v
    ),
    tcnt AS (
        SELECT id, count(*) AS n_triangles FROM (
            SELECT a AS id FROM tri
            UNION ALL SELECT b AS id FROM tri
            UNION ALL SELECT c AS id FROM tri
        ) GROUP BY id
    )
    SELECT CAST(deg.id AS BIGINT) AS user_id,
           CAST(degree AS BIGINT) AS degree,
           CAST(COALESCE(n_triangles, 0) AS BIGINT) AS n_triangles,
           CASE WHEN degree < 2 THEN CAST(0.0 AS DOUBLE)
                ELSE (2.0 * COALESCE(n_triangles, 0))
                     / CAST(degree * (degree - 1) AS DOUBLE)
           END AS clustering_coeff
    FROM deg LEFT JOIN tcnt ON deg.id = tcnt.id
    """,
    description=(
        "Per-node triangle counts + local clustering coefficients over the "
        "user co-occurrence graph, md5-hash-sparsified to ~10% of edges "
        "(deterministic at every scale) — cohesion diagnostics for "
        "similarity/dedup candidate graphs; canonical a<b<c enumeration, "
        "work ∝ wedge count, never all-triples"
    ),
)
def graph_clustering_coefficients(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.graph import clustering_coefficients

    ev = load(spark, sf_dir, "events")
    votes = ev.select(
        F.expr("event_id DIV 10").alias("item_id"), "user_id"
    ).distinct()
    a = votes.select(F.col("item_id"), F.col("user_id").alias("u"))
    b = votes.select(F.col("item_id").alias("item_id2"), F.col("user_id").alias("v"))
    cooc = (
        a.join(b, (a.item_id == b.item_id2) & (F.col("u") < F.col("v")))
        .select("u", "v")
        .distinct()
    )
    gate = F.substring(
        F.md5(F.concat_ws(":", F.col("u").cast("string"), F.col("v").cast("string"))),
        1,
        4,
    ) < "1999"
    edges = cooc.where(gate)
    out = clustering_coefficients(edges, "u", "v")
    return out.select(
        big(F.col("id")).alias("user_id"),
        big(F.col("degree")).alias("degree"),
        big(F.col("n_triangles")).alias("n_triangles"),
        "clustering_coeff",
    )


# ---------------------------------------------------------------------------
# Event-journey mining: most frequent 3-step event-type paths per user
# timeline.
# ---------------------------------------------------------------------------

@query(
    "frequent_event_trigrams",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type AS e1,
               lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
               lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        FROM events
    )
    SELECT e1, e2, e3, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n DESC, e1, e2, e3
    LIMIT 20
    """,
    description=(
        "Sequential pattern mining lite: top-20 most frequent 3-step "
        "event-type paths over per-user timelines (lead windows, one key "
        "shuffle; total order under LIMIT)"
    ),
)
def frequent_event_trigrams(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(big(F.count(F.lit(1))).alias("n"))
        .orderBy(F.desc("n"), "e1", "e2", "e3")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Mutual information between a categorical column and a bucketed measure —
# the information-theoretic feature-relevance score (does event_type carry
# information about value?). Counts are exact ints; probabilities are IEEE
# divisions; ln is dec6-quantized per cell and the tiny p*ln terms sum
# exactly via the scaled-decimal trick (the kl_divergence_sources pattern).
# Buckets are fixed-width over the broadcast global min/max so the binning
# is a pure per-row expression, identical in both engines.
# ---------------------------------------------------------------------------

@query(
    "mutual_information_events",
    oracle="""
    WITH rng AS (
        SELECT min(value) AS mn, max(value) AS mx FROM events WHERE value IS NOT NULL
    ),
    binned AS (
        SELECT event_type AS t,
               least(CAST(floor((value - mn) / (mx - mn) * 10.0) AS BIGINT), 9) AS b
        FROM events CROSS JOIN rng WHERE value IS NOT NULL
    ),
    cells AS (SELECT t, b, count(*) AS c FROM binned GROUP BY t, b),
    mt AS (SELECT t, sum(c) AS ct FROM cells GROUP BY t),
    mb AS (SELECT b, sum(c) AS cb FROM cells GROUP BY b),
    tot AS (SELECT sum(c) AS n FROM cells)
    SELECT CAST(count(*) AS BIGINT) AS n_cells,
           CAST(max(n) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(
               (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
               * CAST(CAST(ln(
                     (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                     / ((CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)))
                 ) AS DECIMAL(38,6)) AS DOUBLE)
               * 1000000.0
           AS DECIMAL(18,6))) AS DOUBLE) / 1000000.0 AS mi_nats
    FROM cells JOIN mt USING (t) JOIN mb USING (b) CROSS JOIN tot
    """,
    description=(
        "Mutual information MI(event_type; value decile) — information-"
        "theoretic feature-relevance scoring; exact cell counts, ln "
        "dec6-quantized per cell, contributions summed exactly via scaled "
        "decimals"
    ),
)
def mutual_information_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events").where(F.col("value").isNotNull())
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    b = F.least(
        F.floor((F.col("value") - F.col("mn")) / (F.col("mx") - F.col("mn")) * F.lit(10.0)).cast(
            "bigint"
        ),
        F.lit(9).cast("bigint"),
    )
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.col("event_type").alias("t"), b.alias("b")
    )
    # cells feeds the two marginals, the total, and the scored join — one
    # lineage cut so the events pass runs once (no cross-consumer CSE)
    cells = (
        binned.groupBy("t", "b").agg(F.count(F.lit(1)).alias("c")).transform(materialize)
    )
    mt = cells.groupBy("t").agg(F.sum("c").alias("ct"))
    mb = cells.groupBy("b").agg(F.sum("c").alias("cb"))
    tot = cells.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    pt = F.col("ct").cast("double") / F.col("n").cast("double")
    pb = F.col("cb").cast("double") / F.col("n").cast("double")
    term = p * dec6(F.log(p / (pt * pb))) * F.lit(1000000.0)
    scored = (
        cells.join(F.broadcast(mt), "t")
        .join(F.broadcast(mb), "b")
        .crossJoin(F.broadcast(tot))
    )
    return scored.agg(
        big(F.count(F.lit(1))).alias("n_cells"),
        big(F.max("n")).alias("n_rows"),
        (F.sum(term.cast("decimal(18,6)")).cast("double") / F.lit(1000000.0)).alias("mi_nats"),
    )


# ---------------------------------------------------------------------------
# CUSUM change-point detection: per event_type, the timestamp where the
# cumulative sum of deviations from the series mean peaks — the classic
# level-shift locator. The running sum is decimal-exact (window aggregation
# order over doubles differs across engines); the mean anchor is the davg
# spelling so both engines subtract the identical double.
# ---------------------------------------------------------------------------

@query(
    "cusum_change_points",
    oracle="""
    WITH anchors AS (
        SELECT event_type AS t,
               CAST(CAST(AVG(value) AS DECIMAL(38,6)) AS DOUBLE) AS m
        FROM events GROUP BY event_type
    ),
    walks AS (
        SELECT event_type, event_id, ts,
               CAST(SUM(CAST(value - m AS DECIMAL(18,6))) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING
               ) AS DOUBLE) AS s
        FROM events JOIN anchors ON event_type = t
    ),
    ranked AS (
        SELECT event_type, event_id, ts, s,
               row_number() OVER (
                   PARTITION BY event_type ORDER BY abs(s) DESC, event_id
               ) AS rn
        FROM walks
    )
    SELECT event_type, event_id AS change_event_id, ts AS change_ts, s AS cusum_peak
    FROM ranked WHERE rn = 1
    """,
    description=(
        "CUSUM change-point per event_type: decimal-exact running sum of "
        "deviations from the davg-anchored mean, peak located by |S| with a "
        "deterministic tie-break — the level-shift detector for pipeline "
        "drift forensics"
    ),
)
def cusum_change_points(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    anchors = ev.groupBy(F.col("event_type").alias("t")).agg(davg(F.col("value")).alias("m"))
    joined = ev.join(F.broadcast(anchors), ev.event_type == F.col("t"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walks = joined.select(
        "event_type",
        "event_id",
        "ts",
        F.sum((F.col("value") - F.col("m")).cast("decimal(18,6)")).over(w).cast("double").alias("s"),
    )
    r = Window.partitionBy("event_type").orderBy(F.abs(F.col("s")).desc(), F.asc("event_id"))
    return (
        walks.withColumn("rn", F.row_number().over(r))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("event_id").alias("change_event_id"),
            F.col("ts").alias("change_ts"),
            F.col("s").alias("cusum_peak"),
        )
    )


# ---------------------------------------------------------------------------
# KMV / theta sketch distinct counting — the ONE sketch family with a
# hash-matched SQL oracle. HLL (above) is rows-only because DataSketches
# binaries aren't reproducible in DuckDB; KMV retains the k smallest
# 60-bit md5-derived hashes, which BOTH engines can compute bit-identically
# (conv/substr(md5) in Spark, CAST('0x'||substr(md5)) in DuckDB), so the
# estimates — one IEEE division of deterministic values — hash-match.
# Unlike HLL, KMV also answers set INTERSECTIONS (theta framework): the
# retained hashes are a uniform sample of the key space at rate θ.
# ---------------------------------------------------------------------------

@query(
    "theta_sketch_users",
    oracle="""
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events),
    h AS (
        SELECT DISTINCT event_type,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM d
    ),
    r AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM h
    ),
    sk AS (SELECT event_type, h FROM r WHERE rn <= 64),
    per AS (
        SELECT sk.event_type, count(*) AS n, max(h) AS kth
        FROM sk GROUP BY sk.event_type
    ),
    perex AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS exact_users
        FROM d GROUP BY event_type
    ),
    typed AS (
        SELECT per.event_type,
               perex.exact_users,
               CASE WHEN per.n < 64 THEN CAST(per.n AS DOUBLE)
                    ELSE CAST(63 AS DOUBLE)
                         / (CAST(per.kth AS DOUBLE) / 1152921504606846976.0)
               END AS approx_users
        FROM per JOIN perex ON per.event_type = perex.event_type
    ),
    m AS (SELECT DISTINCT h FROM sk),
    mr AS (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM m),
    msk AS (SELECT h FROM mr WHERE rn <= 64),
    mest AS (SELECT count(*) AS n, max(h) AS kth FROM msk),
    allex AS (
        SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users FROM d
    ),
    allrow AS (
        SELECT 'ALL' AS event_type,
               allex.exact_users,
               CASE WHEN mest.n < 64 THEN CAST(mest.n AS DOUBLE)
                    ELSE CAST(63 AS DOUBLE)
                         / (CAST(mest.kth AS DOUBLE) / 1152921504606846976.0)
               END AS approx_users
        FROM mest, allex
    ),
    av AS (SELECT h FROM sk WHERE event_type = 'view'),
    bc AS (SELECT h FROM sk WHERE event_type = 'click'),
    ta AS (
        SELECT CASE WHEN count(*) < 64 THEN CAST(1 AS DOUBLE)
                    ELSE CAST(max(h) AS DOUBLE) / 1152921504606846976.0
               END AS t
        FROM av
    ),
    tb AS (
        SELECT CASE WHEN count(*) < 64 THEN CAST(1 AS DOUBLE)
                    ELSE CAST(max(h) AS DOUBLE) / 1152921504606846976.0
               END AS t
        FROM bc
    ),
    th AS (SELECT least(ta.t, tb.t) AS theta FROM ta, tb),
    com AS (SELECT h FROM av INTERSECT SELECT h FROM bc),
    ic AS (
        SELECT count(*) AS c
        FROM com, th
        WHERE CAST(com.h AS DOUBLE) / 1152921504606846976.0 < th.theta
    ),
    iex AS (
        SELECT CAST(count(*) AS BIGINT) AS exact_users
        FROM (SELECT user_id FROM d WHERE event_type = 'view'
              INTERSECT
              SELECT user_id FROM d WHERE event_type = 'click') s
    ),
    irow AS (
        SELECT 'view_x_click' AS event_type,
               iex.exact_users,
               CAST(ic.c AS DOUBLE) / th.theta AS approx_users
        FROM ic, th, iex
    )
    SELECT * FROM typed
    UNION ALL SELECT * FROM allrow
    UNION ALL SELECT * FROM irow
    ORDER BY event_type
    """,
    description=(
        "KMV/theta-sketch distinct-user estimates per event type, an ALL "
        "row merged from the per-type sketches, and a theta-framework "
        "intersection estimate (view ∩ click) beside the exact counts — "
        "the md5-bridge hash makes every estimate bit-identical "
        "cross-engine, so the sketch family gains a hash-matched oracle"
    ),
)
def theta_sketch_users(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_intersect_estimate,
        kmv_merge,
    )

    k = 64
    ev = load(spark, sf_dir, "events")
    # one fact scan: the distinct (type, user) frame feeds the sketches AND
    # every exact comparison count (4 consumers -> checkpoint, no re-scan)
    d = (
        ev.select("event_type", "user_id")
        .distinct()
        .transform(materialize)
    )
    sk = kmv_build(d, "user_id", k=k, group_cols=["event_type"]).transform(materialize)
    exact = d.groupBy("event_type").agg(
        big(F.count(F.lit(1))).alias("exact_users")
    )
    typed = kmv_estimate(sk, k=k, group_cols=["event_type"]).join(
        exact, "event_type"
    )
    merged = kmv_merge(sk.select("h"), k=k)
    all_row = (
        kmv_estimate(merged, k=k)
        .crossJoin(
            F.broadcast(
                d.select("user_id")
                .distinct()
                .agg(big(F.count(F.lit(1))).alias("exact_users"))
            )
        )
        .select(F.lit("ALL").alias("event_type"), "exact_users", "approx_distinct")
    )
    a = sk.where(F.col("event_type") == "view").select("h")
    b = sk.where(F.col("event_type") == "click").select("h")
    inter_exact = (
        d.where(F.col("event_type") == "view")
        .select("user_id")
        .intersect(d.where(F.col("event_type") == "click").select("user_id"))
        .agg(big(F.count(F.lit(1))).alias("exact_users"))
    )
    inter_row = (
        kmv_intersect_estimate(a, b, k=k)
        .crossJoin(F.broadcast(inter_exact))
        .select(
            F.lit("view_x_click").alias("event_type"),
            "exact_users",
            "approx_intersection",
        )
    )
    cols = ["event_type", "exact_users", "approx_users"]
    return (
        typed.select("event_type", "exact_users", F.col("approx_distinct").alias("approx_users"))
        .unionByName(all_row.toDF(*cols))
        .unionByName(inter_row.toDF(*cols))
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Benford first-digit screen (plans/dq.benford_check): the first significant
# digit comes from the INTEGER PART'S STRING — identical rendering in both
# engines — never floor(log10(x)), whose libm rounding at power-of-ten
# boundaries is engine-specific. Expected shares are pasted double literals.
# ---------------------------------------------------------------------------

@query(
    "benford_first_digit_orders",
    oracle="""
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS INT) AS digit
        FROM orders
        WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
    ),
    g AS (
        SELECT digit, CAST(count(*) AS BIGINT) AS n
        FROM digits WHERE digit >= 1 GROUP BY digit
    ),
    t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM g),
    e(digit, expected_share) AS (VALUES
        (1, CAST(0.3010299956639812 AS DOUBLE)),
        (2, CAST(0.17609125905568124 AS DOUBLE)),
        (3, CAST(0.12493873660829992 AS DOUBLE)),
        (4, CAST(0.09691001300805642 AS DOUBLE)),
        (5, CAST(0.07918124604762482 AS DOUBLE)),
        (6, CAST(0.06694678963061322 AS DOUBLE)),
        (7, CAST(0.05799194697768673 AS DOUBLE)),
        (8, CAST(0.05115252244738129 AS DOUBLE)),
        (9, CAST(0.04575749056067514 AS DOUBLE)))
    SELECT g.digit, g.n,
           CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
           e.expected_share,
           abs(CAST(g.n AS DOUBLE) / CAST(t.total AS DOUBLE)
               - e.expected_share) AS abs_dev
    FROM g
    CROSS JOIN t
    JOIN e ON e.digit = g.digit
    ORDER BY g.digit
    """,
    description=(
        "Benford's-law first-digit screen over order totals: per digit 1-9 "
        "the observed count/share vs log10(1+1/d), with absolute deviation "
        "— the fabricated/truncated-amounts DQ check, digit derived from "
        "integer-string rendering for cross-engine exactness"
    ),
)
def benford_first_digit_orders(spark, sf_dir):
    from data_etl_with_dbt_spark.plans.dq import benford_check

    return benford_check(load(spark, sf_dir, "orders"), "o_totalprice")


# ---------------------------------------------------------------------------
# Table diff / reconciliation (plans/monitor.table_diff): audit a rebuild
# against its baseline. The comparison is NULL-SAFE (<=> / IS NOT DISTINCT
# FROM); the fixture's "rebuild" drops, mutates, and adds deterministic key
# slices so every status is populated.
# ---------------------------------------------------------------------------

@query(
    "table_diff_orders_rebuild",
    oracle="""
    WITH a AS (
        SELECT o_orderkey AS k, o_totalprice AS p, o_orderstatus AS s
        FROM orders
    ),
    b AS (
        SELECT k,
               CASE WHEN k % 97 = 0 THEN 0.0 ELSE p END AS p,
               CASE WHEN k % 101 = 0 THEN 'X' ELSE s END AS s
        FROM a WHERE k % 89 <> 0
        UNION ALL
        SELECT k + 10000000, p, s FROM a WHERE k % 83 = 0
    ),
    j AS (
        SELECT CASE WHEN b.k IS NULL THEN 'only_a'
                    WHEN a.k IS NULL THEN 'only_b'
                    WHEN (a.p IS NOT DISTINCT FROM b.p)
                         AND (a.s IS NOT DISTINCT FROM b.s) THEN 'equal'
                    ELSE 'changed' END AS st,
               CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND NOT (a.p IS NOT DISTINCT FROM b.p)
                    THEN 1 ELSE 0 END AS dp,
               CASE WHEN a.k IS NOT NULL AND b.k IS NOT NULL
                         AND NOT (a.s IS NOT DISTINCT FROM b.s)
                    THEN 1 ELSE 0 END AS ds
        FROM a FULL JOIN b ON a.k = b.k
    )
    SELECT metric, n FROM (
        SELECT 'equal' AS metric,
               CAST(sum(CASE WHEN st = 'equal' THEN 1 ELSE 0 END) AS BIGINT) AS n
        FROM j
        UNION ALL
        SELECT 'changed',
               CAST(sum(CASE WHEN st = 'changed' THEN 1 ELSE 0 END) AS BIGINT)
        FROM j
        UNION ALL
        SELECT 'only_a',
               CAST(sum(CASE WHEN st = 'only_a' THEN 1 ELSE 0 END) AS BIGINT)
        FROM j
        UNION ALL
        SELECT 'only_b',
               CAST(sum(CASE WHEN st = 'only_b' THEN 1 ELSE 0 END) AS BIGINT)
        FROM j
        UNION ALL
        SELECT 'col:o_totalprice', CAST(sum(dp) AS BIGINT) FROM j
        UNION ALL
        SELECT 'col:o_orderstatus', CAST(sum(ds) AS BIGINT) FROM j
    ) t
    ORDER BY metric
    """,
    description=(
        "Data-diff reconciliation of orders vs a deterministic 'rebuild' "
        "(dropped/mutated/added key slices): per-status row counts plus "
        "per-column change counts from ONE full-outer key join — the "
        "migration/CDC audit tool"
    ),
)
def table_diff_orders_rebuild(spark, sf_dir):
    from data_etl_with_dbt_spark.plans.monitor import (
        table_diff,
        table_diff_summary,
    )

    k = F.col("o_orderkey")
    a = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    mutated = a.where(k % 89 != 0).select(
        "o_orderkey",
        F.when(k % 97 == 0, F.lit(0.0))
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
        F.when(k % 101 == 0, F.lit("X"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
    )
    added = a.where(k % 83 == 0).select(
        (k + 10000000).alias("o_orderkey"), "o_totalprice", "o_orderstatus"
    )
    b = mutated.unionByName(added)
    diff = table_diff(
        a, b, keys=["o_orderkey"], compare_cols=["o_totalprice", "o_orderstatus"]
    )
    return table_diff_summary(diff, ["o_totalprice", "o_orderstatus"])


# ---------------------------------------------------------------------------
# Trailing-window distinct counts from per-day KMV sketches — the sliding
# COUNT(DISTINCT) every analytics stack struggles with at scale: exact
# trailing distincts rescan the window per day; per-day sketches merge in
# sketch space (7 × ≤k rows per output day), and the md5-bridge hash makes
# the estimates oracle-exact like theta_sketch_users.
# ---------------------------------------------------------------------------

@query(
    "trailing_distinct_users_kmv",
    oracle="""
    WITH d AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ),
    h AS (
        SELECT DISTINCT day,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)
                    AS BIGINT) AS h
        FROM d
    ),
    r AS (
        SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM h
    ),
    sk AS (SELECT day, h FROM r WHERE rn <= 64),
    days AS (SELECT DISTINCT day FROM sk),
    win AS (
        SELECT DISTINCT days.day AS day, sk.h
        FROM days JOIN sk
          ON sk.day BETWEEN days.day - 6 AND days.day
    ),
    wr AS (
        SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
        FROM win
    ),
    wsk AS (
        SELECT day, count(*) AS n, max(h) AS kth
        FROM wr WHERE rn <= 64 GROUP BY day
    ),
    exact AS (
        SELECT days.day AS day,
               CAST(count(DISTINCT d.user_id) AS BIGINT) AS exact_users
        FROM days JOIN d ON d.day BETWEEN days.day - 6 AND days.day
        GROUP BY days.day
    )
    SELECT wsk.day,
           exact.exact_users,
           CASE WHEN wsk.n < 64 THEN CAST(wsk.n AS DOUBLE)
                ELSE CAST(63 AS DOUBLE)
                     / (CAST(wsk.kth AS DOUBLE) / 1152921504606846976.0)
           END AS approx_users
    FROM wsk JOIN exact ON wsk.day = exact.day
    ORDER BY wsk.day
    """,
    description=(
        "Trailing-7-day distinct users per day: exact windowed distinct "
        "beside the per-day-KMV-sketch merge estimate — sliding "
        "COUNT(DISTINCT) in sketch space (7 x <=64 rows per day, no "
        "fact rescan), estimates oracle-exact via the md5 bridge"
    ),
)
def trailing_distinct_users_kmv(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.sketch import (
        kmv_build,
        kmv_estimate,
        kmv_merge,
    )

    k = 64
    ev = load(spark, sf_dir, "events")
    d = (
        ev.select(F.col("ts").cast("date").alias("day"), "user_id")
        .distinct()
        .transform(materialize)  # feeds sketches AND the exact side
    )
    sk = kmv_build(d, "user_id", k=k, group_cols=["day"]).transform(materialize)
    days = sk.select("day").distinct()
    win = (
        days.alias("d")
        .join(
            sk.alias("s"),
            F.col("s.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .select(F.col("d.day").alias("day"), "h")
    )
    # the trailing-window union of daily sketches is exactly a KMV merge:
    # delegate to the operator (distinct + keep-k-smallest per day) so
    # this query exercises the same code the unit tests pin, instead of
    # an inline copy that could drift
    wsk = kmv_merge(win, k=k, group_cols=["day"])
    est = kmv_estimate(wsk, k=k, group_cols=["day"])
    exact = (
        days.alias("d")
        .join(
            d.alias("e"),
            F.col("e.day").between(
                F.date_sub(F.col("d.day"), 6), F.col("d.day")
            ),
        )
        .groupBy(F.col("d.day").alias("day"))
        .agg(big(F.count_distinct(F.col("e.user_id"))).alias("exact_users"))
    )
    return (
        est.join(exact, "day")
        .select(
            "day", "exact_users", F.col("approx_distinct").alias("approx_users")
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Multi-touch attribution: credit a user's pre-conversion touchpoints under
# the three classic models in ONE pass. Linear credit is dsum(1/n): the
# per-row IEEE division is bit-identical cross-engine, the decimal sum is
# order-independent. First/last picks sit under a total (ts, event_id)
# order.
# ---------------------------------------------------------------------------

@query(
    "attribution_purchase_touchpoints",
    oracle="""
    WITH conv AS (
        SELECT user_id, min(ts) AS cts
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    touches AS (
        SELECT e.user_id, e.event_type, e.ts, e.event_id,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts, e.event_id) AS rn_first,
               row_number() OVER (PARTITION BY e.user_id
                                  ORDER BY e.ts DESC, e.event_id DESC)
                   AS rn_last,
               count(*) OVER (PARTITION BY e.user_id) AS n_touches
        FROM events e JOIN conv ON e.user_id = conv.user_id
        WHERE e.event_type IN ('view', 'click') AND e.ts <= conv.cts
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS touches,
           CAST(sum(CASE WHEN rn_first = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS first_touch,
           CAST(sum(CASE WHEN rn_last = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS last_touch,
           CAST(SUM(CAST(CAST(1 AS DOUBLE) / n_touches AS DECIMAL(18,6)))
                AS DOUBLE) AS linear_credit
    FROM touches
    GROUP BY event_type
    ORDER BY event_type
    """,
    description=(
        "Multi-touch purchase attribution over user journeys: per touch "
        "channel the first-touch / last-touch conversion counts and "
        "linear (1/n) credit, all from one windowed pass — first/last "
        "under a total (ts, event_id) order, linear credit via dsum of "
        "the per-row IEEE division"
    ),
)
def attribution_purchase_touchpoints(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("cts"))
    )
    touches = (
        ev.where(F.col("event_type").isin("view", "click"))
        .join(conv, "user_id")
        .where(F.col("ts") <= F.col("cts"))
    )
    w = Window.partitionBy("user_id")
    wf = w.orderBy("ts", "event_id")
    wl = w.orderBy(F.col("ts").desc(), F.col("event_id").desc())
    marked = touches.select(
        "event_type",
        F.row_number().over(wf).alias("rn_first"),
        F.row_number().over(wl).alias("rn_last"),
        F.count(F.lit(1)).over(w).alias("n_touches"),
    )
    return (
        marked.groupBy("event_type")
        .agg(
            big(F.count(F.lit(1))).alias("touches"),
            big(F.sum(F.when(F.col("rn_first") == 1, 1).otherwise(0))).alias(
                "first_touch"
            ),
            big(F.sum(F.when(F.col("rn_last") == 1, 1).otherwise(0))).alias(
                "last_touch"
            ),
            dsum(F.lit(1.0) / F.col("n_touches")).alias("linear_credit"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Growth accounting (the Amplitude/a16z engagement ledger) at day grain:
# every active (user, day) is exactly one of new / retained / resurrected,
# and churn on day d counts users active on d-1 but not d. Pure set logic
# over the distinct (user, day) frame — one shuffle, integer counts.
# ---------------------------------------------------------------------------

@query(
    "growth_accounting_daily",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    marked AS (
        SELECT day, user_id,
               min(day) OVER (PARTITION BY user_id) AS first_day,
               lag(day) OVER (PARTITION BY user_id ORDER BY day) AS prev_day,
               lead(day) OVER (PARTITION BY user_id ORDER BY day) AS next_day
        FROM ud
    ),
    days AS (SELECT DISTINCT day FROM ud),
    act AS (
        SELECT day,
               CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_new,
               CAST(sum(CASE WHEN prev_day = day - 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_retained,
               CAST(sum(CASE WHEN day <> first_day
                              AND (prev_day IS NULL OR prev_day < day - 1)
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM marked GROUP BY day
    ),
    churn AS (
        SELECT day + 1 AS day,
               CAST(count(*) AS BIGINT) AS n_churned
        FROM marked
        WHERE next_day IS NULL OR next_day > day + 1
        GROUP BY day + 1
    )
    SELECT days.day,
           coalesce(act.n_new, 0) AS n_new,
           coalesce(act.n_retained, 0) AS n_retained,
           coalesce(act.n_resurrected, 0) AS n_resurrected,
           CAST(coalesce(churn.n_churned, 0) AS BIGINT) AS n_churned_in
    FROM days
    LEFT JOIN act ON days.day = act.day
    LEFT JOIN churn ON days.day = churn.day
    ORDER BY days.day
    """,
    description=(
        "Daily growth accounting over user activity: new / retained / "
        "resurrected actives plus churned-in (active yesterday, absent "
        "today) — the engagement ledger, from one distinct (user, day) "
        "frame with per-user lag/lead windows"
    ),
)
def growth_accounting_daily(spark, sf_dir):

    ev = load(spark, sf_dir, "events")
    ud = (
        ev.select("user_id", F.col("ts").cast("date").alias("day"))
        .distinct()
        .transform(materialize)  # windows + day spine both read it
    )
    wu = Window.partitionBy("user_id")
    wo = wu.orderBy("day")
    marked = ud.select(
        "day",
        "user_id",
        F.min("day").over(wu).alias("first_day"),
        F.lag("day").over(wo).alias("prev_day"),
        F.lead("day").over(wo).alias("next_day"),
    ).transform(materialize)  # feeds both act and churn
    act = marked.groupBy("day").agg(
        big(F.sum(F.when(F.col("day") == F.col("first_day"), 1).otherwise(0))).alias(
            "n_new"
        ),
        big(
            F.sum(
                F.when(F.col("prev_day") == F.date_sub("day", 1), 1).otherwise(0)
            )
        ).alias("n_retained"),
        big(
            F.sum(
                F.when(
                    (F.col("day") != F.col("first_day"))
                    & (
                        F.col("prev_day").isNull()
                        | (F.col("prev_day") < F.date_sub("day", 1))
                    ),
                    1,
                ).otherwise(0)
            )
        ).alias("n_resurrected"),
    )
    churn = (
        marked.where(
            F.col("next_day").isNull()
            | (F.col("next_day") > F.date_add("day", 1))
        )
        .groupBy(F.date_add("day", 1).alias("day"))
        .agg(big(F.count(F.lit(1))).alias("n_churned_in"))
    )
    days = ud.select("day").distinct()
    return (
        days.join(act, "day", "left")
        .join(churn, "day", "left")
        .select(
            "day",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
            F.coalesce("n_retained", F.lit(0)).alias("n_retained"),
            F.coalesce("n_resurrected", F.lit(0)).alias("n_resurrected"),
            big(F.coalesce("n_churned_in", F.lit(0))).alias("n_churned_in"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Association metrics between event types (market-basket shape at user
# granularity): support / confidence / lift from exact distinct-user
# counts; every float is one fixed tree of IEEE divisions of exact
# integers, spelled identically in both engines.
# ---------------------------------------------------------------------------

@query(
    "event_type_lift_pairs",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ut),
    per AS (
        SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut
        GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(count(*) AS BIGINT) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, pa.n AS n_a, pb.n AS n_b, n_both,
           CAST(n_both AS DOUBLE) / CAST(n.n_users AS DOUBLE) AS support,
           CAST(n_both AS DOUBLE) / CAST(pa.n AS DOUBLE) AS confidence,
           (CAST(n_both AS DOUBLE) / CAST(pa.n AS DOUBLE))
           / (CAST(pb.n AS DOUBLE) / CAST(n.n_users AS DOUBLE)) AS lift
    FROM pairs
    JOIN per pa ON pa.event_type = pairs.type_a
    JOIN per pb ON pb.event_type = pairs.type_b
    CROSS JOIN n
    ORDER BY type_a, type_b
    """,
    description=(
        "User-level association metrics for event-type pairs: distinct-"
        "user support, confidence, and lift from exact counts — the "
        "market-basket screen over behavioral data"
    ),
)
def event_type_lift_pairs(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    # three consumers: totals, per-type, pair join
    ut = ev.select("user_id", "event_type").distinct().transform(materialize)
    n = ut.select("user_id").distinct().agg(
        big(F.count(F.lit(1))).alias("n_users")
    )
    per = ut.groupBy("event_type").agg(big(F.count(F.lit(1))).alias("n"))
    both = (
        ut.alias("a")
        .join(
            ut.alias("b"),
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(big(F.count(F.lit(1))).alias("n_both"))
    )
    pa = per.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    pb = per.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    nb = F.col("n_both").cast("double")
    na = F.col("n_a").cast("double")
    nbb = F.col("n_b").cast("double")
    nu = F.col("n_users").cast("double")
    return (
        both.join(pa, "type_a")
        .join(pb, "type_b")
        .crossJoin(F.broadcast(n))
        .select(
            "type_a", "type_b", "n_a", "n_b", "n_both",
            (nb / nu).alias("support"),
            (nb / na).alias("confidence"),
            ((nb / na) / (nbb / nu)).alias("lift"),
        )
        .orderBy("type_a", "type_b")
    )


# ---------------------------------------------------------------------------
# Column masking (plans/dq.apply_masking_policy): the governed view of
# customer — name pseudonymized (md5: still joinable), account balance
# bucketed, nation hidden. Every strategy is a deterministic projection,
# so the masked view itself hash-matches an oracle.
# ---------------------------------------------------------------------------

@query(
    "masked_customer_view",
    oracle="""
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey,
           md5(c_name) AS c_name,
           CAST(NULL AS INTEGER) AS c_nationkey,
           CAST(floor(c_acctbal / 1000) * 1000 AS DOUBLE) AS c_acctbal,
           c_mktsegment
    FROM customer
    ORDER BY c_custkey
    """,
    description=(
        "Column-level masking policy over customer: md5 pseudonym name "
        "(joinable), nulled nation, thousand-bucketed balance, segment "
        "passthrough — the warehouse governance view as an engine-owned "
        "projection"
    ),
)
def masked_customer_view(spark, sf_dir):
    from data_etl_with_dbt_spark.plans.dq import apply_masking_policy

    cust = load(spark, sf_dir, "customer")
    return apply_masking_policy(
        cust,
        {"c_name": "hash", "c_nationkey": "null", "c_acctbal": "bucket"},
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# Column entropy profiling — the concentration/diversity screen beside
# profile_orders' null/distinct counts: low entropy flags near-constant
# columns (dead dimensions, collapsed feeds), high entropy flags key-like
# columns. Determinism follows the kl_divergence recipe: ln dec6-quantized
# per value, contributions summed exactly via scaled decimals.
# ---------------------------------------------------------------------------

@query(
    "column_entropy_events",
    oracle="""
    WITH cols AS (
        SELECT 'event_type' AS col, event_type AS val FROM events
        UNION ALL
        SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
        UNION ALL
        SELECT 'value_band', CAST(CAST(floor(value / 10) AS BIGINT) AS VARCHAR)
        FROM events WHERE value IS NOT NULL
    ),
    vc AS (SELECT col, val, count(*) AS c FROM cols GROUP BY col, val),
    t  AS (SELECT col, sum(c) AS n FROM vc GROUP BY col)
    SELECT vc.col,
           CAST(count(*) AS BIGINT) AS n_distinct,
           CAST(max(t.n) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(
               -(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
               * CAST(CAST(ln(CAST(c AS DOUBLE) / CAST(t.n AS DOUBLE))
                 AS DECIMAL(38,6)) AS DOUBLE)
               * 1000000.0
           AS DECIMAL(18,6))) AS DOUBLE) / 1000000.0 AS entropy_nats
    FROM vc JOIN t ON vc.col = t.col
    GROUP BY vc.col
    ORDER BY vc.col
    """,
    description=(
        "Shannon entropy per profiled column (event_type, user_id, "
        "value decades): the concentration screen — near-zero entropy = "
        "dead dimension, log(n)-scale = key-like; ln dec6-quantized per "
        "value, exact decimal contribution sums"
    ),
)
def column_entropy_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    cols = (
        ev.select(F.lit("event_type").alias("col"), F.col("event_type").alias("val"))
        .unionByName(
            ev.select(
                F.lit("user_id").alias("col"),
                F.col("user_id").cast("string").alias("val"),
            )
        )
        .unionByName(
            ev.where(F.col("value").isNotNull()).select(
                F.lit("value_band").alias("col"),
                F.floor(F.col("value") / 10)
                .cast("bigint")
                .cast("string")
                .alias("val"),
            )
        )
    )
    # feeds totals and the scored join
    vc = cols.groupBy("col", "val").agg(F.count(F.lit(1)).alias("c")).transform(
        materialize
    )
    t = vc.groupBy("col").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n").cast("double")
    term = (
        (-p * dec6(F.log(p)) * F.lit(1000000.0)).cast("decimal(18,6)")
    )
    return (
        vc.join(t, "col")
        .groupBy("col")
        .agg(
            big(F.count(F.lit(1))).alias("n_distinct"),
            big(F.max("n")).alias("n_rows"),
            (F.sum(term).cast("double") / F.lit(1000000.0)).alias(
                "entropy_nats"
            ),
        )
        .orderBy("col")
    )
