"""Interval / time-series operators over the events and orders fixtures:
interval-concurrency sweep, gap interpolation, EWMA smoothing via a pinned
sequential fold, and a Kaplan-Meier conversion-survival curve.

Scale shapes: every entry here is one fact-table scan plus per-key windows —
the endpoint sweep and the interpolation windows partition by their natural
key (event_type / user_id), the EWMA fold and the KM curve run over
day-grain aggregates (metadata-sized after the map-side combine).

Determinism notes (registry docstring has the general rules):
* The concurrency sweep orders endpoints by (t, delta, event_id) — a total
  order — so the running sum is identical in both engines; at equal t the
  ``-1`` end sorts before the ``+1`` start, so back-to-back intervals don't
  overlap.
* EWMA is a sequential recurrence; Spark computes it with one
  higher-order-function fold over the day-sorted array, DuckDB with a
  recursive CTE (depth = 60 days, capped) — both pin the evaluation order,
  so the raw doubles match bit-for-bit (quantized only at emission).
* Kaplan-Meier's survival product is exp(sum(ln(factor))): each ln term is
  quantized to DECIMAL(18,6) BEFORE the cumulative window sum, because
  DuckDB's windowed SUM over doubles is segment-tree ordered while Spark's
  is sequential — exact decimal addition makes the order irrelevant.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import big, dec6, dsum, load, query


@query(
    "concurrent_sessions_peak",
    oracle="""
    WITH ep AS (
        SELECT event_type, epoch_us(ts) AS t, 1 AS delta, event_id FROM events
        UNION ALL
        SELECT event_type,
               epoch_us(ts) + CAST(floor(value) AS BIGINT) * 1000000,
               -1, event_id
        FROM events
    ),
    r AS (
        SELECT event_type, delta,
               SUM(delta) OVER (
                   PARTITION BY event_type ORDER BY t, delta, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS running
        FROM ep
    )
    SELECT event_type,
           CAST(MAX(running) AS BIGINT) AS peak_concurrency,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_intervals
    FROM r
    GROUP BY event_type
    """,
    description=(
        "Peak interval concurrency per event type via the +1/-1 endpoint "
        "sweep (sessions = [ts, ts + floor(value) seconds])"
    ),
)
def concurrent_sessions_peak(spark, sf_dir):
    """Classic sweep-line concurrency: explode each interval into a +1 start
    and a -1 end endpoint, running-sum in time order per key, take the max.
    One union + one per-key window — no self-join, no range join; survives
    any row count whose per-key endpoint stream fits a partition (event_type
    cardinality here; salt the key for pathological single-key data)."""
    ev = load(spark, sf_dir, "events")
    t0 = F.unix_micros(F.col("ts"))
    starts = ev.select(
        "event_type", t0.alias("t"), F.lit(1).alias("delta"), "event_id"
    )
    ends = ev.select(
        "event_type",
        (t0 + F.floor(F.col("value")).cast("bigint") * F.lit(1_000_000)).alias("t"),
        F.lit(-1).alias("delta"),
        "event_id",
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    swept = starts.unionAll(ends).select(
        "event_type", "delta", F.sum("delta").over(w).alias("running")
    )
    return swept.groupBy("event_type").agg(
        big(F.max("running")).alias("peak_concurrency"),
        big(F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))).alias("n_intervals"),
    )


@query(
    "linear_interpolate_events",
    oracle="""
    WITH m AS (
        SELECT event_id, user_id, epoch_us(ts) AS t,
               CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
        FROM events
    ),
    nb AS (
        SELECT event_id, user_id, t, v,
               last_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pv,
               last_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS pt,
               first_value(v IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nv,
               first_value(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ) AS nt
        FROM m
    )
    SELECT event_id, user_id,
           (v IS NULL) AS was_missing,
           CASE
               WHEN v IS NOT NULL THEN v
               WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt <> pt
                   THEN pv + (nv - pv) * (CAST(t - pt AS DOUBLE) / CAST(nt - pt AS DOUBLE))
               ELSE coalesce(pv, nv)
           END AS filled_value
    FROM nb
    """,
    description=(
        "Per-user linear interpolation of a masked measure (value at "
        "event_type='error' treated as missing): time-weighted fill between "
        "the nearest known neighbours, edge rows carried from the one side"
    ),
)
def linear_interpolate_events(spark, sf_dir):
    """Gap interpolation with two IGNORE NULLS window passes (backward +
    forward) over the user's event timeline — the standard distributed
    spelling of pandas ``interpolate(method='time')``; no self-join, one
    shuffle on user_id shared by all four window columns."""
    ev = load(spark, sf_dir, "events")
    m = ev.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("t"),
        F.when(F.col("event_type") == "error", F.lit(None).cast("double"))
        .otherwise(F.col("value"))
        .alias("v"),
    )
    wb = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("t", "event_id")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    t_known = F.when(F.col("v").isNotNull(), F.col("t"))
    nb = m.select(
        "event_id",
        "user_id",
        "t",
        "v",
        F.last("v", ignorenulls=True).over(wb).alias("pv"),
        F.last(t_known, ignorenulls=True).over(wb).alias("pt"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(t_known, ignorenulls=True).over(wf).alias("nt"),
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("t") - F.col("pt")).cast("double")
        / (F.col("nt") - F.col("pt")).cast("double")
    )
    filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull()
            & F.col("nv").isNotNull()
            & (F.col("nt") != F.col("pt")),
            interp,
        )
        .otherwise(F.coalesce("pv", "nv"))
    )
    return nb.select(
        "event_id",
        "user_id",
        F.col("v").isNull().alias("was_missing"),
        # RAW double: pv/nv are fixture values passed through and the
        # mirrored interpolation is one deterministic double chain —
        # no summation-order noise to absorb, so no grid (round-9 rule)
        filled.alias("filled_value"),
    )


@query(
    "ewma_daily_revenue",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT day, rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
            FROM orders
            GROUP BY 1
            ORDER BY day DESC
            LIMIT 60
        )
    ),
    r AS (
        SELECT rn, day, rev, rev AS ewma FROM d WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.day, d.rev,
               CAST(0.3 AS DOUBLE) * d.rev + CAST(0.7 AS DOUBLE) * r.ewma
        FROM d JOIN r ON d.rn = r.rn + 1
    )
    SELECT day, rev, ewma
    FROM r
    """,
    description=(
        "EWMA (alpha=0.3) over the last 60 days of daily order revenue — "
        "sequential recurrence via a pinned-order fold (Spark higher-order "
        "aggregate vs DuckDB recursive CTE), bit-identical cross-engine"
    ),
)
def ewma_daily_revenue(spark, sf_dir):
    """The day-grain agg is the only data-sized stage (map-side combined to
    one row per day); the recurrence folds a 60-element array on one row.
    The fold order is the array's sort order, which matches the recursion's
    level order — a sequential float recurrence only hash-matches when both
    engines evaluate in the same order (repo recursion rule)."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice")).alias("rev"))
        .orderBy(F.col("day").desc())
        .limit(60)
    )
    arr = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "rev"))).alias("days")
    )
    acc0 = F.expr("CAST(array() AS array<struct<day:date,rev:double,ewma:double>>)")
    folded = arr.select(
        F.aggregate(
            "days",
            acc0,
            lambda acc, x: F.concat(
                acc,
                F.array(
                    F.struct(
                        x["day"].alias("day"),
                        x["rev"].alias("rev"),
                        F.when(F.size(acc) == 0, x["rev"])
                        .otherwise(
                            F.lit(0.3) * x["rev"]
                            + F.lit(0.7) * F.element_at(acc, -1)["ewma"]
                        )
                        .alias("ewma"),
                    )
                ),
            ),
        ).alias("series")
    )
    e = folded.select(F.explode("series").alias("p"))
    return e.select(
        F.col("p.day").alias("day"),
        F.col("p.rev").alias("rev"),
        # RAW double: the fold/recursion order is pinned, so ewma is
        # bit-identical cross-engine; quantizing only adds the .5e-6
        # boundary failure mode (round-9 holt lesson)
        F.col("p.ewma").alias("ewma"),
    )


@query(
    "survival_km_conversion",
    oracle="""
    WITH fv AS (
        SELECT user_id, min(epoch_us(ts)) AS fv_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS fp_us
        FROM events e JOIN fv ON e.user_id = fv.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.fv_us
        GROUP BY e.user_id
    ),
    horizon AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
    dur AS (
        SELECT fv.user_id,
               CASE WHEN fp.fp_us IS NOT NULL
                    THEN CAST(floor(CAST(fp.fp_us - fv.fv_us AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS BIGINT)
                    ELSE CAST(floor(CAST(h_us - fv.fv_us AS DOUBLE) / CAST(1000000 AS DOUBLE)) AS BIGINT)
               END AS t,
               CASE WHEN fp.fp_us IS NOT NULL THEN 1 ELSE 0 END AS ev
        FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id
        CROSS JOIN horizon
    ),
    grid AS (
        SELECT t,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS m
        FROM dur GROUP BY t
    ),
    risk AS (
        SELECT t, d,
               CAST((SELECT CAST(count(*) AS BIGINT) FROM dur)
                    - coalesce(SUM(m) OVER (
                          ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                      ), 0) AS BIGINT) AS n
        FROM grid
    ),
    km AS (
        SELECT t, d, n,
               SUM(CAST(ln(CAST(1 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n AS DOUBLE))
                        AS DECIMAL(18,6))) OVER (
                   ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS lnsum
        FROM risk
        WHERE d > 0 AND d < n
    )
    SELECT t AS duration_s, d AS n_events, n AS n_at_risk,
           CAST(CAST(exp(CAST(lnsum AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE) AS survival
    FROM km
    """,
    description=(
        "Kaplan-Meier survival curve for view->purchase conversion time "
        "(censored at the corpus horizon): at-risk counts via cumulative "
        "window, survival via exp of decimal-grid ln sums"
    ),
)
def survival_km_conversion(spark, sf_dir):
    """KM estimator fully inside the engine: the per-user duration build is
    two filtered aggs + a left join on user_id; the curve itself runs over
    the distinct-duration grid (metadata-sized). The ln terms are quantized
    before the cumulative sum so the window's internal summation order
    (segment tree vs sequential) cannot diverge between engines."""
    ev = load(spark, sf_dir, "events")
    t_us = F.unix_micros("ts")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(t_us).alias("fv_us"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", t_us.alias("p_us"))
        .join(fv, "user_id")
        .where(F.col("p_us") >= F.col("fv_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("fp_us"))
    )
    horizon = ev.agg(F.max(t_us).alias("h_us"))
    end_us = F.coalesce("fp_us", "h_us")
    dur = (
        fv.join(fp, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.floor(
                (end_us - F.col("fv_us")).cast("double") / F.lit(1_000_000).cast("double")
            )
            .cast("bigint")
            .alias("t"),
            F.when(F.col("fp_us").isNotNull(), 1).otherwise(0).alias("ev"),
        )
    )
    grid = dur.groupBy("t").agg(
        big(F.sum("ev")).alias("d"), big(F.count(F.lit(1))).alias("m")
    )
    w_prev = Window.partitionBy().orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.partitionBy().orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    total = big(F.sum("m").over(Window.partitionBy()))
    risk = grid.select(
        "t",
        "d",
        (total - F.coalesce(F.sum("m").over(w_prev), F.lit(0))).alias("n"),
    )
    ln_term = F.log(
        F.lit(1).cast("double") - F.col("d").cast("double") / F.col("n").cast("double")
    )
    # d == n (everyone remaining converts) would put ln(0) = -inf on the
    # decimal grid; the terminal zero point is dropped on both sides.
    km = risk.where((F.col("d") > 0) & (F.col("d") < F.col("n"))).select(
        "t",
        "d",
        "n",
        F.sum(ln_term.cast("decimal(18,6)")).over(w_cum).alias("lnsum"),
    )
    return km.select(
        F.col("t").alias("duration_s"),
        F.col("d").alias("n_events"),
        F.col("n").alias("n_at_risk"),
        dec6(F.exp(F.col("lnsum").cast("double"))).alias("survival"),
    )


@query(
    "holt_linear_forecast",
    oracle="""
    WITH RECURSIVE d AS (
        SELECT day, rev, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn
        FROM (
            SELECT CAST(o_orderdate AS DATE) AS day,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
            FROM orders
            GROUP BY 1
            ORDER BY day DESC
            LIMIT 60
        )
    ),
    r AS (
        SELECT rn, day, rev, rev AS lvl, CAST(0 AS DOUBLE) AS trend FROM d WHERE rn = 1
        UNION ALL
        SELECT d.rn, d.day, d.rev,
               CAST(0.5 AS DOUBLE) * d.rev
                   + CAST(0.5 AS DOUBLE) * (r.lvl + r.trend),
               CAST(0.3 AS DOUBLE)
                   * ((CAST(0.5 AS DOUBLE) * d.rev
                       + CAST(0.5 AS DOUBLE) * (r.lvl + r.trend)) - r.lvl)
                   + CAST(0.7 AS DOUBLE) * r.trend
        FROM d JOIN r ON d.rn = r.rn + 1
    ),
    last AS (SELECT day, lvl, trend FROM r ORDER BY rn DESC LIMIT 1)
    SELECT day, rev,
           lvl AS level,
           trend,
           FALSE AS is_forecast
    FROM r
    UNION ALL
    SELECT day + CAST(h AS BIGINT) * INTERVAL 1 DAY, NULL,
           lvl + CAST(h AS DOUBLE) * trend,
           trend,
           TRUE
    FROM last, unnest(range(1, 8)) AS t(h)
    """,
    description=(
        "Holt double exponential smoothing (alpha=0.5, beta=0.3) over the "
        "last 60 revenue days + a 7-day linear forecast — sequential "
        "recurrence via the pinned-order fold, bit-identical cross-engine"
    ),
)
def holt_linear_forecast(spark, sf_dir):
    """Level+trend smoothing, same execution posture as ewma_daily_revenue
    (one day-grain agg, 60-element fold on one row); the forecast explodes
    seven (h, level + h*trend) rows off the final state. Init convention:
    level_1 = x_1, trend_1 = 0 (documented; mirrored in the recursion)."""
    o = load(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(dsum(F.col("o_totalprice")).alias("rev"))
        .orderBy(F.col("day").desc())
        .limit(60)
    )
    arr = daily.agg(
        F.sort_array(F.collect_list(F.struct("day", "rev"))).alias("days")
    )
    acc0 = F.expr(
        "CAST(array() AS array<struct<day:date,rev:double,lvl:double,trend:double>>)"
    )
    a, b1 = F.lit(0.5), F.lit(0.3)

    def step(acc, x):
        prev = F.element_at(acc, -1)
        lvl = F.when(F.size(acc) == 0, x["rev"]).otherwise(
            a * x["rev"] + (F.lit(1.0) - a) * (prev["lvl"] + prev["trend"])
        )
        trend = F.when(F.size(acc) == 0, F.lit(0.0)).otherwise(
            b1 * (lvl - prev["lvl"]) + (F.lit(1.0) - b1) * prev["trend"]
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["rev"].alias("rev"),
                    lvl.alias("lvl"),
                    trend.alias("trend"),
                )
            ),
        )

    folded = arr.select(F.aggregate("days", acc0, step).alias("series"))
    hist = folded.select(F.explode("series").alias("p")).select(
        F.col("p.day").alias("day"),
        F.col("p.rev").alias("rev"),
        # RAW doubles, deliberately UNquantized: the recursion/fold pins
        # the evaluation order so lvl/trend are bit-identical across
        # engines, while a dec6 is the documented shortest-repr-vs-binary
        # decimal-cast trap (the round-9 dup2 sweep caught a level within
        # an ulp of the .5e-6 boundary)
        F.col("p.lvl").alias("level"),
        F.col("p.trend").alias("trend"),
        F.lit(False).alias("is_forecast"),
    )
    last = folded.select(F.element_at("series", -1).alias("p"))
    fc = (
        last.select("p", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("h"))
        .select(
            F.date_add(F.col("p.day"), F.col("h")).alias("day"),
            F.lit(None).cast("double").alias("rev"),
            (
                F.col("p.lvl") + F.col("h").cast("double") * F.col("p.trend")
            ).alias("level"),
            F.col("p.trend").alias("trend"),
            F.lit(True).alias("is_forecast"),
        )
    )
    return hist.unionByName(fc)


@query(
    "hourly_seasonality_profile",
    oracle="""
    WITH h AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour_of_day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, hour_of_day, n,
           CAST(n AS DOUBLE)
               / CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE) AS share
    FROM h
    """,
    description=(
        "Hour-of-day seasonality per event type: counts + share of the "
        "type's daily cycle (24 x 5 profile matrix)"
    ),
)
def hourly_seasonality_profile(spark, sf_dir):
    """One fact scan -> (type, hour) agg (map-side combined to <=120 rows);
    the share window runs over the profile matrix, not the events."""
    ev = load(spark, sf_dir, "events")
    h = ev.groupBy(
        "event_type", F.hour("ts").cast("bigint").alias("hour_of_day")
    ).agg(big(F.count(F.lit(1))).alias("n"))
    w = Window.partitionBy("event_type")
    return h.select(
        "event_type",
        "hour_of_day",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w).cast("double")).alias("share"),
    )
