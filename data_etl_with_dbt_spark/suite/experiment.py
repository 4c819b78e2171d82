"""Experimentation / inventory analytics: A/B test summary with a
two-proportion z statistic, conversion-window funnel rates, and a signed
running inventory balance. The product-analytics queries an experimentation
platform runs on the same engine as the training pipeline.

Determinism: proportions and z are per-row IEEE trees over exact integer
counts (sqrt is correctly rounded — exact cross-engine); week buckets come
from integer day arithmetic (datediff % 7 spelling — dayofweek origins
differ between engines); the balance cumsum runs on the decimal grid."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.suite.registry import big, dec6, load, query


@query(
    "ab_test_summary",
    oracle="""
    WITH assign AS (
        SELECT user_id,
               CASE WHEN substr(md5('exp1:' || CAST(user_id AS VARCHAR)), 1, 1)
                         < '8' THEN 'A' ELSE 'B' END AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
        SELECT user_id FROM events WHERE event_type = 'purchase'
        GROUP BY user_id HAVING count(*) >= 14
    ),
    cells AS (
        SELECT arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM assign LEFT JOIN conv ON assign.user_id = conv.user_id
        GROUP BY arm
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 'A' THEN n END) AS na,
            MAX(CASE WHEN arm = 'A' THEN x END) AS xa,
            MAX(CASE WHEN arm = 'B' THEN n END) AS nb,
            MAX(CASE WHEN arm = 'B' THEN x END) AS xb
        FROM cells
    )
    SELECT na, xa, nb, xb,
           CAST(xa AS DOUBLE) / CAST(na AS DOUBLE) AS p_a,
           CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE) AS p_b,
           CAST(CAST(
               (CAST(xa AS DOUBLE) / CAST(na AS DOUBLE)
                - CAST(xb AS DOUBLE) / CAST(nb AS DOUBLE))
               / sqrt(
                   (CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                   * (CAST(1 AS DOUBLE) - CAST(xa + xb AS DOUBLE) / CAST(na + nb AS DOUBLE))
                   * (CAST(1 AS DOUBLE) / CAST(na AS DOUBLE)
                      + CAST(1 AS DOUBLE) / CAST(nb AS DOUBLE)))
           AS DECIMAL(38,6)) AS DOUBLE) AS z_score
    FROM wide
    """,
    description=(
        "A/B experiment readout: md5-hash 50/50 arm assignment, per-arm "
        "conversion (>=14 purchases — fixture-calibrated to the median so "
        "both proportions are interior), pooled two-proportion z statistic"
    ),
)
def ab_test_summary(spark, sf_dir):
    """Deterministic hash randomization (the hash_split_assignment recipe),
    one distinct-user pass + one converter semi-set; the z arithmetic runs
    on a 1-row frame. sqrt is IEEE-correctly-rounded so only the final z is
    grid-quantized (sub-ulp paranoia, not a measured divergence)."""
    ev = load(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    arm = F.when(
        F.substring(
            F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))), 1, 1
        )
        < "8",
        "A",
    ).otherwise("B")
    assign = users.select("user_id", arm.alias("arm"))
    conv = (
        ev.where(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purch"))
        .where(F.col("n_purch") >= 14)
        .select("user_id", F.lit(1).alias("converted"))
    )
    cells = (
        assign.join(conv, "user_id", "left")
        .groupBy("arm")
        .agg(
            big(F.count(F.lit(1))).alias("n"),
            big(F.sum(F.coalesce("converted", F.lit(0)))).alias("x"),
        )
    )
    wide = cells.agg(
        F.max(F.when(F.col("arm") == "A", F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == "A", F.col("x"))).alias("xa"),
        F.max(F.when(F.col("arm") == "B", F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == "B", F.col("x"))).alias("xb"),
    )
    na, xa = F.col("na").cast("double"), F.col("xa").cast("double")
    nb, xb = F.col("nb").cast("double"), F.col("xb").cast("double")
    p_a, p_b = xa / na, xb / nb
    pool = (F.col("xa") + F.col("xb")).cast("double") / (F.col("na") + F.col("nb")).cast("double")
    z = (p_a - p_b) / F.sqrt(
        pool * (F.lit(1.0) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return wide.select(
        "na", "xa", "nb", "xb",
        p_a.alias("p_a"), p_b.alias("p_b"), dec6(z).alias("z_score"),
    )


@query(
    "funnel_conversion_windows",
    oracle="""
    WITH fv AS (
        SELECT user_id, min(epoch_us(ts)) AS v_us
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    fp AS (
        SELECT e.user_id, min(epoch_us(e.ts)) AS p_us
        FROM events e JOIN fv ON e.user_id = fv.user_id
        WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= fv.v_us
        GROUP BY e.user_id
    )
    SELECT CAST(count(*) AS BIGINT) AS n_viewers,
           CAST(SUM(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS converted_ever,
           CAST(SUM(CASE WHEN p_us - v_us <= 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS within_1h,
           CAST(SUM(CASE WHEN p_us - v_us <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS within_1d,
           CAST(SUM(CASE WHEN p_us - v_us <= 604800000000 THEN 1 ELSE 0 END) AS BIGINT) AS within_7d,
           CAST(SUM(CASE WHEN p_us - v_us <= 86400000000 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS rate_1d
    FROM fv LEFT JOIN fp ON fv.user_id = fp.user_id
    """,
    description=(
        "Conversion-window funnel: of first-time viewers, how many purchase "
        "within 1h / 1d / 7d of the first view (integer-µs window bounds)"
    ),
)
def funnel_conversion_windows(spark, sf_dir):
    """Two filtered min-aggs + one left join on user_id; the window bounds
    are integer microsecond comparisons (no timestamp arithmetic on the
    float path). Complements funnel_view_click_purchase (ordered stages)
    and survival_km_conversion (the full curve) with the bounded-window
    business readout."""
    ev = load(spark, sf_dir, "events")
    t = F.unix_micros("ts")
    fv = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(t).alias("v_us"))
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .select("user_id", t.alias("p_us"))
        .join(fv, "user_id")
        .where(F.col("p_us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min("p_us").alias("p_us"))
    )
    j = fv.join(fp, "user_id", "left")
    d = F.col("p_us") - F.col("v_us")
    within = lambda us: big(F.sum(F.when(d <= us, 1).otherwise(0)))
    return j.agg(
        big(F.count(F.lit(1))).alias("n_viewers"),
        big(F.sum(F.when(F.col("p_us").isNotNull(), 1).otherwise(0))).alias("converted_ever"),
        within(3_600_000_000).alias("within_1h"),
        within(86_400_000_000).alias("within_1d"),
        within(604_800_000_000).alias("within_7d"),
        (
            F.sum(F.when(d <= 86_400_000_000, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("rate_1d"),
    )


@query(
    "inventory_running_balance",
    oracle="""
    WITH flows AS (
        SELECT l_partkey, CAST(l_shipdate AS DATE) AS day,
               SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS DECIMAL(18,6))
                        ELSE CAST(-l_quantity AS DECIMAL(18,6)) END) AS net_qty
        FROM lineitem
        GROUP BY 1, 2
    ),
    bal AS (
        SELECT l_partkey, day,
               CAST(net_qty AS DOUBLE) AS net_qty,
               CAST(SUM(net_qty) OVER (
                   PARTITION BY l_partkey ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS balance
        FROM flows
    )
    SELECT * FROM bal
    ORDER BY l_partkey, day
    LIMIT 200
    """,
    description=(
        "Signed running inventory balance per part: returns add stock, "
        "shipments draw it down; day-grain flows then a per-part cumulative "
        "sum on the exact decimal grid"
    ),
)
def inventory_running_balance(spark, sf_dir):
    """The flows agg shuffles on (part, day) — map-side combined; the
    cumulative window re-keys on part only (a subset — one more exchange at
    part grain, amortized across every day of that part). Decimal sums end
    to end: a float cumsum would drift cross-engine over long histories."""
    li = load(spark, sf_dir, "lineitem")
    signed = F.when(
        F.col("l_returnflag") == "R", F.col("l_quantity").cast("decimal(18,6)")
    ).otherwise((-F.col("l_quantity")).cast("decimal(18,6)"))
    flows = li.groupBy(
        "l_partkey", F.to_date("l_shipdate").alias("day")
    ).agg(F.sum(signed).alias("net_qty"))
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bal = flows.select(
        "l_partkey",
        "day",
        F.col("net_qty").cast("double").alias("net_qty"),
        F.sum("net_qty").over(w).cast("double").alias("balance"),
    )
    return bal.orderBy("l_partkey", "day").limit(200)


@query(
    "market_basket_lift",
    bench=True,
    oracle="""
    WITH basket AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM basket),
    item AS (
        SELECT l_partkey, CAST(count(*) AS BIGINT) AS supp FROM basket GROUP BY l_partkey
    ),
    pair AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, CAST(count(*) AS BIGINT) AS n_both
        FROM basket a JOIN basket b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        HAVING count(*) >= 3
    )
    SELECT pa, pb, n_both, ia.supp AS supp_a, ib.supp AS supp_b,
           (CAST(n_both AS DOUBLE) / CAST(n AS DOUBLE))
               / ((CAST(ia.supp AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(ib.supp AS DOUBLE) / CAST(n AS DOUBLE))) AS lift
    FROM pair
    JOIN item ia ON ia.l_partkey = pa
    JOIN item ib ON ib.l_partkey = pb
    CROSS JOIN n_orders
    ORDER BY lift DESC, pa, pb
    LIMIT 20
    """,
    description=(
        "Market-basket affinity: part pairs co-purchased in >=3 orders with "
        "lift = P(a,b)/(P(a)P(b)), top-20 — the a-priori pair step keyed on "
        "the order (pairs bounded by basket size, never item-global)"
    ),
)
def market_basket_lift(spark, sf_dir):
    """The pair join is keyed on l_orderkey, so work is sum(basket^2) per
    order, not corpus^2; item supports broadcast back onto the surviving
    (>= min support) pairs. The lift ratio composes three exact-count
    divisions over BIGINTs with the expression tree mirrored verbatim in
    the oracle — deterministic-exact, so it emits the RAW double (the r9
    quantization rule: a grid on a bit-identical value only adds a
    .5e-6-boundary failure mode).

    Delegates pairing to ``operators.relational.basket_pair_counts``; the
    fixture's baskets are TPC-H-bounded (<= 7 line items) so the exact path
    (no ``max_basket_items`` cap) is correct here — open-ended carts at
    100 TB set the cap to bound the sum(basket^2) pathology (see the
    operator docstring)."""
    from data_etl_with_dbt_spark.operators.relational import basket_pair_counts

    li = load(spark, sf_dir, "lineitem")
    # ONE lineitem scan + distinct, shared by all three consumers
    # (n_orders, item supports, the pair join) — Catalyst gives no
    # cross-consumer CSE, so without the cut this ran three times
    basket = (
        li.select("l_orderkey", "l_partkey")
        .distinct()
        .transform(materialize)
    )
    n_orders = basket.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n")
    )
    item = basket.groupBy("l_partkey").agg(big(F.count(F.lit(1))).alias("supp"))
    pair = basket_pair_counts(
        basket, "l_orderkey", "l_partkey", min_support=3, pre_deduped=True
    )
    n = F.col("n").cast("double")
    lift = (F.col("n_both").cast("double") / n) / (
        (F.col("supp_a").cast("double") / n) * (F.col("supp_b").cast("double") / n)
    )
    return (
        pair.join(item.withColumnRenamed("l_partkey", "pa").withColumnRenamed("supp", "supp_a"), "pa")
        .join(item.withColumnRenamed("l_partkey", "pb").withColumnRenamed("supp", "supp_b"), "pb")
        .crossJoin(F.broadcast(n_orders))
        .select("pa", "pb", "n_both", "supp_a", "supp_b", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(20)
    )


@query(
    "duplicate_invoice_heuristic",
    oracle="""
    SELECT a.o_orderkey AS k1, b.o_orderkey AS k2, a.o_custkey,
           CAST(floor(a.o_totalprice / 5000) AS BIGINT) AS amount_bucket,
           CAST(datediff('day', CAST(a.o_orderdate AS DATE), CAST(b.o_orderdate AS DATE)) AS BIGINT) AS days_apart
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND CAST(floor(a.o_totalprice / 5000) AS BIGINT) = CAST(floor(b.o_totalprice / 5000) AS BIGINT)
     AND a.o_orderkey < b.o_orderkey
     AND CAST(b.o_orderdate AS DATE) - CAST(a.o_orderdate AS DATE) BETWEEN 0 AND 90
    """,
    description=(
        "Duplicate-invoice screen: same customer, same $5k amount bucket, "
        "within 90 days — equi-keyed self-join with the date band as a "
        "residual filter (bucket/window fixture-calibrated: 3 pairs at "
        "sf0.001, 33 at sf0.01 — never vacuous)"
    ),
)
def duplicate_invoice_heuristic(spark, sf_dir):
    """The fraud/dup screen every AP system runs: the join keys are
    (custkey, amount bucket) — a hash join with the day window as a cheap
    residual, never an inequality-only join. The bucket is floor(x/5000)
    with explicit floor on BOTH sides (DuckDB's double->int CAST rounds);
    production tightens the bucket as real data has exact-duplicate
    amounts — the fixture's uniform prices need the coarse grid."""
    o = load(spark, sf_dir, "orders")
    amt = F.floor(F.col("o_totalprice") / F.lit(5000)).cast("bigint")
    a = o.select(
        F.col("o_orderkey").alias("k1"),
        "o_custkey",
        amt.alias("amt"),
        F.to_date("o_orderdate").alias("d1"),
    )
    b = o.select(
        F.col("o_orderkey").alias("k2"),
        F.col("o_custkey").alias("c2"),
        amt.alias("amt2"),
        F.to_date("o_orderdate").alias("d2"),
    )
    j = a.join(
        b,
        (F.col("o_custkey") == F.col("c2"))
        & (F.col("amt") == F.col("amt2"))
        & (F.col("k1") < F.col("k2"))
        & (F.datediff("d2", "d1") >= 0)
        & (F.datediff("d2", "d1") <= 90),
    )
    return j.select(
        "k1",
        "k2",
        "o_custkey",
        F.col("amt").alias("amount_bucket"),
        F.datediff("d2", "d1").cast("bigint").alias("days_apart"),
    )
