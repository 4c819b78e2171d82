"""TPC-H q7-q22 family over the trimmed star schema (SURVEY.md §7 phase E).

The driver's fixtures carry a reduced TPC-H: no partsupp, and lineitem lacks
shipmode/commitdate/receiptdate, so the queries that need those columns are
adapted to the available ones while keeping the *operator shape* that makes
each TPC-H query interesting:

* q7  — double-dimension join (supplier nation x customer nation) + year agg
* q8  — market-share ratio (conditional sum / total sum, per group)
* q9  — profit by supplier-nation x year with a LIKE part filter
* q10 — returned-item top-k (join + agg + total-order limit)
* q12 — CASE-sum priority counts (conditional aggregation)
* q13 — distribution-of-counts (two-level aggregation over an outer join)
* q14 — promo-revenue ratio over one month
* q15 — top supplier via max-scalar subquery
* q17 — correlated per-key average (small-quantity revenue)
* q18 — HAVING over a grouped sum feeding a semi join
* q19 — disjunctive multi-attribute predicates (OR-of-ANDs)
* q22 — anti join + scalar subquery over a derived filter
* q2  — correlated per-part MIN over a derived supply relation (window MIN)
* q11 — grouped value with HAVING against a whole-result scalar subquery
* q20 — double-nested IN with a correlated scalar aggregate (semi joins)

Cross-engine determinism follows registry rules: decimal-exact sums emitted
as DOUBLE, ratios as divisions of those exact values (IEEE-identical per
row), counts as BIGINT, every LIMIT under a total order.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.suite.registry import big, davg, dec6, dsum, load, query

# ---------------------------------------------------------------------------
# q7: volume shipping between two nations, per direction and ship year.
# ---------------------------------------------------------------------------

@query(
    "q7_volume_shipping",
    oracle="""
    SELECT
        n1.n_name AS supp_nation,
        n2.n_name AS cust_nation,
        CAST(extract(year FROM l_shipdate) AS BIGINT) AS l_year,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM supplier
    JOIN lineitem ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY n1.n_name, n2.n_name, l_year
    """,
    description="TPC-H Q7: bidirectional nation-pair trade volume per ship year (two broadcast dims on different keys)",
)
def q7_volume_shipping(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    supp = load(spark, sf_dir, "supplier")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(pair)
        .groupBy(
            "supp_nation", "cust_nation", big(F.year("l_shipdate")).alias("l_year")
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q8: market share of one nation inside one region, per order year.
# ---------------------------------------------------------------------------

@query(
    "q8_market_share",
    oracle="""
    WITH all_sales AS (
        SELECT
            CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
            CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) AS volume,
            n2.n_name AS supp_nation
        FROM part
        JOIN lineitem ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON c_nationkey = n1.n_nationkey
        JOIN region   ON n1.n_regionkey = r_regionkey
        JOIN nation n2 ON s_nationkey = n2.n_nationkey
        WHERE r_name = 'EUROPE'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
    )
    SELECT
        o_year,
        CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
           / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM all_sales
    GROUP BY o_year
    """,
    description="TPC-H Q8: conditional-sum market-share ratio per year (8-way join, exact-decimal numerator/denominator). Substitution parameters (region/type/nation are parameters per the TPC-H spec) fixture-calibrated round 4: the fixture's regions are real names (EUROPE...), so the old REGION_1 literal made the result vacuously empty at every sf.",
)
def q8_market_share(spark, sf_dir):
    part = load(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    sales = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .select(
            big(F.year("o_orderdate")).alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,6)")
    return sales.groupBy("o_year").agg(
        (
            F.sum(
                F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(zero)
            ).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# q9: profit by supplier nation and year, parts matching a LIKE pattern.
# (No partsupp in the fixtures -> profit = discounted revenue.)
# ---------------------------------------------------------------------------

@query(
    "q9_product_type_profit",
    oracle="""
    SELECT
        n_name AS nation,
        CAST(extract(year FROM o_orderdate) AS BIGINT) AS o_year,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_profit
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%widget%'
    GROUP BY n_name, extract(year FROM o_orderdate)
    """,
    description="TPC-H Q9 (no partsupp): supplier-nation x year profit over LIKE-filtered parts",
)
def q9_product_type_profit(spark, sf_dir):
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%widget%"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), big(F.year("o_orderdate")).alias("o_year"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# q10: returned-item reporting — top 20 customers by lost revenue.
# ---------------------------------------------------------------------------

@query(
    "q10_returned_items",
    oracle="""
    SELECT
        c_custkey, c_name,
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
        c_acctbal,
        n_name
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate <  TIMESTAMP '1997-07-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10: returned-item lost revenue, grouped on customer attrs, total-order top-20",
)
def q10_returned_items(spark, sf_dir):
    from data_etl_with_dbt_spark.suite.registry import dec6

    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", cust.c_acctbal, "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            "c_acctbal",
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# q12: conditional priority counts (shipmode absent -> group by linestatus).
# ---------------------------------------------------------------------------

@query(
    "q12_priority_counts",
    oracle="""
    SELECT
        l_linestatus,
        CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l_linestatus
    """,
    description="TPC-H Q12 shape: CASE-sum conditional counts per group (shipmode absent, linestatus stands in)",
)
def q12_priority_counts(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            big(F.sum(F.when(high, 1).otherwise(0))).alias("high_line_count"),
            big(F.sum(F.when(~high, 1).otherwise(0))).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# q13: customer order-count distribution (two-level aggregation).
# ---------------------------------------------------------------------------

@query(
    "q13_customer_distribution",
    oracle="""
    WITH c_orders AS (
        SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        FROM customer
        LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
        GROUP BY c_custkey
    )
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM c_orders
    GROUP BY c_count
    """,
    description="TPC-H Q13: distribution of per-customer order counts (outer join with join-level predicate, two-level agg)",
)
def q13_customer_distribution(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    c_orders = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey) & (orders.o_orderpriority != "5-LOW"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(big(F.count("o_orderkey")).alias("c_count"))
    )
    return c_orders.groupBy("c_count").agg(big(F.count(F.lit(1))).alias("custdist"))


# ---------------------------------------------------------------------------
# q14: promo revenue share in one month.
# ---------------------------------------------------------------------------

@query(
    "q14_promo_revenue",
    oracle="""
    SELECT
        CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
             AS DOUBLE) AS promo_revenue
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
    description="TPC-H Q14: promo revenue percentage (conditional exact-decimal sums, scalar result)",
)
def q14_promo_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    volume = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    zero = F.lit(0).cast("decimal(18,6)")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", volume).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(volume).cast("double")
            )
            .cast("double")
            .alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# q15: top supplier(s) by quarterly revenue via max-scalar subquery.
# ---------------------------------------------------------------------------

@query(
    "q15_top_supplier",
    oracle="""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier
    JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    description="TPC-H Q15: per-supplier revenue CTE reused for both the join and the max-scalar subquery",
)
def q15_top_supplier(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    ).transform(materialize)  # max_rev + filter both read it: agg once
    max_rev = revenue.agg(F.max("total_revenue").alias("__max"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("__max"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# q17: small-quantity revenue via correlated per-part average.
# ---------------------------------------------------------------------------

@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#12'
      AND l_quantity < (
          SELECT 0.2 * avg(l_quantity) FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    description="TPC-H Q17: correlated per-part AVG subquery (decorrelated to an aggregate-then-join in Spark)",
)
def q17_small_quantity_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#12")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (dsum(F.col("l_extendedprice")) / F.lit(7.0)).cast("double").alias("avg_yearly")
        )
    )


# ---------------------------------------------------------------------------
# q18: large-volume customers (HAVING over grouped sum -> semi join).
# ---------------------------------------------------------------------------

@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT
        c_name, c_custkey, o_orderkey, o_orderdate,
        o_totalprice,
        CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS total_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 50
    """,
    description="TPC-H Q18: HAVING-filtered keys feed a semi join; grouped totals under a total-order top-50",
)
def q18_large_volume_customers(spark, sf_dir):
    from data_etl_with_dbt_spark.suite.registry import dec6

    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big_orders = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .where(F.col("__qty") > 250)
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        orders.join(big_orders, "o_orderkey", "left_semi")
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", orders.o_totalprice)
        .agg(dsum(F.col("l_quantity")).alias("total_qty"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


# ---------------------------------------------------------------------------
# q19: disjunctive multi-attribute predicates (OR-of-ANDs join filter).
# ---------------------------------------------------------------------------

@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT
        CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 20)
       OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 50 AND l_quantity >= 20 AND l_quantity <= 30)
    """,
    description=(
        "TPC-H Q19: OR-of-ANDs predicate spanning both join sides (tests "
        "disjunct pushdown). Fixture-calibrated round 5: the spec's "
        "Brand#34 does not exist in the fixture (brands stop at 25), so "
        "the third disjunct was dead; Brand#15 makes all three branches "
        "live at every sf"
    ),
)
def q19_discounted_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & (q >= 1)
        & (q <= 11)
        | (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & (q >= 10)
        & (q <= 20)
        | (F.col("p_brand") == "Brand#15")
        & F.col("p_size").between(1, 50)
        & (q >= 20)
        & (q <= 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .where(cond)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# q22: well-funded customers with no orders, per nation (anti join +
# scalar subquery over a derived filter; c_phone absent -> nation key).
# ---------------------------------------------------------------------------

@query(
    "q22_inactive_customers",
    oracle="""
    WITH wealthy AS (
        SELECT c_custkey, c_nationkey, c_acctbal
        FROM customer
        WHERE c_nationkey IN (1, 3, 5, 7, 9, 11)
          AND c_acctbal > (
              -- dec6-quantized: raw double AVG is accumulation-order-
              -- dependent cross-engine; fixture margin to the nearest
              -- balance is >11, so outputs are unchanged
              SELECT CAST(CAST(avg(c_acctbal) AS DECIMAL(38,6)) AS DOUBLE) FROM customer
              WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9, 11)
          )
    )
    SELECT
        CAST(c_nationkey AS BIGINT) AS cntrycode,
        CAST(count(*) AS BIGINT) AS numcust,
        CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM wealthy
    WHERE NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
    )
    GROUP BY c_nationkey
    """,
    description="TPC-H Q22: scalar-avg subquery filter + NOT EXISTS anti join, grouped totals. Fixture-calibrated round 4: every sf0.01 customer has at least one order, so the spec's order-less definition of inactive was vacuously empty — 'inactive' is now 'no orders since 2000-01-01' (same anti-join shape, non-empty at sf0.001 and sf0.01).",
)
def q22_inactive_customers(spark, sf_dir):
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nations = [1, 3, 5, 7, 9, 11]
    pool = cust.where(F.col("c_nationkey").isin(nations))
    avg_bal = pool.where(F.col("c_acctbal") > 0).agg(
        dec6(F.avg("c_acctbal")).alias("__avg")  # order-independent grid
    )
    wealthy = (
        pool.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    no_orders = wealthy.join(
        recent.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti"
    )
    return no_orders.groupBy(big(F.col("c_nationkey")).alias("cntrycode")).agg(
        big(F.count(F.lit(1))).alias("numcust"),
        dsum(F.col("c_acctbal")).alias("totacctbal"),
    )


# ---------------------------------------------------------------------------
# q16: supplier cardinality per part attributes with a NOT IN exclusion.
# (No partsupp -> supply relationships come from lineitem.)
# ---------------------------------------------------------------------------

@query(
    "q16_supplier_cardinality",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part
    JOIN lineitem ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#13'
      AND p_size IN (1, 7, 14, 23, 36, 45, 49, 9)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
    description=(
        "TPC-H Q16 shape: NOT IN exclusion subquery (anti join on "
        "non-null keys) + distinct-count per attribute group. Fixture-"
        "calibrated round 5: the spec's Brand#45 does not exist in the "
        "fixture, so the exclusion was vacuous; Brand#13 removes real "
        "rows at every sf"
    ),
)
def q16_supplier_cardinality(spark, sf_dir):
    part = load(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#13") & F.col("p_size").isin(1, 7, 14, 23, 36, 45, 49, 9)
    )
    li = load(spark, sf_dir, "lineitem")
    bad_supp = (
        load(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    return (
        li.join(bad_supp, "l_suppkey", "left_anti")
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(big(F.countDistinct("l_suppkey")).alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# q21: suppliers who kept orders waiting — the only late supplier in a
# multi-supplier order. Adapted lateness: shipped >60 days after the order
# date (the trimmed lineitem has no commit/receipt dates).
# ---------------------------------------------------------------------------

@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    WITH li AS (
        SELECT l.l_orderkey, l.l_suppkey,
               (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM li l1
    JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE l1.late
      AND EXISTS (SELECT 1 FROM li l2 WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3 WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 100
    """,
    description=(
        "TPC-H q21 shape (EXISTS + NOT EXISTS self-join) rewritten as one "
        "per-order aggregation — late-row counts join back on the order key, "
        "so no lineitem self-join ever materializes"
    ),
)
def q21_suppliers_kept_waiting(spark, sf_dir):
    # The faithful plan self-joins lineitem twice (EXISTS / NOT EXISTS); at
    # 100 TB that's two extra full-table scans and exchanges. Equivalent
    # rewrite: per-(order, supplier) late-row counts, then per-order
    # supplier/late-supplier tallies as WINDOW aggregates over the order key
    # — a late row qualifies iff its order has >1 supplier and exactly 1 late
    # supplier (itself). The join on l_orderkey already hash-partitions by
    # the order key, which satisfies both the (order, supplier) groupBy's
    # clustering and the window's partitioning, so neither adds an exchange
    # and lineitem is scanned ONCE (asserted in tests/test_plan_shapes.py).
    # The oracle keeps the EXISTS form, so parity also proves the rewrite.
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")

    flagged = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")).alias("late"),
    )
    per_os = flagged.groupBy("l_orderkey", "l_suppkey").agg(
        F.count(F.when(F.col("late"), 1)).alias("n_late_rows")
    )
    w = Window.partitionBy("l_orderkey")
    qual = (
        per_os.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn(
            "n_late_supp",
            F.sum(F.when(F.col("n_late_rows") > 0, 1).otherwise(0)).over(w),
        )
        .where(
            (F.col("n_late_rows") > 0)
            & (F.col("n_supp") > 1)
            & (F.col("n_late_supp") == 1)
        )
    )
    return (
        qual.groupBy("l_suppkey")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        # final regroup by s_name: the ORACLE groups by name, so two
        # suppliers sharing an s_name must merge here too (supplier-
        # cardinality agg — free; nothing pins name uniqueness in the
        # fixture contract)
        .groupBy("s_name")
        .agg(big(F.sum("numwait")).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q2: minimum-cost supplier per part. (No partsupp -> the supply relation is
# derived from lineitem: one row per (part, supplier) pair that ever shipped,
# with supply cost = min observed unit price. Per-row division is IEEE-
# identical across engines, MIN picks from identical candidate sets, and the
# per-part minimum is a window MIN — so raw doubles are safe to compare and
# emit.)
# ---------------------------------------------------------------------------

@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supplycost
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, p.p_brand, eu.s_name, eu.s_acctbal, eu.n_name,
               sp.supplycost,
               MIN(sp.supplycost) OVER (PARTITION BY p.p_partkey) AS min_cost
        FROM supply sp
        JOIN eu ON sp.l_suppkey = eu.s_suppkey
        JOIN part p ON sp.l_partkey = p.p_partkey
        WHERE p.p_type = 'STANDARD' AND p.p_size <= 25
    )
    SELECT s_acctbal, s_name, n_name,
           CAST(p_partkey AS BIGINT) AS p_partkey, p_brand, supplycost
    FROM cand WHERE supplycost = min_cost
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100
    """,
    description=(
        "TPC-H Q2 shape: correlated MIN subquery (per-part minimum supply "
        "cost) spelled as a window MIN over the derived supply relation; "
        "all-ties-kept semantics preserved"
    ),
)
def q2_min_cost_supplier(spark, sf_dir):
    # The faithful plan re-aggregates the supply relation in a correlated
    # subquery; the window MIN computes it in the same pass that already
    # holds the rows. Dimension sides (supplier+nation+region, filtered
    # part) broadcast; the only shuffles are the supply groupBy on
    # (partkey, suppkey) and the window's repartition on partkey — both over
    # the already-aggregated pair table, never raw lineitem twice.
    li = load(spark, sf_dir, "lineitem")
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eu = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    part = load(spark, sf_dir, "part").where(
        (F.col("p_type") == "STANDARD") & (F.col("p_size") <= 25)
    )
    cand = (
        supply.join(eu, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_cost", F.min("supplycost").over(w))
        .where(F.col("supplycost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            big(F.col("p_partkey")).alias("p_partkey"),
            "p_brand",
            "supplycost",
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q11: important parts by supplied value with a HAVING against a scalar
# subquery over the whole result. (No partsupp/availqty -> part value =
# revenue supplied by the region's suppliers; the TPC-H fraction threshold
# becomes 1.2x the mean part value so the predicate self-scales with SF.)
# ---------------------------------------------------------------------------

@query(
    "q11_important_parts",
    oracle="""
    WITH eu_supp AS (
        SELECT s_suppkey
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    vals AS (
        SELECT l_partkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS part_value
        FROM lineitem JOIN eu_supp ON l_suppkey = s_suppkey
        GROUP BY l_partkey
    ),
    tot AS (
        SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
               CAST(COUNT(*) AS DOUBLE) AS n_parts
        FROM vals
    )
    SELECT CAST(l_partkey AS BIGINT) AS p_partkey, part_value
    FROM vals, tot
    WHERE part_value > (total_value / n_parts) * 1.2
    ORDER BY part_value DESC, p_partkey LIMIT 100
    """,
    description=(
        "TPC-H Q11 shape: grouped value per part filtered by a scalar "
        "subquery over the aggregate itself (HAVING vs global threshold)"
    ),
)
def q11_important_parts(spark, sf_dir):
    # The scalar subquery is a 1-row broadcast cross join. Catalyst does NOT
    # CSE the part-value aggregate across its two consumers (the broadcast
    # subtree re-ran the whole lineitem join+agg — measured, same trap as
    # q21), so the aggregate is localCheckpoint'd: computed once, both the
    # scalar total and the threshold filter read the materialized rows. The
    # threshold arithmetic mirrors the oracle's parenthesization exactly
    # ((total/n) * 1.2 on decimal-exact doubles).
    eu_supp = (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    li = load(spark, sf_dir, "lineitem")
    vals = (
        li.join(eu_supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("part_value"))
    ).transform(materialize)
    tot = vals.agg(
        dsum(F.col("part_value")).alias("total_value"),
        F.count(F.lit(1)).cast("double").alias("n_parts"),
    )
    return (
        vals.crossJoin(F.broadcast(tot))
        .where(F.col("part_value") > (F.col("total_value") / F.col("n_parts")) * F.lit(1.2))
        .select(big(F.col("l_partkey")).alias("p_partkey"), "part_value")
        .orderBy(F.col("part_value").desc(), "p_partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# q20: suppliers with excess supply of a part family — double-nested
# IN/EXISTS. (No partsupp availqty -> a (supplier, part) pair qualifies when
# its 1997 shipped quantity exceeds 20% of the part's total 1997 quantity:
# the same correlated-scalar-aggregate-inside-IN shape as availqty >
# 0.5 * sum(l_quantity).)
# ---------------------------------------------------------------------------

@query(
    "q20_excess_supply",
    oracle="""
    WITH pair AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,6))) AS pair_qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        GROUP BY l_suppkey, l_partkey
    ),
    qual AS (
        SELECT DISTINCT l_suppkey FROM (
            SELECT l_suppkey,
                   CAST(pair_qty AS DOUBLE) AS pq,
                   CAST(SUM(pair_qty) OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_qty
            FROM pair
        ) WHERE pq > 0.2 * part_qty
    )
    SELECT s_name, s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
    ORDER BY s_name
    """,
    description=(
        "TPC-H Q20 shape: IN over an IN-filtered, correlated-aggregate "
        "derived set (nested subqueries as semi joins; the correlated "
        "per-part total is a window over the pair aggregate's own keys)"
    ),
)
def q20_excess_supply(spark, sf_dir):
    # Nested-IN chain compiled to two broadcast semi joins + one pair-level
    # aggregation: lineitem is scanned once (part-family filter pushed as a
    # semi join), the correlated per-part total is a window over the tiny
    # pair aggregate, and suppliers resolve with a final semi join.
    small_parts = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        li.join(
            small_parts,
            F.col("l_partkey") == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("pair_qty"))
    )
    w = Window.partitionBy("l_partkey")
    qual = (
        pair.withColumn("pq", F.col("pair_qty").cast("double"))
        .withColumn("part_qty", F.sum("pair_qty").over(w).cast("double"))
        .where(F.col("pq") > F.lit(0.2) * F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )
