"""Second relational batch: correlated subqueries, scalar filter-aggregates,
CUBE, statistical/ordered/collection aggregates, full outer join, regexp
family — completing the SURVEY §2 extended surface."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import big, davg, dec6, dsum, load, query


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6: pure scan-filter-aggregate (fully pushed predicates, single scalar row)",
)
def q6_forecast_revenue(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        big(F.count(F.lit(1))).alias("n"),
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    """,
    description="TPC-H Q4: correlated EXISTS with an extra inequality (semi join with join-condition predicate)",
)
def q4_order_priority(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(big(F.count(F.lit(1))).alias("order_count"))
    )


@query(
    "agg_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    description="CUBE over two dimensions (all 4 grouping sets)",
)
def agg_cube(spark, sf_dir):
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            big(F.count(F.lit(1))).alias("n"),
            dsum(F.col("l_quantity")).alias("qty"),
        )
    )


@query(
    "agg_statistics",
    oracle="""
    SELECT
        l_returnflag,
        CAST(CAST(stddev_samp(l_extendedprice) AS DECIMAL(38,6)) AS DOUBLE) AS price_stddev,
        CAST(CAST(var_samp(l_quantity) AS DECIMAL(38,6)) AS DOUBLE) AS qty_var,
        CAST(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(38,6)) AS DOUBLE) AS qty_price_corr,
        CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
        CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
        CAST(median(l_discount) AS DOUBLE) AS median_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
    description="Statistical aggregates: stddev/variance/corr (quantized — engines use different accumulation orders), exact min/max/median",
)
def agg_statistics(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dec6(F.stddev_samp("l_extendedprice")).alias("price_stddev"),
        dec6(F.var_samp("l_quantity")).alias("qty_var"),
        dec6(F.corr("l_quantity", "l_extendedprice")).alias("qty_price_corr"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.median("l_discount").alias("median_disc"),
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_cust
                FROM customer GROUP BY c_nationkey),
         sn AS (SELECT s_nationkey AS nk, CAST(count(*) AS BIGINT) AS n_supp
                FROM supplier GROUP BY s_nationkey)
    SELECT coalesce(cn.nk, sn.nk) AS nk,
           coalesce(n_cust, 0) AS n_cust,
           coalesce(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.nk = sn.nk
    """,
    description="Full outer join with null-side coalescing",
)
def join_full_outer(spark, sf_dir):
    cn = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(big(F.count(F.lit(1))).alias("n_cust"))
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(big(F.count(F.lit(1))).alias("n_supp"))
    )
    return (
        cn.join(sn, "nk", "full_outer")
        .select(
            F.col("nk"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
    )


@query(
    "agg_ordered_string",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
    description="Ordered string aggregation (sorted collect_list -> join vs string_agg ORDER BY)",
)
def agg_ordered_string(spark, sf_dir):
    return (
        load(spark, sf_dir, "nation")
        .groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            big(F.count(F.lit(1))).alias("n"),
        )
    )


@query(
    "scalar_regexp_gallery",
    oracle=r"""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1) AS first_word,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head,
           regexp_matches(text, 'spark') AS mentions_spark,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_space_parts
    FROM (SELECT doc_id, substring(text, 1, 80) AS text FROM documents)
    """,
    description="Regexp family: extract, global replace, match test, extract_all count, split",
)
def scalar_regexp_gallery(spark, sf_dir):
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 80).alias("text")
    )
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+)", 1).alias("first_word"),
        F.regexp_replace("text", r"[aeiou]", "_").alias("devoweled_head"),
        F.col("text").rlike("spark").alias("mentions_spark"),
        big(F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[0-9]+"), 0))).alias("n_numbers"),
        big(F.size(F.split(F.col("text"), " ", -1))).alias("n_space_parts"),
    )


@query(
    "explode_word_counts",
    oracle="""
    SELECT word, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT unnest(string_split(p_type, ' ')) AS word FROM part)
    GROUP BY word
    """,
    description="Array explode (UNNEST) + aggregation over generated rows",
)
def explode_word_counts(spark, sf_dir):
    return (
        load(spark, sf_dir, "part")
        .select(F.explode(F.split("p_type", " ", -1)).alias("word"))
        .groupBy("word")
        .agg(big(F.count(F.lit(1))).alias("n"))
    )


@query(
    "set_except_all",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nk FROM supplier
    )
    """,
    description="EXCEPT ALL multiset semantics (duplicates preserved by count difference)",
)
def set_except_all(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.exceptAll(supp)


@query(
    "set_intersect_all",
    oracle="""
    SELECT nk FROM (
        SELECT c_nationkey AS nk FROM customer
        INTERSECT ALL
        SELECT s_nationkey AS nk FROM supplier
    )
    """,
    description="INTERSECT ALL multiset semantics (min of per-side duplicate counts)",
)
def set_intersect_all(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    supp = load(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return cust.intersectAll(supp)


@query(
    "approx_aggregates",
    oracle=None,  # sketch-based: HLL/quantile-digest internals differ across engines by design
    description="approx_count_distinct (HyperLogLog++) + percentile_approx — the sketch family for 100 TB cardinality/quantile work",
)
def approx_aggregates(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    # One sketch pass; the quantile array is unpacked to scalar columns in the
    # final projection (array columns break the driver's canonicalizer — same
    # reason quantize_int8 emits exploded scalars, operators/similarity.py).
    agg = li.groupBy("l_returnflag").agg(
        big(F.approx_count_distinct("l_partkey")).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias("q"),
    )
    return agg.select(
        "l_returnflag",
        "approx_parts",
        F.element_at("q", 1).alias("price_p50"),
        F.element_at("q", 2).alias("price_p90"),
        F.element_at("q", 3).alias("price_p99"),
    )


# ---------------------------------------------------------------------------
# Null-safe join semantics: <=> (IS NOT DISTINCT FROM). NULL keys match each
# other — the grouping-key reconciliation shape that a plain equi-join
# silently drops. Fixture columns are null-free, so NULLIF manufactures a
# null bucket on each side deterministically.
# ---------------------------------------------------------------------------

@query(
    "join_null_safe",
    oracle="""
    WITH o AS (
        SELECT nullif(o_custkey % 50, 7) AS k, count(*) AS order_cnt
        FROM orders GROUP BY nullif(o_custkey % 50, 7)
    ),
    c AS (
        SELECT nullif(c_custkey % 50, 7) AS k, count(*) AS cust_cnt
        FROM customer GROUP BY nullif(c_custkey % 50, 7)
    )
    -- bucket from COALESCE(o.k, c.k), mirroring the Spark tree: deriving
    -- it from o.k alone would label a customer-only full-outer row
    -- '<null>' instead of its key (live whenever some mod-50 class has
    -- customers but no orders)
    SELECT coalesce(CAST(coalesce(o.k, c.k) AS VARCHAR), '<null>') AS bucket,
           CAST(coalesce(order_cnt, 0) AS BIGINT) AS order_cnt,
           CAST(coalesce(cust_cnt, 0) AS BIGINT) AS cust_cnt
    FROM o FULL JOIN c ON o.k IS NOT DISTINCT FROM c.k
    """,
    description=(
        "Null-safe FULL join (<=> / IS NOT DISTINCT FROM) reconciling two "
        "aggregates whose keys include a manufactured NULL bucket — the "
        "shape a plain equi-join silently drops"
    ),
)
def join_null_safe(spark, sf_dir):
    o = (
        load(spark, sf_dir, "orders")
        .groupBy(F.nullif(F.col("o_custkey") % 50, F.lit(7)).alias("k"))
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .groupBy(F.nullif(F.col("c_custkey") % 50, F.lit(7)).alias("k"))
        .agg(F.count(F.lit(1)).alias("cust_cnt"))
    )
    joined = o.join(c, o["k"].eqNullSafe(c["k"]), "full")
    return joined.select(
        F.coalesce(
            F.coalesce(o["k"], c["k"]).cast("string"), F.lit("<null>")
        ).alias("bucket"),
        big(F.coalesce(F.col("order_cnt"), F.lit(0))).alias("order_cnt"),
        big(F.coalesce(F.col("cust_cnt"), F.lit(0))).alias("cust_cnt"),
    )


@query(
    "set_union_by_name",
    oracle="""
    SELECT nk, CAST(acct AS DOUBLE) AS acct, kind
    FROM (
        SELECT c_nationkey AS nk, c_acctbal AS acct, 'customer' AS kind
        FROM customer
        UNION ALL BY NAME
        SELECT 'supplier' AS kind, s_nationkey AS nk
        FROM supplier
    )
    """,
    description=(
        "UNION by column NAME with missing columns null-filled "
        "(unionByName(allowMissingColumns=True) vs DuckDB UNION ALL BY "
        "NAME) — schema-evolution-tolerant set union"
    ),
)
def set_union_by_name(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk"),
        F.col("c_acctbal").alias("acct"),
        F.lit("customer").alias("kind"),
    )
    supp = load(spark, sf_dir, "supplier").select(
        F.lit("supplier").alias("kind"),
        F.col("s_nationkey").alias("nk"),
    )
    return cust.unionByName(supp, allowMissingColumns=True).select(
        "nk", F.col("acct").cast("double").alias("acct"), "kind"
    )
