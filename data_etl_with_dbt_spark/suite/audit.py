"""Cross-table audit reports: fact-vs-rollup reconciliation, functional-
dependency discovery, and session entry/exit analysis. These are the
warehouse-hygiene queries a migration or incident review runs first: does
the order header agree with its lines, which "keys" aren't really keys,
where do user sessions start and end.

Scale shapes: reconciliation is one lineitem agg keyed on the join key it
feeds (no second exchange at the join); FD checks are one distinct-pair agg
per candidate (map-side combined); the session report layers windows on the
same user_id partitioning so sessionization and the entry/exit frames share
one exchange.

Determinism: decimal-grid sums for money, identical IEEE trees for per-row
products, davg spelling for averaged durations (registry rules)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import big, load, query


@query(
    "reconcile_order_totals",
    oracle="""
    WITH lines AS (
        SELECT l_orderkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                        AS DECIMAL(18,6))) AS computed
        FROM lineitem GROUP BY l_orderkey
    )
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,6)) AS DOUBLE) AS header_total,
           CAST(computed AS DOUBLE) AS line_total,
           CAST(CAST(o_totalprice AS DECIMAL(18,6)) - computed AS DOUBLE) AS diff
    FROM orders JOIN lines ON o_orderkey = l_orderkey
    ORDER BY abs(CAST(CAST(o_totalprice AS DECIMAL(18,6)) - computed AS DOUBLE)) DESC,
             o_orderkey
    LIMIT 15
    """,
    description=(
        "Header-vs-detail reconciliation: order totals against the "
        "lineitem-computed revenue sum, 15 worst mismatches — the first "
        "audit query of any warehouse migration"
    ),
)
def reconcile_order_totals(spark, sf_dir):
    """The lineitem agg shuffles on l_orderkey, which is also the join key —
    one exchange feeds both; the diff is exact decimal arithmetic so the
    worst-offender ordering is deterministic cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    per_row = (
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * (F.lit(1) + F.col("l_tax"))
    ).cast("decimal(18,6)")
    lines = li.groupBy("l_orderkey").agg(F.sum(per_row).alias("computed"))
    header = F.col("o_totalprice").cast("decimal(18,6)")
    j = o.join(lines, F.col("o_orderkey") == F.col("l_orderkey")).select(
        "o_orderkey",
        header.cast("double").alias("header_total"),
        F.col("computed").cast("double").alias("line_total"),
        (header - F.col("computed")).cast("double").alias("diff"),
    )
    return j.orderBy(F.abs(F.col("diff")).desc(), "o_orderkey").limit(15)


@query(
    "functional_dependency_check",
    oracle="""
    WITH pairs AS (
        SELECT 'orders: o_custkey->o_orderpriority' AS fd, o_custkey AS k, o_orderpriority AS v FROM orders
        UNION ALL
        SELECT 'events: user_id->event_type', user_id, event_type FROM events
        UNION ALL
        SELECT 'lineitem: l_orderkey->l_returnflag', l_orderkey, l_returnflag FROM lineitem
        UNION ALL
        SELECT 'customer: c_custkey->c_mktsegment', c_custkey, c_mktsegment FROM customer
    ),
    per_key AS (
        SELECT fd, k, CAST(count(DISTINCT v) AS BIGINT) AS nv
        FROM pairs GROUP BY fd, k
    )
    SELECT fd,
           CAST(count(*) AS BIGINT) AS n_keys,
           CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_keys,
           CAST(SUM(nv - 1) AS BIGINT) AS extra_values,
           (SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM per_key
    GROUP BY fd
    """,
    description=(
        "Functional-dependency discovery: for four candidate key->value "
        "rules, count keys mapping to more than one value — c_custkey (a "
        "real key) holds, the behavioral candidates don't"
    ),
)
def functional_dependency_check(spark, sf_dir):
    """FD profiling: each candidate costs one distinct-pair agg keyed on
    (fd, key) — map-side combined, never a self-join. The union keeps it a
    single pipeline; at scale run candidates per-table to keep scans
    pruned to two columns each."""
    o = load(spark, sf_dir, "orders")
    ev = load(spark, sf_dir, "events")
    li = load(spark, sf_dir, "lineitem")
    c = load(spark, sf_dir, "customer")

    def cand(df, fd, k, v):
        return df.select(
            F.lit(fd).alias("fd"), F.col(k).alias("k"), F.col(v).alias("v")
        )

    pairs = (
        cand(o, "orders: o_custkey->o_orderpriority", "o_custkey", "o_orderpriority")
        .unionAll(cand(ev, "events: user_id->event_type", "user_id", "event_type"))
        .unionAll(cand(li, "lineitem: l_orderkey->l_returnflag", "l_orderkey", "l_returnflag"))
        .unionAll(cand(c, "customer: c_custkey->c_mktsegment", "c_custkey", "c_mktsegment"))
    )
    per_key = pairs.groupBy("fd", "k").agg(
        F.countDistinct("v").cast("bigint").alias("nv")
    )
    return per_key.groupBy("fd").agg(
        big(F.count(F.lit(1))).alias("n_keys"),
        big(F.sum(F.when(F.col("nv") > 1, 1).otherwise(0))).alias("violating_keys"),
        big(F.sum(F.col("nv") - 1)).alias("extra_values"),
        (F.sum(F.when(F.col("nv") > 1, 1).otherwise(0)) == 0).alias("holds"),
    )


@query(
    "session_entry_exit",
    oracle="""
    WITH marked AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS t,
               CASE WHEN epoch_us(ts)
                         - epoch_us(lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
                         > 30 * 60 * 1000000
                     OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ),
    numbered AS (
        SELECT user_id, event_id, event_type, t,
               SUM(is_new) OVER (
                   PARTITION BY user_id ORDER BY t, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS session_no
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_no,
               first_value(event_type) OVER w AS entry_type,
               last_value(event_type) OVER w AS exit_type,
               CAST(count(*) OVER w AS BIGINT) AS n_events,
               CAST(max(t) OVER w - min(t) OVER w AS BIGINT) AS dur_us,
               row_number() OVER (
                   PARTITION BY user_id, session_no ORDER BY t, event_id
               ) AS rn
        FROM numbered
        WINDOW w AS (
            PARTITION BY user_id, session_no ORDER BY t, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        )
    )
    SELECT entry_type, exit_type,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
           CAST(SUM(dur_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
               / CAST(1000000 AS DOUBLE) AS avg_duration_s
    FROM sessions
    WHERE rn = 1
    GROUP BY entry_type, exit_type
    """,
    description=(
        "Session entry/exit report: 30-minute-gap sessions rolled up by "
        "(first event type, last event type) with bounce counts and average "
        "session duration"
    ),
)
def session_entry_exit(spark, sf_dir):
    """Layered windows all keyed on user_id (+ session_no, a superset) — the
    sessionization exchange is the only one until the final small rollup
    (repo rule: windows keyed on a superset of the incoming partitioning
    add no exchange)."""
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w_seq))
    is_new = F.when(gap_us.isNull() | (gap_us > 30 * 60 * 1_000_000), 1).otherwise(0)
    numbered = ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros("ts").alias("t"),
        F.sum(is_new)
        .over(w_seq.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_no"),
    )
    w_sess = (
        Window.partitionBy("user_id", "session_no")
        .orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    w_rank = Window.partitionBy("user_id", "session_no").orderBy("t", "event_id")
    sessions = numbered.select(
        "user_id",
        "session_no",
        F.first("event_type").over(w_sess).alias("entry_type"),
        F.last("event_type").over(w_sess).alias("exit_type"),
        F.count(F.lit(1)).over(w_sess).cast("bigint").alias("n_events"),
        (F.max("t").over(w_sess) - F.min("t").over(w_sess))
        .cast("bigint")
        .alias("dur_us"),
        F.row_number().over(w_rank).alias("rn"),
    ).where(F.col("rn") == 1)
    return sessions.groupBy("entry_type", "exit_type").agg(
        big(F.count(F.lit(1))).alias("n_sessions"),
        big(F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))).alias("n_bounces"),
        # timestamp-derived average: exact integer-µs sum, identical double
        # division trees — NEVER the decimal grid (µs-grid cast trap)
        (
            F.sum("dur_us").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1_000_000).cast("double")
        ).alias("avg_duration_s"),
    )


@query(
    "scalar_distance_gallery",
    oracle="""
    WITH pairs AS (
        SELECT a.c_custkey AS k, lower(a.c_name) AS na, lower(b.c_name) AS nb
        FROM customer a JOIN customer b ON b.c_custkey = a.c_custkey + 1
    ),
    g AS (
        SELECT k, na, nb,
               CAST(levenshtein(na, nb) AS BIGINT) AS lev,
               list_distinct(list_transform(range(1, length(na)), i -> na[i:i+1])) AS ba,
               list_distinct(list_transform(range(1, length(nb)), i -> nb[i:i+1])) AS bb
        FROM pairs
    )
    SELECT k, na, nb, lev,
           CAST(len(list_intersect(ba, bb)) AS BIGINT) AS bigram_common,
           CAST(len(ba) + len(bb) - len(list_intersect(ba, bb)) AS BIGINT) AS bigram_union,
           CAST(len(list_intersect(ba, bb)) AS DOUBLE)
               / CAST(len(ba) + len(bb) - len(list_intersect(ba, bb)) AS DOUBLE)
               AS bigram_jaccard,
           (substr(na, 1, 3) = substr(nb, 1, 3)) AS same_prefix3
    FROM g
    """,
    description=(
        "String-distance gallery over consecutive customer-name pairs: "
        "Levenshtein edit distance, character-bigram Jaccard, and a prefix "
        "agreement flag — the record-linkage scoring primitives"
    ),
)
def scalar_distance_gallery(spark, sf_dir):
    """Distance scoring on an equi-joined pair stream (key+1 self-join —
    blocking comes from elsewhere: LSH buckets, sorted neighborhoods); every
    expression is a built-in, the whole gallery stays in codegen."""
    c = load(spark, sf_dir, "customer")
    a = c.select(F.col("c_custkey").alias("k"), F.lower("c_name").alias("na"))
    b = c.select(
        (F.col("c_custkey") - 1).alias("k2"), F.lower("c_name").alias("nb")
    )
    pairs = a.join(b, F.col("k2") == F.col("k"))

    def bigrams(s):
        grams = F.transform(
            F.sequence(F.lit(1), F.length(s) - 1),
            lambda i: F.substring(s, i, F.lit(2)),
        )
        # length <= 1: Spark's sequence(1, 0) DESCENDS ([1, 0], yielding a
        # phantom bigram) while DuckDB's range(1, 1) is empty — guard so
        # both engines agree on zero bigrams for degenerate names
        return F.array_distinct(
            F.when(F.length(s) >= 2, grams).otherwise(
                F.array().cast("array<string>")
            )
        )

    g = pairs.select(
        "k",
        "na",
        "nb",
        F.levenshtein("na", "nb").cast("bigint").alias("lev"),
        bigrams(F.col("na")).alias("ba"),
        bigrams(F.col("nb")).alias("bb"),
    )
    common = F.size(F.array_intersect("ba", "bb")).cast("bigint")
    union = (F.size("ba") + F.size("bb")).cast("bigint") - common
    return g.select(
        "k",
        "na",
        "nb",
        "lev",
        common.alias("bigram_common"),
        union.alias("bigram_union"),
        (common.cast("double") / union.cast("double")).alias("bigram_jaccard"),
        (F.substring("na", 1, 3) == F.substring("nb", 1, 3)).alias("same_prefix3"),
    )
