"""Feature-engineering surface for training-data pipelines: per-group
winsorization (outlier clipping at data-valued percentiles), min-max
normalization, and stratified sampling.

Determinism notes:
* winsorization bounds use ``percentile_disc`` — an ACTUAL data value, not
  an interpolation, so both engines pick the identical double and the
  clip results match bit-for-bit;
* min-max normalization is per-row arithmetic over exact group min/max —
  IEEE-identical when the expression trees match;
* stratified sampling is seeded Bernoulli per stratum — deterministic
  within Spark, engine-specific by nature, so it ships rows-only with a
  property test on rate/stratum fidelity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import big, dsum, load, query

# ---------------------------------------------------------------------------
# Winsorization: clip a measure at per-group p05/p95 data values.
# ---------------------------------------------------------------------------

@query(
    "winsorize_extendedprice",
    oracle="""
    WITH bounds AS (
        SELECT l_returnflag AS flag,
               quantile_disc(l_extendedprice, 0.05) AS lo,
               quantile_disc(l_extendedprice, 0.95) AS hi
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT
        l_returnflag,
        CAST(SUM(CAST(least(greatest(l_extendedprice, lo), hi) AS DECIMAL(18,6))) AS DOUBLE) AS sum_clipped,
        CAST(SUM(CASE WHEN l_extendedprice < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        CAST(SUM(CASE WHEN l_extendedprice > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    JOIN bounds ON l_returnflag = flag
    GROUP BY l_returnflag
    """,
    description="Per-group winsorization at p05/p95 data values (percentile_disc -> broadcast bounds -> clip)",
)
def winsorize_extendedprice(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    bounds = li.groupBy(F.col("l_returnflag").alias("flag")).agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP (ORDER BY l_extendedprice)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY l_extendedprice)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi"))
    return (
        li.join(F.broadcast(bounds), li.l_returnflag == F.col("flag"))
        .groupBy("l_returnflag")
        .agg(
            dsum(clipped).alias("sum_clipped"),
            big(F.sum(F.when(F.col("l_extendedprice") < F.col("lo"), 1).otherwise(0))).alias(
                "n_clipped_low"
            ),
            big(F.sum(F.when(F.col("l_extendedprice") > F.col("hi"), 1).otherwise(0))).alias(
                "n_clipped_high"
            ),
            big(F.count(F.lit(1))).alias("n"),
        )
    )


# ---------------------------------------------------------------------------
# Min-max normalization per group.
# ---------------------------------------------------------------------------

@query(
    "minmax_normalize_events",
    oracle="""
    WITH ranges AS (
        SELECT user_id AS u, min(value) AS vmin, max(value) AS vmax
        FROM events GROUP BY user_id
    )
    SELECT
        event_id,
        user_id,
        CASE WHEN vmax = vmin THEN CAST(0.5 AS DOUBLE)
             ELSE (value - vmin) / (vmax - vmin) END AS value_norm
    FROM events
    JOIN ranges ON user_id = u
    """,
    description="Per-user min-max normalization (exact group min/max broadcast back; constant groups pin to 0.5)",
)
def minmax_normalize_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ranges = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.min("value").alias("vmin"), F.max("value").alias("vmax")
    )
    norm = F.when(F.col("vmax") == F.col("vmin"), F.lit(0.5).cast("double")).otherwise(
        (F.col("value") - F.col("vmin")) / (F.col("vmax") - F.col("vmin"))
    )
    return (
        ev.join(ranges, ev.user_id == F.col("u"))
        .select("event_id", "user_id", norm.alias("value_norm"))
    )


# ---------------------------------------------------------------------------
# Stratified sampling. Per-stratum rates via key-hash thresholding (the
# hash_split_assignment convention) instead of seeded Bernoulli: md5 of
# (lang, doc_id) is uniform and identical in every engine, so membership is
# stable under reruns, repartitioning, AND engine swaps — which also makes
# the sample itself oracle-checkable, not just its rate. Thresholds are on
# the first 4 hex chars (uniform over 2^16): en 0.5 → '8000', 0.25 → '4000',
# zh 0.1 → '1999'.
# ---------------------------------------------------------------------------

@query(
    "stratified_sample_documents",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source
    FROM documents
    WHERE substr(md5(lang || ':' || CAST(doc_id AS VARCHAR)), 1, 4) <
          CASE lang
              WHEN 'en' THEN '8000'
              WHEN 'es' THEN '4000'
              WHEN 'fr' THEN '4000'
              WHEN 'de' THEN '4000'
              WHEN 'zh' THEN '1999'
              ELSE '0000'
          END
    """,
    description=(
        "Deterministic stratified sample by language: per-stratum rates as "
        "md5 key-hash thresholds (no RNG) — exact membership reproducible "
        "across engines and oracle-checked"
    ),
)
def stratified_sample_documents(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(
        F.md5(F.concat_ws(":", F.col("lang"), F.col("doc_id").cast("string"))), 1, 4
    )
    threshold = (
        F.when(F.col("lang") == "en", "8000")
        .when(F.col("lang").isin("es", "fr", "de"), "4000")
        .when(F.col("lang") == "zh", "1999")
        .otherwise("0000")
    )
    return docs.where(bucket < threshold).select(
        big(F.col("doc_id")).alias("doc_id"), "lang", "source"
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement: sequential Poisson sampling
# (Ohlsson 1998's order-sampling scheme, the πps workhorse in official
# statistics). Each row draws a uniform u and is ranked by key = u / w;
# the k smallest keys form a sample whose inclusion probability is
# approximately proportional to w. u comes from md5 (first 6 hex digits /
# 2^24) instead of an RNG, so the draw is a pure per-row expression:
# reproducible across reruns, repartitioning, and ENGINES — key = u / w is
# one exact hex-int expansion followed by two IEEE divisions, bit-identical
# in Spark and DuckDB, which makes the sample membership itself
# oracle-checkable. At 100 TB this is a scan + TakeOrderedAndProject
# (per-partition top-k, k rows to the driver) — no global sort, no RNG
# state, no second pass.
# ---------------------------------------------------------------------------

@query(
    "weighted_sample_documents",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           lang,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(CAST('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 6) AS BIGINT) AS DOUBLE)
               / 16777216.0 / CAST(n_chars AS DOUBLE) AS sample_key
    FROM documents
    ORDER BY sample_key, doc_id
    LIMIT 100
    """,
    description=(
        "Length-weighted sample of 100 docs via sequential Poisson sampling "
        "(key = md5-uniform / weight, top-k smallest): deterministic "
        "probability-proportional-to-size sampling with no RNG state"
    ),
)
def weighted_sample_documents(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 6),
        16,
        10,
    ).cast("bigint")
    key = u.cast("double") / F.lit(16777216.0) / F.col("n_chars").cast("double")
    return (
        docs.select(
            big(F.col("doc_id")).alias("doc_id"),
            "lang",
            big(F.col("n_chars")).alias("n_chars"),
            key.alias("sample_key"),
        )
        .orderBy("sample_key", "doc_id")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# Sequence packing: assign documents to fixed-token-budget training sequences
# by cumulative offset (greedy contiguous packing; straddling docs split at
# the boundary downstream). Packing is per-source so the window is
# partition-scoped — at corpus scale you pack within (source, shard) and no
# global sort ever happens.
# ---------------------------------------------------------------------------

@query(
    "sequence_packing",
    oracle="""
    WITH toks AS (
        SELECT doc_id, source,
               len(list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '')) AS n_tokens
        FROM documents
    ),
    offs AS (
        SELECT doc_id, source, n_tokens,
               sum(n_tokens) OVER (
                   PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS off
        FROM toks
    )
    SELECT doc_id, source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(off // 2048 AS BIGINT) AS seq_id,
           CAST(off % 2048 AS BIGINT) AS offset_in_seq
    FROM offs
    """,
    description=(
        "Greedy contiguous sequence packing into 2048-token training rows "
        "(per-source cumulative offsets; pure integer math, one key-shuffle)"
    ),
)
def sequence_packing(spark, sf_dir):
    from pyspark.sql import Window

    from data_etl_with_dbt_spark.operators.textan import tokens_expr

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.size(tokens_expr(F.col("text"))).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offs = toks.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
    return offs.select(
        "doc_id",
        "source",
        big(F.col("n_tokens")).alias("n_tokens"),
        big(F.expr("off DIV 2048")).alias("seq_id"),
        big(F.col("off") % 2048).alias("offset_in_seq"),
    )


# ---------------------------------------------------------------------------
# Robust scaling: (value - median) / IQR per group — the outlier-resistant
# normalization (sklearn's RobustScaler) complementing min-max. All three
# anchors are percentile_disc DATA VALUES, so both engines pick identical
# doubles and the per-row arithmetic is IEEE-identical; constant-IQR groups
# pin to 0.0 rather than dividing by zero.
# ---------------------------------------------------------------------------

@query(
    "robust_scale_events",
    oracle="""
    WITH anchors AS (
        SELECT event_type AS et,
               quantile_disc(value, 0.25) AS p25,
               quantile_disc(value, 0.50) AS med,
               quantile_disc(value, 0.75) AS p75
        FROM events GROUP BY event_type
    )
    SELECT event_id,
           event_type,
           CASE WHEN p75 = p25 THEN CAST(0.0 AS DOUBLE)
                ELSE (value - med) / (p75 - p25) END AS value_scaled
    FROM events
    JOIN anchors ON event_type = et
    """,
    description=(
        "Per-type robust scaling (value - median) / IQR from "
        "percentile_disc data values — outlier-resistant normalization, "
        "anchors broadcast back, one key shuffle total"
    ),
)
def robust_scale_events(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    anchors = ev.groupBy(F.col("event_type").alias("et")).agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").alias("p25"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY value)").alias("med"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").alias("p75"),
    )
    scaled = F.when(F.col("p75") == F.col("p25"), F.lit(0.0).cast("double")).otherwise(
        (F.col("value") - F.col("med")) / (F.col("p75") - F.col("p25"))
    )
    return ev.join(F.broadcast(anchors), ev.event_type == F.col("et")).select(
        "event_id", "event_type", scaled.alias("value_scaled")
    )


# ---------------------------------------------------------------------------
# Quantile normalization: map each value to its percent_rank within its
# group — the rank-based transform that makes any two distributions
# comparable (batch-effect correction, cross-source score calibration).
# percent_rank = (rank - 1) / (n - 1) has identical positional semantics in
# both engines under a total order; ties share a rank in both.
# ---------------------------------------------------------------------------

@query(
    "quantile_normalize_events",
    oracle="""
    SELECT event_id,
           event_type,
           percent_rank() OVER (PARTITION BY event_type ORDER BY value) AS value_qn
    FROM events
    """,
    description=(
        "Per-type quantile normalization via percent_rank — rank-based "
        "cross-distribution calibration, one key shuffle"
    ),
)
def quantile_normalize_events(spark, sf_dir):
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value")
    return ev.select(
        "event_id", "event_type", F.percent_rank().over(w).alias("value_qn")
    )
