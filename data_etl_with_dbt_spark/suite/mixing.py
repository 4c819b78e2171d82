"""Corpus-mixing / data-selection operators: DSIR-style hashed-n-gram
importance weights, tokenizer fertility statistics, and curriculum
scheduling. These complement ``suite/corpus.py`` (quota caps, mixture
sampling, splits) with the *selection* half of a pretraining data pipeline:
score documents against a target distribution, measure tokenizer cost per
language, and order the training stream.

Scale shapes: each entry is one token-explode pass (the only corpus-sized
stage) followed by feature-bucket- or language-sized aggregates; the
importance join broadcasts a 64-row bucket table back onto the per-doc
term frame.

Determinism: md5-hex-parse feature hashing (the repo's md5→uniform bridge —
``CAST('0x'||hex AS BIGINT)`` in DuckDB, ``conv(hex,16,10)`` in Spark);
ln() ratios quantized per (doc, bucket) term on the DECIMAL(18,6) grid
before the per-doc sum; fractional literals spelled CAST(x AS DOUBLE) in
the oracle (DuckDB decimal-literal rule)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.suite.registry import big, dec6, dsum, load, query

_N_BUCKETS = 64


@query(
    "dsir_importance_weights",
    oracle="""
    WITH toks AS (
        SELECT doc_id, lang,
               CAST('0x' || substr(md5(unnest(regexp_extract_all(lower(text), '[a-z]+'))), 1, 8) AS BIGINT) % 64 AS b
        FROM documents
    ),
    tf AS (
        SELECT doc_id, b, CAST(count(*) AS BIGINT) AS tf FROM toks GROUP BY doc_id, b
    ),
    raw AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c_r FROM toks GROUP BY b
    ),
    tgt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS c_t FROM toks WHERE lang = 'en' GROUP BY b
    ),
    totals AS (
        SELECT (SELECT CAST(SUM(c_r) AS BIGINT) FROM raw) AS t_r,
               (SELECT CAST(SUM(c_t) AS BIGINT) FROM tgt) AS t_t
    ),
    ratio AS (
        SELECT raw.b,
               ln(((CAST(coalesce(tgt.c_t, 0) AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(t_t AS DOUBLE) + CAST(32 AS DOUBLE)))
                  / ((CAST(raw.c_r AS DOUBLE) + CAST(0.5 AS DOUBLE))
                     / (CAST(t_r AS DOUBLE) + CAST(32 AS DOUBLE)))) AS lnr
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN totals
    )
    SELECT tf.doc_id,
           CAST(SUM(CAST(CAST(tf.tf AS DOUBLE) * ratio.lnr AS DECIMAL(18,6))) AS DOUBLE) AS log_importance,
           CAST(SUM(tf.tf) AS BIGINT) AS n_tokens
    FROM tf JOIN ratio ON tf.b = ratio.b
    GROUP BY tf.doc_id
    ORDER BY log_importance DESC, doc_id
    LIMIT 30
    """,
    description=(
        "DSIR-style data selection: hashed-unigram (64-bucket) log importance "
        "weight of each document against the lang='en' target distribution, "
        "add-0.5 smoothed; top-30 most target-like documents"
    ),
)
def dsir_importance_weights(spark, sf_dir):
    """Importance resampling weights (hashed n-gram DSIR): one token explode,
    two 64-row distribution aggs (map-side combined), a broadcast ratio join
    back onto the per-(doc, bucket) term frame, one per-doc sum. Nothing
    scales with corpus size except the explode and the doc-keyed agg."""
    docs = load(spark, sf_dir, "documents")
    # fixture parquet is single-row-group (unsplittable): spread the explode
    docs = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    terms = docs.select(
        "doc_id",
        "lang",
        F.explode(F.regexp_extract_all(F.lower("text"), F.lit("[a-z]+"), 0)).alias("term"),
    )
    toks = terms.select(
        "doc_id",
        "lang",
        (
            F.conv(F.substring(F.md5("term"), 1, 8), 16, 10).cast("bigint") % _N_BUCKETS
        ).alias("b"),
    )
    # ONE corpus pass: the (doc, lang, bucket) term frame is the only
    # explode-sized aggregation; raw/target distributions roll up from it
    # (conditional sum) instead of re-running the explode per
    # distribution, and the small frames are lineage-cut because each
    # feeds two consumers (no cross-consumer CSE)
    tf2 = (
        toks.groupBy("doc_id", "lang", "b")
        .agg(big(F.count(F.lit(1))).alias("tf"))
        .transform(materialize)
    )
    tf = tf2.select("doc_id", "b", "tf")
    dist = (
        tf2.groupBy("b")
        .agg(
            big(F.sum("tf")).alias("c_r"),
            big(
                F.coalesce(
                    F.sum(F.when(F.col("lang") == "en", F.col("tf"))), F.lit(0)
                )
            ).alias("c_t"),
        )
        .transform(materialize)
    )
    totals = dist.agg(
        big(F.sum("c_r")).alias("t_r"), big(F.sum("c_t")).alias("t_t")
    )
    half = F.lit(0.5)
    smooth = F.lit(float(_N_BUCKETS) * 0.5)
    p_t = (F.col("c_t").cast("double") + half) / (
        F.col("t_t").cast("double") + smooth
    )
    p_r = (F.col("c_r").cast("double") + half) / (F.col("t_r").cast("double") + smooth)
    ratio = (
        dist.crossJoin(F.broadcast(totals))
        .select("b", F.log(p_t / p_r).alias("lnr"))
    )
    return (
        tf.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            dsum(F.col("tf").cast("double") * F.col("lnr")).alias("log_importance"),
            big(F.sum("tf")).alias("n_tokens"),
        )
        .orderBy(F.col("log_importance").desc(), "doc_id")
        .limit(30)
    )


@query(
    "tokenizer_fertility_stats",
    oracle=r"""
    WITH per_doc AS (
        SELECT lang,
               CAST(length(text) AS BIGINT) AS chars,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS ws,
               CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS BIGINT) AS bpe
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS total_chars,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe) AS BIGINT) AS bpe_ish_tokens,
           CAST(SUM(chars) AS DOUBLE) / CAST(SUM(bpe) AS DOUBLE) AS chars_per_token,
           CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE) AS fertility
    FROM per_doc
    GROUP BY lang
    """,
    description=(
        "Tokenizer fertility per language: chars per token and subword-per-"
        "word ratio of the BPE-ish tokenizer vs whitespace words — the "
        "tokenizer-budget planning stats for a multilingual corpus"
    ),
)
def tokenizer_fertility_stats(spark, sf_dir):
    """Fertility (subwords per word) and compression (chars per token) by
    language — one scan, one language-sized agg; the standard check that a
    tokenizer doesn't tax some languages with more tokens per word."""
    # shared tokenizer expressions: an inline copy drifted-by-one-edit
    # would silently diverge this query's counts from token_counting and
    # every other suite entry built on the same helpers
    from data_etl_with_dbt_spark.operators.textan import (
        BPE_ISH_PATTERN,
        tokens_expr,
    )

    docs = load(spark, sf_dir, "documents")
    ws = F.size(tokens_expr(F.col("text"))).cast("bigint")
    bpe = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), 0)
    ).cast("bigint")
    per_doc = docs.select(
        "lang",
        F.length("text").cast("bigint").alias("chars"),
        ws.alias("ws"),
        bpe.alias("bpe"),
    )
    return per_doc.groupBy("lang").agg(
        big(F.count(F.lit(1))).alias("n_docs"),
        big(F.sum("chars")).alias("total_chars"),
        big(F.sum("ws")).alias("ws_tokens"),
        big(F.sum("bpe")).alias("bpe_ish_tokens"),
        (F.sum("chars").cast("double") / F.sum("bpe").cast("double")).alias(
            "chars_per_token"
        ),
        # RAW doubles: integer-exact sums divided once are bit-identical
        # cross-engine; quantizing adds only the .5e-6 boundary failure
        # mode (the round-9 user_gap_stats lesson)
        (F.sum("bpe").cast("double") / F.sum("ws").cast("double")).alias("fertility"),
    )


@query(
    "curriculum_schedule_documents",
    oracle="""
    WITH bucketed AS (
        SELECT doc_id, lang, n_chars,
               CAST(ntile(5) OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS difficulty_bucket
        FROM documents
    )
    SELECT doc_id, lang, n_chars, difficulty_bucket,
           CAST(row_number() OVER (
               ORDER BY difficulty_bucket, md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS schedule_pos
    FROM bucketed
    """,
    description=(
        "Curriculum schedule: quintile difficulty buckets by document length, "
        "deterministic md5 shuffle within each bucket — easy-to-hard training "
        "order, stable across engines and reruns (no RNG)"
    ),
)
def curriculum_schedule_documents(spark, sf_dir):
    """Curriculum-learning order: short (easy) documents first, hash-shuffled
    inside each difficulty bucket. The fixture-sized global windows would be
    a range-partitioned sort + partition-offset pass at 100 TB (the
    global_row_index recipe); the md5 shuffle key keeps the order
    deterministic without RNG."""
    docs = load(spark, sf_dir, "documents")
    w_bucket = Window.partitionBy().orderBy("n_chars", "doc_id")
    bucketed = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.ntile(5).over(w_bucket).cast("bigint").alias("difficulty_bucket"),
    )
    w_pos = Window.partitionBy().orderBy(
        "difficulty_bucket", F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return bucketed.select(
        "doc_id",
        "lang",
        "n_chars",
        "difficulty_bucket",
        F.row_number().over(w_pos).cast("bigint").alias("schedule_pos"),
    )
