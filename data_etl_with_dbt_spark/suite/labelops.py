"""Label/annotation aggregation + corpus-distribution operators.

The RLHF/eval side of a training-data pipeline: collapsing redundant human
labels into gold labels (majority vote), quantifying rater reliability
(Fleiss-style chance-corrected agreement), measuring distribution shift
between corpus slices (per-source KL divergence over unigrams), and mining
hard negatives for contrastive training (nearest different-label embedding).

The fixtures carry no annotation table, so annotations are DERIVED
deterministically from ``events``: item = ``event_id DIV 10`` (ten
consecutive events form one item), annotator = ``user_id``, label =
``event_type``. The derivation is spelled identically in both engines, so
every query here is fully oracle-checked.

Determinism notes (see registry docstring):
* vote counts and totals are BIGINT on both sides;
* ``agreement = n_winner / n_votes`` is one int→double conversion + one IEEE
  division — bit-identical;
* ``ln`` outputs are dec6-quantized per row BEFORE any sum (the zipf/tfidf
  convention — absorbs potential libm ulp skew), and tiny per-term KL
  contributions are summed exactly via the scaled-decimal trick
  (``term * 1e6 → DECIMAL(18,6) → exact SUM → /1e6``);
* averages over items go through ``davg``; the final kappa is computed from
  already-quantized scalars so the arithmetic is IEEE-identical.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize

from data_etl_with_dbt_spark.operators.similarity import dot, norm
from data_etl_with_dbt_spark.suite.registry import big, davg, dec6, load, query

# ---------------------------------------------------------------------------
# Majority-vote label aggregation.
# ---------------------------------------------------------------------------

@query(
    "majority_label_vote",
    oracle="""
    WITH votes AS (
        SELECT event_id // 10 AS item_id, event_type AS label FROM events
    ),
    counts AS (
        SELECT item_id, label, count(*) AS cnt FROM votes GROUP BY item_id, label
    ),
    ranked AS (
        SELECT item_id, label, cnt,
               row_number() OVER (PARTITION BY item_id ORDER BY cnt DESC, label) AS rn,
               sum(cnt)  OVER (PARTITION BY item_id) AS n_votes,
               count(*)  OVER (PARTITION BY item_id) AS n_labels
        FROM counts
    )
    SELECT CAST(item_id AS BIGINT) AS item_id,
           label AS winner_label,
           CAST(cnt AS BIGINT) AS n_winner,
           CAST(n_votes AS BIGINT) AS n_votes,
           CAST(n_labels AS BIGINT) AS n_labels,
           CAST(cnt AS DOUBLE) / CAST(n_votes AS DOUBLE) AS agreement
    FROM ranked WHERE rn = 1
    """,
    description=(
        "Majority-vote gold-label aggregation over derived annotations "
        "(ties broken to the lexicographically smallest label; per-item "
        "agreement ratio) — the redundant-labeling collapse step of an "
        "RLHF/eval data pipeline"
    ),
)
def majority_label_vote(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    votes = ev.select(
        F.expr("event_id DIV 10").alias("item_id"), F.col("event_type").alias("label")
    )
    counts = votes.groupBy("item_id", "label").agg(F.count(F.lit(1)).alias("cnt"))
    # One window pass covers rank + totals: partitionBy(item_id) is a subset
    # of the groupBy keys, so Catalyst inserts exactly one exchange on
    # item_id after the partial/final count agg — two shuffles total, both
    # on uniform integer keys. At 100 TB votes-per-item is bounded (tens),
    # so no skew and no single-partition stage.
    w = Window.partitionBy("item_id")
    ranked = counts.select(
        "item_id",
        "label",
        "cnt",
        F.row_number().over(w.orderBy(F.desc("cnt"), F.asc("label"))).alias("rn"),
        F.sum("cnt").over(w).alias("n_votes"),
        F.count(F.lit(1)).over(w).alias("n_labels"),
    )
    return ranked.where(F.col("rn") == 1).select(
        big(F.col("item_id")).alias("item_id"),
        F.col("label").alias("winner_label"),
        big(F.col("cnt")).alias("n_winner"),
        big(F.col("n_votes")).alias("n_votes"),
        big(F.col("n_labels")).alias("n_labels"),
        (F.col("cnt").cast("double") / F.col("n_votes").cast("double")).alias("agreement"),
    )


# ---------------------------------------------------------------------------
# Fleiss-style chance-corrected inter-annotator agreement (one-row summary).
# ---------------------------------------------------------------------------

@query(
    "annotator_agreement",
    oracle="""
    WITH votes AS (
        SELECT event_id // 10 AS item_id, event_type AS label FROM events
    ),
    counts AS (
        SELECT item_id, label, count(*) AS cnt FROM votes GROUP BY item_id, label
    ),
    items AS (
        SELECT item_id, sum(cnt) AS n_i, sum(cnt * cnt) AS s2
        FROM counts GROUP BY item_id HAVING sum(cnt) >= 2
    ),
    obs AS (
        SELECT CAST(count(*) AS BIGINT) AS n_items,
               CAST(CAST(AVG(CAST(s2 - n_i AS DOUBLE) / CAST(n_i * (n_i - 1) AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE) AS p_obs
        FROM items
    ),
    cats AS (
        SELECT label, sum(cnt) AS c FROM counts GROUP BY label
    ),
    tot AS (SELECT sum(c) AS t FROM cats),
    expd AS (
        SELECT CAST(count(*) AS BIGINT) AS n_categories,
               CAST(CAST(SUM((CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * (CAST(c AS DOUBLE) / CAST(t AS DOUBLE))) AS DECIMAL(38,6)) AS DOUBLE) AS p_exp
        FROM cats CROSS JOIN tot
    )
    SELECT n_items, n_categories, p_obs, p_exp,
           (p_obs - p_exp) / (1.0 - p_exp) AS kappa
    FROM obs CROSS JOIN expd
    """,
    description=(
        "Fleiss-style chance-corrected agreement over derived annotations: "
        "per-item pairwise observed agreement averaged corpus-wide, chance "
        "agreement from category marginals, kappa = (Po-Pe)/(1-Pe) — rater "
        "reliability for label QA"
    ),
)
def annotator_agreement(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    votes = ev.select(
        F.expr("event_id DIV 10").alias("item_id"), F.col("event_type").alias("label")
    )
    # counts feeds BOTH the per-item and the per-category aggregates;
    # Catalyst does not CSE shared subtrees across consumers, so cut the
    # lineage once — the (item, label) table is tiny relative to events.
    counts = (
        votes.groupBy("item_id", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .transform(materialize)
    )
    items = (
        counts.groupBy("item_id")
        .agg(F.sum("cnt").alias("n_i"), F.sum(F.col("cnt") * F.col("cnt")).alias("s2"))
        .where(F.col("n_i") >= 2)
    )
    p_i = (F.col("s2") - F.col("n_i")).cast("double") / (
        F.col("n_i") * (F.col("n_i") - 1)
    ).cast("double")
    obs = items.agg(
        big(F.count(F.lit(1))).alias("n_items"), davg(p_i).alias("p_obs")
    )
    cats = counts.groupBy("label").agg(F.sum("cnt").alias("c"))
    tot = cats.agg(F.sum("c").alias("t"))
    p_c = F.col("c").cast("double") / F.col("t").cast("double")
    exp = (
        cats.crossJoin(F.broadcast(tot))
        .agg(big(F.count(F.lit(1))).alias("n_categories"), dec6(F.sum(p_c * p_c)).alias("p_exp"))
    )
    return (
        obs.crossJoin(F.broadcast(exp))
        .select(
            "n_items",
            "n_categories",
            "p_obs",
            "p_exp",
            ((F.col("p_obs") - F.col("p_exp")) / (F.lit(1.0) - F.col("p_exp"))).alias("kappa"),
        )
    )


# ---------------------------------------------------------------------------
# Per-source KL divergence vs the corpus unigram distribution.
# ---------------------------------------------------------------------------

@query(
    "kl_divergence_sources",
    oracle="""
    WITH toks AS (
        SELECT source,
               unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS w
        FROM documents
    ),
    sw AS (SELECT source, w, count(*) AS c FROM toks GROUP BY source, w),
    s  AS (SELECT source, sum(c) AS n_s FROM sw GROUP BY source),
    wt AS (SELECT w, sum(c) AS c_w FROM sw GROUP BY w),
    t  AS (SELECT sum(c) AS n FROM sw)
    SELECT source,
           CAST(n_s AS BIGINT) AS n_tokens,
           CAST(count(*) AS BIGINT) AS n_words,
           CAST(SUM(CAST(
               (CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE))
               * CAST(CAST(ln(
                     (CAST(c AS DOUBLE) / CAST(n_s AS DOUBLE))
                     / (CAST(c_w AS DOUBLE) / CAST(n AS DOUBLE))
                 ) AS DECIMAL(38,6)) AS DOUBLE)
               * 1000000.0
           AS DECIMAL(18,6))) AS DOUBLE) / 1000000.0 AS kl_nats
    FROM sw JOIN s USING (source) JOIN wt USING (w) CROSS JOIN t
    GROUP BY source, n_s
    """,
    description=(
        "Per-source KL divergence of the unigram distribution vs the whole "
        "corpus (distribution-shift scoring between corpus slices; ln "
        "dec6-quantized per term, contributions summed exactly via scaled "
        "decimals)"
    ),
)
def kl_divergence_sources(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.textan import tokens_expr

    docs = load(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens_expr(F.col("text"))).alias("w")
    )
    # sw feeds four consumers (per-source totals, per-word totals, the grand
    # total, and the scored join) — checkpoint once so the tokenize+count
    # pass over the corpus runs exactly once. At 100 TB this is the
    # checkpoint-to-table between pipeline stages; sw is |vocab x sources|,
    # orders of magnitude smaller than the corpus.
    sw = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .transform(materialize)
    )
    s = sw.groupBy("source").agg(F.sum("c").alias("n_s"))
    wt = sw.groupBy("w").agg(F.sum("c").alias("c_w"))
    t = sw.agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n_s").cast("double")
    q = F.col("c_w").cast("double") / F.col("n").cast("double")
    term = p * dec6(F.log(p / q)) * F.lit(1000000.0)
    # s is per-source (broadcast), wt is |vocab| (broadcast at fixture scale;
    # at 100 TB vocab outgrows the broadcast budget — the join key w is
    # already the sw partitioning, so a shuffle join co-locates for free).
    scored = (
        sw.join(F.broadcast(s), "source")
        .join(wt, "w")
        .crossJoin(F.broadcast(t))
    )
    return (
        scored.groupBy("source", "n_s")
        .agg(
            big(F.count(F.lit(1))).alias("n_words"),
            (F.sum(term.cast("decimal(18,6)")).cast("double") / F.lit(1000000.0)).alias(
                "kl_nats"
            ),
        )
        .select("source", big(F.col("n_s")).alias("n_tokens"), "n_words", "kl_nats")
    )


# ---------------------------------------------------------------------------
# Hard-negative mining: nearest different-label embedding per probe.
# ---------------------------------------------------------------------------

@query(
    "hard_negative_mining",
    oracle="""
    WITH q AS (
        SELECT vec_id AS query_id, CAST(label AS BIGINT) AS qlabel,
               CAST(embedding AS DOUBLE[]) AS qvec
        FROM embeddings WHERE vec_id < 20
    ),
    scored AS (
        SELECT q.query_id, e.vec_id, CAST(e.label AS BIGINT) AS neg_label,
               list_dot_product(CAST(e.embedding AS DOUBLE[]), q.qvec)
                   / (sqrt(list_dot_product(CAST(e.embedding AS DOUBLE[]),
                                            CAST(e.embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(q.qvec, q.qvec))) AS cosine
        FROM embeddings e, q
        WHERE CAST(e.label AS BIGINT) <> q.qlabel
    )
    SELECT query_id, vec_id, neg_label,
           CAST(CAST(cosine AS DECIMAL(38,6)) AS DOUBLE) AS cosine
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
    description=(
        "Hard-negative mining for contrastive training: per probe vector, "
        "the single most-similar embedding with a DIFFERENT label (broadcast "
        "probes, one corpus scan, exact JVM cosine fold)"
    ),
)
def hard_negative_mining(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("bigint").alias("qlabel"),
        F.col("embedding").alias("__qvec"),
        norm(F.col("embedding")).alias("__qnorm"),
    )
    scored = (
        emb.withColumn("__cnorm", norm(F.col("embedding")))
        .crossJoin(F.broadcast(q))
        .where(F.col("label").cast("bigint") != F.col("qlabel"))
        .select(
            F.col("query_id"),
            F.col("vec_id"),
            F.col("label").cast("bigint").alias("neg_label"),
            # norms factored out of the per-pair fold — bit-identical
            # (same fold values, same dot/(na*nb) order; r11, see
            # operators.similarity.brute_force_topk)
            (
                dot(F.col("embedding"), F.col("__qvec"))
                / (F.col("__cnorm") * F.col("__qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("query_id", "vec_id", "neg_label", dec6(F.col("cosine")).alias("cosine"))
    )
