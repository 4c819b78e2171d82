"""Distributed topic modeling over the corpus — pyspark.ml LDA wired the
engine's way: JVM-side stages end to end, explicit seed, and
vocabulary-bounded state. (No summary stripping is needed here, unlike
ml/quality: CountVectorizer and the online-optimizer LocalLDAModel carry
no training summary, so nothing pins the training DataFrame.)

Why it belongs in a training-data pipeline: topic mixtures are the
standard corpus-composition diagnostic (what IS in this crawl?) and a
mixture-balancing input (sample by topic share the way `corpus_mixture_
sample` samples by declared domain — topics are the discovered domains).

Scale posture: CountVectorizer keeps an explicit vocabulary (needed to
READ the topics); ``vocab_size`` bounds it and ``min_df`` drops the long
tail, so the fit-time dictionary is bounded regardless of corpus size.
Online variational LDA (the default optimizer here) is one corpus pass per
iteration with topic state ∝ k x vocab — KBs of driver/broadcast state.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.clustering import LDA
from pyspark.ml.feature import CountVectorizer, RegexTokenizer
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_topics(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 5,
    vocab_size: int = 1 << 12,
    min_df: float = 2.0,
    max_iter: int = 20,
    seed: int = 42,
):
    """Fit a k-topic LDA: RegexTokenizer → CountVectorizer(bounded vocab)
    → LDA(online, seeded). Returns the fitted PipelineModel."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__tokens", pattern=r"\W+"
            ),
            CountVectorizer(
                inputCol="__tokens",
                outputCol="__tf",
                vocabSize=vocab_size,
                minDF=min_df,
            ),
            LDA(
                k=k,
                maxIter=max_iter,
                seed=seed,
                featuresCol="__tf",
                optimizer="online",
            ),
        ]
    )
    return pipe.fit(docs)


def describe_topics(model, top_n: int = 8) -> DataFrame:
    """Human-readable topics: ``(topic, terms: array<string>, weights)`` —
    the LDA stage's term INDICES resolved through the CountVectorizer
    vocabulary (broadcast-sized by construction)."""
    vocab = model.stages[1].vocabulary
    raw = model.stages[2].describeTopics(top_n)
    vmap = F.array(*[F.lit(w) for w in vocab])
    return raw.select(
        F.col("topic"),
        F.transform(
            "termIndices", lambda i: F.element_at(vmap, i + 1)
        ).alias("terms"),
        F.col("termWeights").alias("weights"),
    )


def doc_topics(
    model, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document topic mixture + dominant topic: one distributed
    transform; the mixture vector unpacks JVM-side (vector_to_array)."""
    from pyspark.ml.functions import vector_to_array

    # honor a text_col differing from the fit-time tokenizer inputCol
    expected = model.stages[0].getInputCol()
    if text_col != expected:
        docs = docs.withColumn(expected, F.col(text_col))
    out = model.transform(docs)
    dist = vector_to_array(F.col("topicDistribution"))
    return out.select(
        F.col(id_col),
        dist.alias("topic_mix"),
        F.expr(
            "array_position(topic_mix, array_max(topic_mix)) - 1"
        ).cast("int").alias("dominant_topic"),
    )


def topic_shares(assigned: DataFrame) -> DataFrame:
    """Corpus composition by dominant topic — the mixture-balancing input:
    ``(dominant_topic, n_docs, share)`` from one map-side-combined agg."""
    total = assigned.count()
    return (
        assigned.groupBy("dominant_topic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .withColumn(
            "share", F.col("n_docs").cast("double") / F.lit(float(total))
        )
        .orderBy("dominant_topic")
    )
