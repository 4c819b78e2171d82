"""Learned document embeddings — pyspark.ml Word2Vec wired the engine's
way, producing a REAL ``(id, embedding: array<double>)`` relation the
similarity family (brute/LSH/IVF/PQ, semantic dedup, centroid outliers)
can consume in place of the fixtures' random vectors.

Why it belongs here: every embedding-keyed operator in this engine is
exercised on synthetic noise at fixture scale; this module closes the loop
from raw text to the embedding column those operators index. Word2Vec's
``transform`` averages word vectors per document — the classic cheap doc
embedding (fastText's sentence-vector recipe) — as one JVM transform.

Scale posture: model state is vocab × dim floats (bounded via
``min_count``), broadcast to executors; training is Spark's distributed
skip-gram; inference never leaves the JVM.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import RegexTokenizer, Word2Vec
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def train_doc_embeddings(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 32,
    min_count: int = 2,
    max_iter: int = 4,
    seed: int = 42,
):
    """Fit tokenizer + Word2Vec; returns the fitted PipelineModel."""
    pipe = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col, outputCol="__tokens", pattern=r"\W+"
            ),
            Word2Vec(
                inputCol="__tokens",
                outputCol="__vec",
                vectorSize=dim,
                minCount=min_count,
                maxIter=max_iter,
                seed=seed,
            ),
        ]
    )
    return pipe.fit(docs)


def embed_documents(
    model, docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """``(id_col, embedding: array<double>)`` — the schema every
    similarity operator in this engine expects. One distributed transform;
    the vector unpack is JVM-side (vector_to_array)."""
    from pyspark.ml.functions import vector_to_array

    # honor a text_col differing from the fit-time tokenizer inputCol
    expected = model.stages[0].getInputCol()
    if text_col != expected:
        docs = docs.withColumn(expected, F.col(text_col))
    return model.transform(docs).select(
        F.col(id_col),
        vector_to_array(F.col("__vec")).alias("embedding"),
    )
