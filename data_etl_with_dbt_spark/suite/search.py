"""Search-engine primitives over the documents corpus: BM25 ranking and an
inverted-index build. These are the retrieval half of a RAG / training-data
pipeline (the embedding half lives in ``operators/similarity.py``): at 100 TB
the token explode is the only corpus-sized stage, everything downstream is
vocabulary- or query-sized.

Cross-engine determinism (see registry docstring): tokenization is the same
``[a-z]+`` extraction both sides; BM25's ln() is libm (~1 ulp apart between
engines), so every per-term score is quantized on the DECIMAL(18,6) grid
BEFORE the per-doc sum — exact decimal addition is associative, so Spark's
hash-agg order vs DuckDB's cannot diverge. Fractional literals in the oracle
are spelled ``CAST(x AS DOUBLE)`` (DuckDB decimal-literal rule)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite.registry import load, query

# Fixed query terms for the oracle-checked ranking entry. Production use is
# parameterized (see operators/textan.py tokenizers); the suite pins terms so
# the DuckDB oracle is a closed expression.
_BM25_TERMS = ("hash", "merge", "vector")
_K1 = 1.2
_B = 0.75


@query(
    "bm25_top_docs",
    bench=True,
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
        FROM documents
    ),
    dl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ),
    corpus AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(SUM(dl) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS avgdl
        FROM dl
    ),
    tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE term IN ('hash', 'merge', 'vector')
        GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ),
    scored AS (
        SELECT tf.doc_id, tf.term,
               ln(((CAST(n_docs AS DOUBLE) - CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / (CAST(df.df AS DOUBLE) + CAST(0.5 AS DOUBLE))) + CAST(1 AS DOUBLE))
               * (CAST(tf.tf AS DOUBLE) * CAST({_K1 + 1.0!r} AS DOUBLE)
                  / (CAST(tf.tf AS DOUBLE)
                     + CAST({_K1!r} AS DOUBLE)
                       * (CAST({1.0 - _B!r} AS DOUBLE)
                          + CAST({_B!r} AS DOUBLE) * CAST(dl.dl AS DOUBLE) / avgdl)))
               AS term_score
        FROM tf
        JOIN df USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN corpus
    )
    SELECT doc_id,
           CAST(SUM(CAST(term_score AS DECIMAL(18,6))) AS DOUBLE) AS bm25,
           CAST(count(*) AS BIGINT) AS matched_terms
    FROM scored
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 20
    """,
    description=(
        "BM25 ranking of documents for a fixed 3-term query (k1=1.2, b=0.75): "
        "token explode -> doc lengths -> per-term idf*tf score on the decimal "
        "grid -> top-20"
    ),
)
def bm25_top_docs(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.textan import bm25_scores

    docs = load(spark, sf_dir, "documents")
    # fixture parquet is single-row-group (unsplittable): spread the explode
    return bm25_scores(
        docs, "doc_id", "text", list(_BM25_TERMS), k1=_K1, b=_B, limit=20,
        spread_partitions=spark.sparkContext.defaultParallelism,
    )


@query(
    "inverted_index_terms",
    oracle="""
    WITH tf AS (
        SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf
        FROM (
            SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS term
            FROM documents
        )
        GROUP BY term, doc_id
    )
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(SUM(tf) AS BIGINT) AS total_tf,
           array_to_string(list_sort(list(doc_id))[1:12], ',') AS postings_head
    FROM tf
    GROUP BY term
    ORDER BY df DESC, term
    LIMIT 50
    """,
    description=(
        "Inverted-index build: term -> document frequency, total term "
        "frequency, and the head of the sorted postings list (top-50 terms)"
    ),
)
def inverted_index_terms(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.textan import inverted_index

    docs = load(spark, sf_dir, "documents")
    # no spread here: one consumer of the explode, and the (term, doc) agg
    # re-shuffles anyway — measured slower with the extra corpus shuffle
    return (
        inverted_index(docs, "doc_id", "text", postings_cap=12)
        .orderBy(F.col("df").desc(), "term")
        .limit(50)
    )
