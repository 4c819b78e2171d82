"""Hybrid retrieval over the test corpus: BM25 shortlist → embedding
re-rank → near-duplicate suppression — the serving-side counterpart of the
training-data pipeline (same operators, query-time composition).

    python examples/retrieval_pipeline.py [sf_dir]

Stages (each prints its wall time):
  1. bm25_scores        lexical shortlist (top-50 for the query terms)
  2. brute_force_topk   cosine re-rank of the shortlist against the mean
                        embedding of the top-3 lexical hits (pseudo-
                        relevance feedback — the fixture has no query
                        embeddings, so the query vector is built from the
                        lexical consensus, a standard PRF trick)
  3. doc_fingerprint    drop near-identical docs from the final ranking
                        (content_fp collision = same normalized text)

At 100 TB: stage 1 is the inverted-index/bm25 path (explode + broadcast
stats), stage 2 scans only the 50-row shortlist joined to its embeddings,
stage 3 fingerprints 50 rows. Nothing outside stage 1 touches the corpus.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.operators.textan import bm25_scores, doc_fingerprint
from data_etl_with_dbt_spark.operators.similarity import brute_force_topk
from data_etl_with_dbt_spark.sources.io import read_parquet

QUERY_TERMS = ["hash", "merge", "vector"]


def main(sf_dir: str = "/root/testdata/sf0.01") -> None:
    spark = get_spark("retrieval-example")
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")

    t0 = time.time()
    shortlist = bm25_scores(
        docs, "doc_id", "text", QUERY_TERMS, limit=50,
        spread_partitions=spark.sparkContext.defaultParallelism,
    ).localCheckpoint(eager=True)  # two consumers below; one corpus pass
    print(f"1. bm25 shortlist: {shortlist.count()} docs  ({time.time()-t0:.2f}s)")

    t0 = time.time()
    # pseudo-relevance feedback: query vector = mean embedding of top-3 hits
    top3 = shortlist.orderBy(F.col("bm25").desc(), "doc_id").limit(3)
    # collect_list's merge order across shuffle partitions is NOT the sort
    # order — an orderBy before a global agg guarantees nothing. Sort the
    # (index, value) structs INSIDE the aggregate (the repo convention) so
    # the query vector's dimensions can never come out permuted.
    seed = (
        top3.join(emb, top3.doc_id == emb.vec_id)
        .select(F.posexplode("embedding").alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("x"))
        .agg(
            F.array_sort(F.collect_list(F.struct("i", "x"))).alias("__pairs")
        )
        .select(
            F.lit(0).alias("query_id"),
            F.transform(F.col("__pairs"), lambda p: p["x"])
            .cast("array<float>")
            .alias("embedding"),
        )
    )
    candidates = shortlist.join(emb, shortlist.doc_id == emb.vec_id).select(
        "vec_id", "embedding"
    )
    reranked = brute_force_topk(candidates, seed, k=20).join(
        shortlist, F.col("vec_id") == F.col("doc_id")
    )
    reranked = reranked.select("doc_id", "bm25", "cosine").localCheckpoint(eager=True)
    print(f"2. embedding re-rank: {reranked.count()} docs  ({time.time()-t0:.2f}s)")

    t0 = time.time()
    fps = doc_fingerprint(docs.join(reranked.select("doc_id"), "doc_id"), "doc_id", "text")
    final = (
        reranked.join(fps, "doc_id")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("content_fp").orderBy(
                    F.col("cosine").desc(), "doc_id"
                )
            ),
        )
        .where(F.col("rn") == 1)
        .orderBy(F.col("cosine").desc(), "doc_id")
        .select("doc_id", "bm25", "cosine")
    )
    rows = final.collect()
    print(f"3. dedup + final: {len(rows)} docs  ({time.time()-t0:.2f}s)")
    for r in rows[:10]:
        print(f"   doc {r.doc_id:>6}  bm25={r.bm25:7.3f}  cos={r.cosine:6.3f}")
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:])
