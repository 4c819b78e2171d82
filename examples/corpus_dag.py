"""The corpus pipeline AS a dbt-shaped model DAG — the two halves of this
engine composed: the reference's dbt workflow (sources → models → tests,
incremental materialization) orchestrating the LLM-corpus operators.

    source  documents          synthetic_docs generator (no storage)
    model   doc_quality        view — Gopher flags + perplexity proxy
    model   corpus_clean       INCREMENTAL (merge on doc_id) — quality cut,
                               exact dedup, boilerplate prune
    model   corpus_stats       table — per-source rollup of the clean corpus
    tests   not_null/unique doc_id on corpus_clean; positive n_docs

Run:  python examples/corpus_dag.py [rows] [workdir]

Run twice from the same workdir and the second run's corpus_clean is an
incremental MERGE (only new doc_ids land) — the dbt is_incremental shape
over a corpus-operator body.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.operators import dedup as D
from data_etl_with_dbt_spark.operators import textan as TA
from data_etl_with_dbt_spark.plans import dq
from data_etl_with_dbt_spark.plans.dag import ModelRegistry
from data_etl_with_dbt_spark.sources import register_synthetic_source


def build_registry(rows: int) -> ModelRegistry:
    reg = ModelRegistry()
    reg.add_source(
        "documents",
        lambda spark: spark.read.format("synthetic_docs")
        .option("rows", rows)
        .option("partitions", 16)
        .load(),
    )

    @reg.model(materialized="view")
    def doc_quality(ctx):
        docs = ctx.source("documents")
        flags = TA.gopher_quality_flags(
            docs, "doc_id", "text",
            min_words=10, max_words=100_000,
            min_mean_word_len=2.0, max_mean_word_len=7.0,
            max_dup_token_frac=0.95, min_distinct_stopwords=1,
        )
        ppl = TA.unigram_logprob_score(docs, "doc_id", "text")
        return flags.join(ppl.select("doc_id", "avg_neg_logprob"), "doc_id")

    @reg.model(
        materialized="incremental",
        unique_key="doc_id",
        incremental_strategy="merge",
        deps=["doc_quality"],
    )
    def corpus_clean(ctx):
        docs = ctx.source("documents")
        keep = ctx.ref("doc_quality").where(F.col("passes_gopher")).select("doc_id")
        clean = D.dedup_exact(docs.join(keep, "doc_id"), "doc_id", "text")
        bp = D.ngram_df_prune(clean, "doc_id", "text", span_tokens=5, min_df=3)
        return clean.join(
            bp.where(F.col("boilerplate_frac") < 0.5).select("doc_id"), "doc_id"
        )

    @reg.model(
        materialized="table",
        deps=["corpus_clean"],
        # dbt model contract: a drifting aggregation fails ITS build, not
        # every dashboard reading the table
        contract={"source": "string", "n_docs": "bigint", "total_chars": "bigint"},
    )
    def corpus_stats(ctx):
        return (
            ctx.ref("corpus_clean")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                F.sum("n_chars").cast("bigint").alias("total_chars"),
            )
        )

    @reg.model(materialized="table", deps=["corpus_clean"])
    def corpus_mixture(ctx):
        """Fractional-epoch mixture plan: per-source doc counts with the
        realized repeat factor under a 1.5x upweight of src0-src4 (md5-
        chosen extra copies — corpus_epoch_upsample's logic as a model).
        Independent of corpus_stats, so threads=2 runs both branches as
        concurrent Spark jobs (dbt threads parity)."""
        docs = ctx.ref("corpus_clean")
        bucket = F.substring(
            F.md5(F.concat(F.lit("ep:"), F.col("doc_id").cast("string"))), 1, 4
        )
        upweighted = F.col("source").isin("src0", "src1", "src2", "src3", "src4")
        reps = F.lit(1) + F.when(upweighted & (bucket < "8000"), 1).otherwise(0)
        return docs.groupBy("source").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(reps).cast("bigint").alias("n_training_copies"),
        )

    reg.add_test("corpus_clean", dq.not_null, "doc_id")
    reg.add_test("corpus_clean", dq.unique, "doc_id")
    reg.add_test("corpus_stats", dq.positive, "n_docs")
    reg.add_test("corpus_mixture", dq.positive, "n_training_copies")
    return reg


def main(rows: int, workdir: str) -> None:
    from pyspark.sql import SparkSession

    os.makedirs(workdir, exist_ok=True)
    os.chdir(workdir)  # saveAsTable writes spark-warehouse under cwd
    # only stop a session this script itself created — under pytest the
    # active session belongs to the test harness
    owns_session = SparkSession.getActiveSession() is None
    spark = get_spark("corpus_dag", master=os.environ.get("SPARK_MASTER", "local[*]"))
    register_synthetic_source(spark)
    reg = build_registry(rows)

    t0 = time.time()
    reg.run(spark, threads=2)  # corpus_stats + corpus_mixture dispatch concurrently
    n1 = spark.table("corpus_clean").count()
    print(f"run 1: {time.time() - t0:5.1f} s   corpus_clean={n1:,} docs")

    results = reg.test(spark)
    for r in results:
        print(f"test {r.model}.{r.column} [{r.test}] -> {'PASS' if r.passed else 'FAIL'}")
    assert all(r.passed for r in results)

    # second run: incremental MERGE — same inputs, so zero new doc_ids land
    t0 = time.time()
    reg.run(spark, threads=2)
    n2 = spark.table("corpus_clean").count()
    print(f"run 2: {time.time() - t0:5.1f} s   corpus_clean={n2:,} docs (idempotent rerun)")
    assert n1 == n2

    spark.table("corpus_stats").orderBy("source").show()
    spark.table("corpus_mixture").orderBy("source").show(5)
    print(f"manifest: {len(reg.manifest())} models")
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_dag"
    main(rows, workdir)
