"""End-to-end LLM training-corpus pipeline — the engine's north-star
workload, chaining the corpus operators the way a production data pipeline
would run them nightly over a crawl increment:

    0a. crawl shim        residue-coded crawl dressing around the fixture
                          bodies (frontier URLs, unicode mess, junk lines,
                          script mixing) so every hygiene gate fires
    0b. hygiene gates     canonicalize_text -> FUSED hygiene_signals (URL
                          shape + script mix + C4 cleaning + RedPajama in
                          ONE scan), flags audited per source
    1. quality filter     text_stats + repetition filters (Gopher-style)
    2. model filter       hashed-feature logistic classifier, weak-labeled
                          from the heuristic score's extremes (CCNet recipe)
    3. exact dedup        content-digest keep-one
    4. boilerplate prune  n-gram document-frequency cut (RefinedWeb shape)
    5. span dedup         C4-style 10-token-span keep-first across corpus
    5b. substring cut     Lee-et-al. exact-substring regions deleted from
                          the surviving texts (cleaned body carried on)
    6. near dedup         MinHash + LSH banding, cluster to canonical docs
    7. decontaminate      trigram overlap vs a benchmark set (broadcast)
    8. domain quota       at most N docs per source (window group limit)
    9. mixture budget     per-domain token budgets (md5-hash sampling)
    9b. PII scrub         typed mask tokens for emails/phones/IPv4s
   10. split              deterministic md5-bucket train/val/test
   11. pack + export      2048-token packing, global example ids, sharded
                          ordered write
   12. closing audit      curation_decisions-shaped per-source funnel
                          report (docs surviving each checkpoint)

Run:  python examples/corpus_pipeline.py [sf_dir] [workdir]

Prints per-stage wall-clock and the row funnel (docs surviving each stage).
Every stage is a declarative DataFrame plan — at 100 TB the same code runs
with more shuffle partitions; nothing here collects to the driver.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark import ml as ML
from data_etl_with_dbt_spark.operators import dedup as D
from data_etl_with_dbt_spark.operators import relational as R
from data_etl_with_dbt_spark.operators import textan as TA
from data_etl_with_dbt_spark.sources.io import read_parquet, write_training_shards


def main(sf_dir: str, workdir: str) -> None:
    spark = get_spark("corpus_pipeline", master=os.environ.get("SPARK_MASTER", "local[*]"))
    stages: list[tuple[str, float, int]] = []

    def mark(name: str, t0: float, df):
        # Materialize each stage once (a nightly pipeline would write a
        # table here); without this every stage's count re-executes the
        # whole upstream funnel — measured 84 s vs 23 s for the same sf0.1 run.
        df = df.localCheckpoint(eager=False)
        n = df.count()
        stages.append((name, time.time() - t0, n))
        print(f"{name:<22} {stages[-1][1]:6.1f} s   {n:>8,} docs")
        return df

    t0 = time.time()
    raw = read_parquet(spark, f"{sf_dir}/documents.parquet")
    mark("ingest", t0, raw)

    # 0a. crawl shim: the fixture ships clean single-line bodies, so the
    # intake fabricates the crawl increment around them by doc_id residue
    # (the residue-coded-synthesis pattern): a frontier URL per doc (IP
    # hosts %7==0, param-farm digit hosts %7==5), smart-quote/NBSP nav
    # chrome (%5==1), CRLF line endings (%5==3), javascript/short junk
    # lines (%3), ellipsis teasers (%19==4), Cyrillic spam (%23==11), and
    # brace pages (%41==6). Every hygiene gate below fires non-vacuously,
    # and the body that emerges from cleaning is the fixture text again
    # (plus its terminal period).
    t0 = time.time()
    d = F.col("doc_id")
    url = (
        F.when(d % 7 == 0, F.format_string("https://10.0.%d.1/p%d", d % 200, d))
        .when(
            d % 7 == 5,
            F.format_string("https://a%db%dc.example.com/p?a=1&b=2&c=3", d, d),
        )
        .otherwise(F.format_string("https://h%d.example.com/p%d", d % 97, d))
    )
    nav = F.when(
        d % 5 == 1, F.lit("“Nav menu” home | about\n")
    ).otherwise(F.lit(""))
    junk = (
        F.when(d % 3 == 0, F.lit("\nUse javascript here now."))
        .when(d % 3 == 1, F.lit("\nHi."))
        .otherwise(F.lit(""))
    )
    tease = F.when(d % 19 == 4, F.lit("\nto be continued j4...")).otherwise(
        F.lit("")
    )
    spam = F.when(
        d % 23 == 11, F.lit("\nкот мир да j11.")
    ).otherwise(F.lit(""))
    brace = F.when(d % 41 == 6, F.lit("\n{ code }")).otherwise(F.lit(""))
    body = F.concat(nav, F.col("text"), F.lit("."), junk, tease, spam, brace)
    body = F.when(d % 5 == 3, F.regexp_replace(body, "\n", "\r\n")).otherwise(
        body
    )
    page = raw.select(
        "doc_id", "source", "lang", url.alias("url"), body.alias("text")
    )
    page = mark("crawl_shim", t0, page)

    # 0b. hygiene gates — the round-8 published-recipe family in
    # production order: canonicalize, then the FUSED hygiene relation
    # (URL shape + script mix + C4 line/page cleaning + RedPajama
    # signals in ONE projection chain — zero joins, one scan; the
    # component-relation composition this replaced cost four scans +
    # three id-shuffles, see BENCH_NOTES). Flags are audited per source
    # in one relation before the conjunction filters; the C4 cleaned
    # body is what survives downstream.
    t0 = time.time()
    canon = page.select(
        "doc_id",
        "url",
        "source",
        "lang",
        TA.canonicalize_text_expr(
            F.coalesce(F.col("text"), F.lit(""))
        ).alias("text"),
    )
    hs = TA.hygiene_signals(
        canon, "doc_id", "text", url_col="url",
        min_sentences=1, emit_text=True,
    )
    flags = (
        page.select("doc_id", "source", "lang")
        .join(
            hs.select(
                "doc_id",
                (
                    ~F.col("is_ip_host")
                    & (F.col("n_query_params") <= 2)
                    & (F.col("n_host_digits") <= 4)
                ).alias("url_ok"),
                (F.col("n_cyrillic") == 0).alias("script_ok"),
                F.col("doc_kept").alias("c4_ok"),
                (F.col("n_lines_end_ellipsis") == 0).alias("rp_ok"),
                "cleaned_text",
            ),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    gate_cols = ["url_ok", "script_ok", "c4_ok", "rp_ok"]
    audit = flags.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.col(c).cast("bigint")).alias(f"n_{c}")
            for c in gate_cols
        ],
    )
    for r in audit.orderBy("source").collect():
        print(
            f"  gate audit {r.source}: {r.n_docs} docs, "
            + ", ".join(f"{c}={r[f'n_{c}']}" for c in gate_cols)
        )
    gated = (
        flags.where(F.col("url_ok") & F.col("script_ok") & F.col("c4_ok") & F.col("rp_ok"))
        .select(
            "doc_id",
            "source",
            "lang",
            F.col("cleaned_text").alias("text"),
        )
        .withColumn("n_chars", F.length("text").cast("bigint"))
    )
    docs = mark("hygiene_gates", t0, gated)

    # 1. quality: Gopher-style rule flags (word-count / mean-word-length
    # bands, duplicate-token cap, stopword floor — bands calibrated to the
    # synthetic fixture), plus the repetition bigram filter, plus a
    # perplexity-proxy cut (corpus-fit unigram LM; drop the most surprising
    # decile — the CCNet third leg). approxQuantile collects one scalar.
    t0 = time.time()
    # two consumers (approxQuantile action + the weak-label join): cut
    # lineage so the stats pass runs once
    stats = TA.text_stats(docs, "doc_id", "text").localCheckpoint(eager=True)
    rules = TA.gopher_quality_flags(
        docs, "doc_id", "text",
        min_words=10, max_words=100_000,
        min_mean_word_len=3.0, max_mean_word_len=6.0,
        max_dup_token_frac=0.8, min_distinct_stopwords=1,
    )
    rep = TA.repetition_stats(docs, "doc_id", "text")
    # approxQuantile is an ACTION: without the cut it executes the full
    # scoring plan once for the quantile and AGAIN for the join below
    ppl = TA.unigram_logprob_score(docs, "doc_id", "text").localCheckpoint(
        eager=True
    )
    ppl_cut = ppl.approxQuantile("avg_neg_logprob", [0.9], 0.01)[0]
    keep = (
        rules.where(F.col("passes_gopher"))
        .join(rep.where(F.col("top_bigram_share") <= 0.5), "doc_id")
        .join(ppl.where(F.col("avg_neg_logprob") <= ppl_cut), "doc_id")
        .select("doc_id")
    )
    quality = mark("quality_filter", t0, docs.join(keep, "doc_id"))

    # 2. model filter: bootstrap weak labels from the heuristic score's
    # extremes (top cohort = 1, bottom cohort = 0 — the CCNet recipe), train
    # the hashed-feature classifier, keep docs scoring >= 0.5. approxQuantile
    # collects exactly two scalars; training aggregates gradients
    # distributed; scoring is one JVM transform.
    t0 = time.time()
    lo, hi = stats.approxQuantile("quality_score", [0.3, 0.7], 0.01)
    weak = docs.join(stats.select("doc_id", "quality_score"), "doc_id").withColumn(
        "label",
        F.when(F.col("quality_score") >= hi, 1.0)
        .when(F.col("quality_score") <= lo, 0.0),
    )
    model = ML.train_quality_classifier(
        weak.where(F.col("label").isNotNull()),
        num_features=1 << 15, max_iter=20,
    )
    quality = mark(
        "model_filter", t0,
        ML.filter_by_quality(model, quality, threshold=0.5),
    )

    # 3. exact dedup: one doc per content digest.
    t0 = time.time()
    exact = mark("exact_dedup", t0, D.dedup_exact(quality, "doc_id", "text"))

    # 4. boilerplate prune: drop docs that are MOSTLY cross-document
    # boilerplate (5-token spans seen in >= 3 distinct docs — RefinedWeb
    # shape; a production pipeline would also swap in the reassembled text).
    t0 = time.time()
    bp = D.ngram_df_prune(exact, "doc_id", "text", span_tokens=5, min_df=3)
    exact = mark(
        "boilerplate_prune", t0,
        exact.join(
            bp.where(F.col("boilerplate_frac") < 0.5).select("doc_id"), "doc_id"
        ),
    )

    # 5. span dedup: drop docs whose every 10-token span already appeared
    # earlier in the corpus (C4-style).
    t0 = time.time()
    spans = D.span_dedup(exact, "doc_id", "text", span_tokens=10)
    exact = mark(
        "span_dedup", t0,
        exact.join(spans.where(F.col("n_spans_kept") > 0).select("doc_id"), "doc_id"),
    )

    # 5b. exact-substring CUT (Lee-et-al.): delete duplicated >=10-token
    # regions from the surviving texts and carry the CLEANED body forward —
    # the doc-granularity span filter above drops all-duplicate docs; this
    # removes the duplicated passages inside the keepers.
    t0 = time.time()
    regions = D.exact_substring_regions(exact, "doc_id", "text", span_tokens=10)
    cut = D.remove_duplicate_regions(
        exact, regions, "doc_id", "text", emit_text=True
    )
    exact = mark(
        "substring_cut", t0,
        exact.drop("text").join(
            cut.where(F.col("n_tokens_removed") < F.col("n_tokens"))
            .select("doc_id", F.col("cleaned_text").alias("text")),
            "doc_id",
        ),
    )

    # 6. near dedup: MinHash/LSH pairs -> connected components -> canonical.
    t0 = time.time()
    pairs = D.minhash_lsh_pairs(
        exact, "doc_id", "text",
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    )
    clusters = D.dedup_clusters(exact, "doc_id", pairs)
    canonical = exact.join(
        clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id"),
        "doc_id",
    )
    near = mark("near_dedup", t0, canonical)

    # 7. decontaminate against a held-out benchmark slice.
    t0 = time.time()
    # the benchmark slice comes from the RAW fixture (an eval set is
    # external text, not something the hygiene gates curated)
    bench = raw.where(F.col("doc_id") % 97 == 0)
    overlap = D.benchmark_contamination(near, bench, "doc_id", "text", n=3, threshold=0.5)
    clean = near.join(
        overlap.where(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    clean = mark("decontaminate", t0, clean)

    # 8. per-domain quota: best 50 docs per source by length.
    t0 = time.time()
    capped = R.per_key_cap(
        clean, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], n=50
    ).drop("quota_rank")
    capped = mark("domain_quota", t0, capped)

    # 9. mixture budget: downsample over-represented domains to a token
    # budget (deterministic md5-hash membership, rates broadcast).
    t0 = time.time()
    budgets = {"src0": 800, "src1": 800, "src2": 800}
    picked = TA.mixture_sample(capped, "doc_id", "source", "text", budgets)
    capped = mark("mixture_budget", t0, capped.join(picked.select("doc_id"), "doc_id"))

    # 9b. PII scrub: typed mask tokens replace emails/phones/IPv4s in the
    # text that ships (counts audited on the original; pure per-row JVM
    # regex — pipelines into the same scan as the split below).
    t0 = time.time()
    pii = TA.scrub_pii(capped, "doc_id", "text")
    capped = mark(
        "pii_scrub", t0,
        capped.drop("text").join(
            pii.select("doc_id", F.col("scrubbed_text").alias("text")),
            "doc_id",
        ),
    )

    # 10. deterministic split.
    t0 = time.time()
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < "cccc", "train").when(bucket < "e666", "val").otherwise("test")
    )
    assigned = capped.withColumn("split", split)
    mark("hash_split", t0, assigned)

    # 11. pack into 2048-token sequences, assign contiguous global example
    # ids (no single-partition sort), export ordered shards per split.
    t0 = time.time()
    toks = assigned.withColumn("n_tokens", F.size(TA.tokens_expr(F.col("text"))))
    w = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = (
        toks.withColumn("off", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn("seq_id", F.expr("off DIV 2048"))
        .drop("off")
    )
    train = R.global_row_index(
        packed.where(F.col("split") == "train"),
        order_by=["doc_id"],
        index_col="example_id",
    )
    out = os.path.join(workdir, "corpus_shards")
    write_training_shards(
        train, out, order_by=["source", "doc_id"], num_shards=8
    )
    n = spark.read.parquet(out).count()
    stages.append(("pack_export", time.time() - t0, n))
    print(f"{'pack_export':<22} {stages[-1][1]:6.1f} s   {n:>8,} docs")

    # 12. closing audit — the curation_decisions-shaped report: one row
    # per source counting survivors at each funnel checkpoint (hygiene ->
    # quality/model -> dedup'd -> decontaminated -> exported), derived by
    # id-keyed left joins against the stage outputs already materialized
    # above — no stage recomputes.
    t0 = time.time()
    checkpoints = [
        ("hygiene", docs),
        ("quality", quality),
        ("deduped", near),
        ("decontaminated", clean),
        ("split_assigned", assigned),
    ]
    audit2 = raw.select("doc_id", "source")
    for cname, df in checkpoints:
        audit2 = audit2.join(
            df.select("doc_id").withColumn(f"__{cname}", F.lit(1)),
            "doc_id",
            "left",
        )
    report = audit2.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(F.coalesce(F.col(f"__{c}"), F.lit(0))).alias(f"n_{c}")
            for c, _ in checkpoints
        ],
    )
    rows = report.orderBy("source").collect()
    stages.append(("closing_audit", time.time() - t0, len(rows)))
    print(f"{'closing_audit':<22} {stages[-1][1]:6.1f} s   {len(rows):>8,} srcs")
    for r in rows:
        print(
            f"  funnel {r.source}: in={r.n_docs} "
            + " -> ".join(f"{c}={r[f'n_{c}']}" for c, _ in checkpoints)
        )
        assert r.n_split_assigned >= 0  # all counts present
    total = sum(t for _, t, _ in stages)
    print(f"\nTOTAL {total:.1f} s over {len(stages)} stages")


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    wd = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_pipeline"
    main(sf, wd)
