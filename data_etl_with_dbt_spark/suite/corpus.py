"""Corpus-hygiene queries: test-set decontamination, within-document
repetition filters, and deterministic hash-based train/val/test splitting —
the remaining pillars of an LLM training-data pipeline after dedup/quality
(suite.llm_ops) and chunking/sampling/export (suite.featurize).

Determinism notes: every fraction here is a single IEEE division of two
exact integers (bit-identical across engines); the split assignment compares
md5 hex prefixes lexicographically (both engines render lowercase hex), so
nothing floats through engine-specific rounding at all.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize, spread_small

from data_etl_with_dbt_spark.operators import dedup as D
from data_etl_with_dbt_spark.operators import relational as R
from data_etl_with_dbt_spark.operators import textan as TA
from data_etl_with_dbt_spark.suite.registry import big, load, query

# ---------------------------------------------------------------------------
# Test-set decontamination: n-gram overlap against a benchmark corpus.
# The fixture has no separate eval set, so a deterministic 1/97 slice of
# documents plays the benchmark and the rest are "training" docs.
# ---------------------------------------------------------------------------

_DECONTAM_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
    FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_distinct(
               list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(t[i:i+2], ' ')
               )
           )) AS gram
    FROM toks
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0)
SELECT g.doc_id,
       CAST(count(*) AS BIGINT) AS total_grams,
       CAST(count(b.gram) AS BIGINT) AS matched_grams,
       CAST(count(b.gram) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS overlap_frac,
       (CAST(count(b.gram) AS DOUBLE) / CAST(count(*) AS DOUBLE)) >= 0.5
           AS contaminated
FROM grams g LEFT JOIN bench b ON g.gram = b.gram
WHERE g.doc_id % 97 <> 0
GROUP BY g.doc_id
"""


@query(
    "decontaminate_ngram_overlap",
    oracle=_DECONTAM_ORACLE,
    description=(
        "Test-set decontamination: per-doc distinct trigram overlap against a "
        "broadcast benchmark gram dictionary (GPT-3-style contamination check)"
    ),
)
def decontaminate_ngram_overlap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    return D.benchmark_contamination(
        train, bench, "doc_id", "text", n=3, threshold=0.5,
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    )


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style filters).
# ---------------------------------------------------------------------------

_REPETITION_ORACLE = """
WITH toks AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
    FROM documents
),
bg AS (
    -- zero-token docs contribute no bigram rows (mirrors the Spark-side
    -- size > 0 filter; they surface via the LEFT JOIN with zeroed stats)
    SELECT doc_id,
           unnest(list_transform(
               range(1, greatest(len(t) - 1, 1) + 1),
               i -> array_to_string(t[i:i+1], ' ')
           )) AS g
    FROM toks
    WHERE len(t) > 0
),
per_bigram AS (
    SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g
),
per_doc AS (
    SELECT doc_id, max(c) AS top_bigram_cnt, sum(c) AS n_bigrams
    FROM per_bigram GROUP BY doc_id
),
tok_stats AS (
    SELECT doc_id, len(t) AS n_tokens, len(list_distinct(t)) AS n_distinct
    FROM toks
)
SELECT s.doc_id,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CASE WHEN s.n_tokens > 0
            THEN 1.0 - (CAST(s.n_distinct AS DOUBLE) / CAST(s.n_tokens AS DOUBLE))
            ELSE 0.0 END AS dup_token_frac,
       CAST(COALESCE(p.top_bigram_cnt, 0) AS BIGINT) AS top_bigram_cnt,
       CASE WHEN p.n_bigrams IS NOT NULL
            THEN CAST(p.top_bigram_cnt AS DOUBLE) / CAST(p.n_bigrams AS DOUBLE)
            ELSE 0.0 END AS top_bigram_share
FROM tok_stats s LEFT JOIN per_doc p ON s.doc_id = p.doc_id
"""


@query(
    "repetition_stats",
    oracle=_REPETITION_ORACLE,
    description=(
        "Gopher-style within-doc repetition: duplicate-token fraction + top "
        "bigram share (map-side-combined bigram agg, stats-only join)"
    ),
)
def repetition_stats_q(spark, sf_dir):
    return TA.repetition_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Deterministic hash split: train/val/test assignment that is stable across
# runs, engines, and cluster sizes (no RNG, no row order dependence) —
# lexicographic comparison on an md5 hex prefix. 0xcccc/0x10000 = 80%,
# 0xe666/0x10000 = 90%.
# ---------------------------------------------------------------------------

@query(
    "hash_split_assignment",
    oracle="""
    SELECT doc_id,
           substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
           CASE
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccc' THEN 'train'
               WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666' THEN 'val'
               ELSE 'test'
           END AS split,
           lang, source
    FROM documents
    """,
    description=(
        "Deterministic 80/10/10 train/val/test split by md5 key-hash bucket — "
        "stable under reruns, engine swaps, and repartitioning (no RNG)"
    ),
)
def hash_split_assignment(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    split = (
        F.when(bucket < "cccc", "train").when(bucket < "e666", "val").otherwise("test")
    )
    return docs.select(
        big(F.col("doc_id")).alias("doc_id"),
        bucket.alias("bucket"),
        split.alias("split"),
        "lang",
        "source",
    )


# ---------------------------------------------------------------------------
# Per-domain quota caps: "at most N docs per source", the C4/RefinedWeb-style
# guard against a few mega domains dominating the training mix.
# ---------------------------------------------------------------------------

@query(
    "domain_quota_cap",
    oracle="""
    SELECT doc_id, source, n_chars, quota_rank FROM (
        SELECT doc_id, source, n_chars,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id
               ) AS BIGINT) AS quota_rank
        FROM documents
    ) WHERE quota_rank <= 50
    """,
    description=(
        "Per-source quota cap (keep best 50 docs per domain by length, "
        "deterministic tie-break) — single key-shuffle, WindowGroupLimit "
        "bounds per-task state"
    ),
)
def domain_quota_cap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    capped = R.per_key_cap(
        docs,
        ["source"],
        [F.col("n_chars").desc(), F.col("doc_id")],
        n=50,
    )
    return capped.select(
        "doc_id", "source", "n_chars", big(F.col("quota_rank")).alias("quota_rank")
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage: global heavy-hitter terms plus the cumulative share of
# total token mass they cover (the "how big must the vocab be" curve).
# ---------------------------------------------------------------------------

@query(
    "vocab_coverage_topk",
    oracle="""
    WITH toks AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> '')) AS term
        FROM documents
    ),
    terms AS (SELECT term, count(*) AS c FROM toks GROUP BY term),
    top AS (SELECT term, c FROM terms ORDER BY c DESC, term LIMIT 100),
    tot AS (SELECT sum(c) AS t FROM terms)
    SELECT CAST(row_number() OVER (ORDER BY c DESC, term) AS BIGINT)
               AS term_rank,
           term,
           CAST(c AS BIGINT) AS cnt,
           CAST(sum(c) OVER (ORDER BY c DESC, term ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS cum_cnt,
           CAST(sum(c) OVER (ORDER BY c DESC, term ROWS UNBOUNDED PRECEDING)
                AS DOUBLE) / CAST(t.t AS DOUBLE) AS coverage
    FROM top, tot t
    """,
    description=(
        "Vocabulary coverage curve: top-100 terms by corpus frequency with "
        "cumulative token-mass share (top-k before the window, so the "
        "unpartitioned cumsum only ever sees 100 rows)"
    ),
)
def vocab_coverage_topk(spark, sf_dir):
    # Heavy-hitter selection is TakeOrderedAndProject over the map-side-
    # combined term counts — no global sort. The unpartitioned running-sum
    # window (a scale hazard on full tables) runs AFTER the limit, over
    # exactly 100 rows; the corpus-total token count joins in as a broadcast
    # scalar. coverage = one IEEE division of two exact BIGINTs.
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.explode(TA.tokens_expr(F.col("text"))).alias("term"))
    terms = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    # top-k AND the scalar total both consume terms: checkpoint the
    # vocab-sized count table so the corpus explode+agg runs once
    terms = terms.transform(materialize)
    top = terms.orderBy(F.col("c").desc(), F.col("term")).limit(100)
    tot = terms.agg(F.sum("c").alias("t"))
    order = [F.col("c").desc(), F.col("term")]
    cum_w = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        top.withColumn("cum_cnt", F.sum("c").over(cum_w))
        .withColumn("term_rank", F.row_number().over(Window.orderBy(*order)))
        .crossJoin(F.broadcast(tot))
        .select(
            big(F.col("term_rank")).alias("term_rank"),
            "term",
            big(F.col("c")).alias("cnt"),
            big(F.col("cum_cnt")).alias("cum_cnt"),
            (
                F.col("cum_cnt").cast("double") / F.col("t").cast("double")
            ).alias("coverage"),
        )
    )


# ---------------------------------------------------------------------------
# Fuzzy record linkage: bounded-edit-distance pairs within a blocking key.
# ---------------------------------------------------------------------------

@query(
    "fuzzy_name_pairs",
    oracle="""
    SELECT a.p_brand AS p_brand,
           a.p_partkey AS id_a, b.p_partkey AS id_b,
           a.p_name AS text_a, b.p_name AS text_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
    FROM part a JOIN part b
      ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
    WHERE levenshtein(a.p_name, b.p_name) <= 2
    """,
    description=(
        "Fuzzy record linkage: Levenshtein<=2 name pairs blocked by brand "
        "(equi-join on the block, distance as residual — no global cross "
        "product)"
    ),
)
def fuzzy_name_pairs(spark, sf_dir):
    pairs = R.fuzzy_pairs(
        load(spark, sf_dir, "part"), "p_brand", "p_partkey", "p_name", max_dist=2,
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    )
    return pairs.select(
        "p_brand",
        big(F.col("id_a")).alias("id_a"),
        big(F.col("id_b")).alias("id_b"),
        "text_a",
        "text_b",
        big(F.col("dist")).alias("dist"),
    )


# ---------------------------------------------------------------------------
# Global contiguous example ids. The oracle is the single-threaded spelling
# (row_number over a global ORDER BY); the Spark side must produce the exact
# same assignment from the bucketed distributed plan — which also proves the
# bucket/offset arithmetic, not just the shape.
# New-entry naming: bare (sorts into the driver window; see __spark_entry__).
# ---------------------------------------------------------------------------

@query(
    "global_row_index",
    oracle="""
    SELECT CAST(row_number() OVER (ORDER BY o_orderkey) - 1 AS BIGINT) AS idx,
           CAST(o_orderkey AS BIGINT) AS o_orderkey,
           o_totalprice
    FROM orders
    """,
    description=(
        "Contiguous global row numbers without a single-partition sort: "
        "quantile-cut buckets + per-bucket offsets + within-bucket "
        "row_number (training example ids at corpus scale)"
    ),
)
def global_row_index(spark, sf_dir):
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    out = R.global_row_index(orders, order_by=["o_orderkey"], index_col="idx")
    return out.select(
        big(F.col("idx")).alias("idx"),
        big(F.col("o_orderkey")).alias("o_orderkey"),
        "o_totalprice",
    )


# ---------------------------------------------------------------------------
# Corpus-level exact span dedup (C4 / RefinedWeb line-dedup shape).
# Fixture-calibrated: at 10-token spans the sf0.01 documents table has ~151
# duplicate spans across ~57 docs (exact-duplicate docs lose every span —
# the md5('') reassembly edge is exercised, and both engines must agree on
# it via COALESCE in the oracle).
# ---------------------------------------------------------------------------

@query(
    "dedup_spans_keep_first",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    spans AS (
        SELECT doc_id, CAST(start / 10 AS BIGINT) AS pos,
               array_to_string(list_slice(t, start + 1, start + 10), ' ') AS span
        FROM (SELECT doc_id, t,
                     unnest(generate_series(0, greatest(len(t) - 1, 0), 10)) AS start
              FROM toks) s
        WHERE len(list_slice(t, start + 1, start + 10)) > 0
    ),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY span ORDER BY doc_id, pos) AS rn
        FROM spans
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_kept,
           md5(coalesce(string_agg(CASE WHEN rn = 1 THEN span END, ' ' ORDER BY pos), ''))
               AS kept_hash
    FROM ranked GROUP BY doc_id
    """,
    description=(
        "Corpus-level exact span dedup (C4-style): 10-token spans, global "
        "keep-first by (doc, position), documents reassembled from surviving "
        "spans (hash emitted)"
    ),
)
def dedup_spans_keep_first(spark, sf_dir):
    return D.span_dedup(
        load(spark, sf_dir, "documents"), "doc_id", "text", span_tokens=10
    )


@query(
    "exact_substring_regions",
    oracle=r"""
    WITH src AS (SELECT DISTINCT doc_id, text FROM documents),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        FROM src
    ),
    pos AS (
        SELECT doc_id, i,
               array_to_string(list_slice(t, i + 1, i + 10), ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 10)) AS i
              FROM toks WHERE len(t) >= 10) s
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY shingle ORDER BY doc_id, i) AS rn
        FROM pos
    ),
    dup AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
        FROM ranked WHERE rn > 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(i) AS BIGINT) AS region_start,
           CAST(max(i) + 10 AS BIGINT) AS region_end,
           CAST(max(i) + 10 - min(i) AS BIGINT) AS region_tokens
    FROM dup GROUP BY doc_id, isl
    """,
    description=(
        "Maximal exact-substring duplicate regions (Lee-et-al. shape, "
        "dedup.exact_substring_regions): stride-1 10-token shingles, "
        "global keep-first by (doc, position), adjacent duplicate starts "
        "merged gaps-and-islands into maximal [start, end) token regions "
        "— 24 regions on the fixture with merges up to 95 tokens, so the "
        "region merge itself is non-vacuous; input pre-deduped on "
        "(doc_id, text) to honor the operator's unique-id contract under "
        "the dup2 perturbation, oracle mirroring the same DISTINCT"
    ),
)
def exact_substring_regions(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").distinct()
    return D.exact_substring_regions(
        docs, "doc_id", "text", span_tokens=10
    ).select(
        big(F.col("doc_id")).alias("doc_id"),
        "region_start",
        "region_end",
        big(F.col("region_tokens")).alias("region_tokens"),
    )


# ---------------------------------------------------------------------------
# Token-budgeted mixture sampling. Budgets exercise every branch on the
# fixture: src0 ~half-rate, src2 ~fifth-rate, src1's budget exceeds its
# tokens (min(1, rate) path), and the 17 unlisted domains keep all rows.
# ---------------------------------------------------------------------------

from data_etl_with_dbt_spark.suite.registry import QUERIES as _REGISTRY  # noqa: E402


@query(
    "exact_substring_dedup_cut",
    oracle=f"""
    WITH regions AS ({_REGISTRY["exact_substring_regions"].oracle}),
    src AS (SELECT DISTINCT doc_id, text FROM documents),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS t
        FROM src
    ),
    tok_pos AS (
        SELECT doc_id, i, t[i + 1] AS tok
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1)) AS i
              FROM toks WHERE len(t) > 0)
    ),
    kept AS (
        SELECT tp.doc_id, tp.i, tp.tok
        FROM tok_pos tp
        WHERE NOT EXISTS (SELECT 1 FROM regions r
                          WHERE r.doc_id = tp.doc_id
                            AND tp.i >= r.region_start
                            AND tp.i < r.region_end)
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(len(t.t) - count(k.i) AS BIGINT) AS n_tokens_removed,
           md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.i), '')) AS cleaned_hash
    FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, len(t.t)
    """,
    description=(
        "The CUT pass completing Lee-et-al. exact-substring dedup "
        "(dedup.remove_duplicate_regions over exact_substring_regions "
        "output): duplicate-region tokens deleted, documents reassembled "
        "(hash emitted), no-region docs verbatim, fully-duplicate docs to "
        "md5(''). The hash compare is a double invariant: the oracle "
        "counts removed tokens positionally while Spark folds a merged-"
        "interval length over the region array — two independent spellings "
        "of the union size"
    ),
)
def exact_substring_dedup_cut(spark, sf_dir):
    # one scan+distinct for the two consumers (regions + cut join) and
    # post-distinct parallelism for the shingle projection (r11; see
    # curation_decisions)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(spread_small)
        .transform(materialize)
    )
    regions = D.exact_substring_regions(docs, "doc_id", "text", span_tokens=10)
    out = D.remove_duplicate_regions(docs, regions, "doc_id", "text")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_tokens",
        "n_tokens_removed",
        "cleaned_hash",
    )


@query(
    "incremental_substring_regions",
    oracle=f"""{_REGISTRY["exact_substring_regions"].oracle}""",
    description=(
        "Cross-batch exact-substring dedup "
        "(dedup.incremental_exact_substring_regions) driven "
        "batch-equivalently: three ascending-id document batches judged "
        "against an accumulating shingle-hash index (earlier batches "
        "never re-read); in arrival order the per-batch region union "
        "EQUALS the one-shot result, so the oracle is the batch "
        "operator's own — the N-batch == one-shot contract, "
        "driver-hash-checked like streaming_recrawl_maintenance"
    ),
)
def incremental_substring_regions(spark, sf_dir):
    # one scan+distinct shared by the three batch filters (each batch is
    # its own job — without the checkpoint every batch re-ran scan +
    # distinct) + post-distinct parallelism for the shingle work (r11)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(spread_small)
        .transform(materialize)
    )
    index = spark.createDataFrame([], "span_hash bigint")
    outs = []
    # ascending-id batches (doc_id spans 0..499 at every SF; thresholds
    # keep each batch non-empty and the arrival order == keep-first order)
    for lo, hi in ((0, 170), (170, 340), (340, 1 << 31)):
        batch = docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
        regions, new_hashes = D.incremental_exact_substring_regions(
            batch, index, "doc_id", "text", span_tokens=10
        )
        outs.append(regions)
        index = index.unionByName(
            new_hashes.select("span_hash")
        ).transform(materialize, eager=True)
    merged = outs[0].unionByName(outs[1]).unionByName(outs[2])
    return merged.select(
        big(F.col("doc_id")).alias("doc_id"),
        "region_start",
        "region_end",
        big(F.col("region_tokens")).alias("region_tokens"),
    )


@query(
    "streaming_substring_cut",
    oracle=f"""{_REGISTRY["exact_substring_dedup_cut"].oracle}""",
    description=(
        "The full Lee-et-al. pipeline in CONTINUOUS INTAKE "
        "(streaming.intake.substring_intake_sink — "
        "incremental_exact_substring_regions + remove_duplicate_regions "
        "per micro-batch, first-seen hashes committed to a versioned "
        "index): three ascending-id batches, earlier batches never "
        "re-read; the accumulated corpus EQUALS the one-shot cut, so the "
        "oracle is exact_substring_dedup_cut's own — the N-batch == "
        "one-shot contract, driver-hash-checked like "
        "streaming_recrawl_maintenance"
    ),
)
def streaming_substring_cut(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import substring_intake_sink

    # one scan+distinct shared by the three batch jobs (and by the sink's
    # two per-batch consumers of each batch) — checkpoint WITHOUT a
    # repartition: a spread here measured 2.2 s SLOWER (the sink runs ~20
    # small jobs per batch; 32-way tiny partitions multiply scheduling
    # overhead), while the checkpoint alone is neutral-to-better and
    # removes the re-scans (r11 A/B)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(materialize)
    )
    base = tempfile.mkdtemp(prefix="substream_")
    sink = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=10, emit_text=False,
    )
    # same ascending-id batches as incremental_substring_regions: arrival
    # order == keep-first order, so the equivalence contract applies
    for b, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 1 << 31))):
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_tokens",
        "n_tokens_removed",
        "cleaned_hash",
    )


@query(
    "streaming_substring_bloom_cut",
    oracle=f"""{_REGISTRY["exact_substring_dedup_cut"].oracle}""",
    description=(
        "streaming_substring_cut with the 100 TB index-probe path ON: "
        "batch 0 runs the plain sink, batches 1-2 run with "
        "bloom_expected_keys set, so the round exercises BOTH the "
        "coverage-watermark backfill (the bloom bootstraps from the "
        "pre-existing index before batch 1 probes) and the steady-state "
        "bloom-front (batch hashes probe the broadcast bitmap, the index "
        "is semi-join-pruned to the maybe candidates — scanned, never "
        "shuffled). A bloom 'no' is exact, so the corpus is IDENTICAL to "
        "the unfronted run and the oracle is exact_substring_dedup_cut's "
        "own one-shot SQL"
    ),
)
def streaming_substring_bloom_cut(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import substring_intake_sink

    # shared scan+distinct, checkpoint only — no repartition (r11 A/B;
    # see streaming_substring_cut)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(materialize)
    )
    base = tempfile.mkdtemp(prefix="subbloom_")
    plain = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=10, emit_text=False,
    )
    fronted = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=10, emit_text=False,
        bloom_expected_keys=200_000,
    )
    for b, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 1 << 31))):
        sink = plain if b == 0 else fronted
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_tokens",
        "n_tokens_removed",
        "cleaned_hash",
    )


# ---------------------------------------------------------------------------
# Sentence-granularity exact-substring dedup (C4-style: regions align to
# sentence boundaries). The real documents fixture is single-sentence
# (no [.!?] in the text — probed round 8), so the input is residue-coded
# synthesis (the crawl-family pattern): a 240-doc multi-sentence corpus
# derived ENTIRELY from distinct doc_ids — docs in the same %6 class
# share "common" sentences at each index, broken by per-doc "unique"
# sentences at j%5==2, so keep-first produces multiple regions per doc
# AND multi-start island merges, identically at every SF.
# ---------------------------------------------------------------------------

_SENT_IDS_SQL = "SELECT DISTINCT doc_id FROM documents ORDER BY doc_id LIMIT 240"

_SENT_SYNTH_SQL = f"""
        SELECT doc_id, j,
               CASE WHEN j % 5 = 2
                    THEN 'unique d' || doc_id || ' j' || j
                    ELSE 'common c' || (doc_id % 6) || ' j' || j END AS s
        FROM (SELECT doc_id, unnest(generate_series(0, 5 + doc_id % 4 - 1)) AS j
              FROM ({_SENT_IDS_SQL}))
"""

_SENT_REGIONS_SQL = f"""
    WITH sent AS ({_SENT_SYNTH_SQL}),
    spans AS (
        SELECT a.doc_id, a.j AS i, a.s || chr(10) || b.s AS sh
        FROM sent a JOIN sent b ON a.doc_id = b.doc_id AND b.j = a.j + 1
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY sh ORDER BY doc_id, i) AS rn
        FROM spans
    ),
    dup AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
        FROM ranked WHERE rn > 1
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(min(i) AS BIGINT) AS region_start,
           CAST(max(i) + 2 AS BIGINT) AS region_end,
           CAST(max(i) + 2 - min(i) AS BIGINT) AS region_sentences
    FROM dup GROUP BY doc_id, isl
"""


def _synth_sentence_docs(spark, sf_dir):
    """The Spark twin of _SENT_SYNTH_SQL, assembled as TEXT so the
    operator exercises its own segmentation end-to-end: sentences joined
    with '. ' plus a trailing '.', which sentence_array_expr splits back
    losslessly (synthetic sentences contain no [.!?])."""
    ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(240)
    )
    sent = lambda j: F.when(  # noqa: E731
        j % 5 == F.lit(2),
        F.format_string("unique d%d j%d", F.col("doc_id"), j),
    ).otherwise(
        F.format_string("common c%d j%d", F.col("doc_id") % 6, j)
    )
    n = F.lit(5) + F.col("doc_id") % 4
    text = F.concat(
        F.array_join(F.transform(F.sequence(F.lit(0), n - 1), sent), ". "),
        F.lit("."),
    )
    return ids.select("doc_id", text.alias("text"))


@query(
    "sentence_dedup_regions",
    oracle=_SENT_REGIONS_SQL,
    description=(
        "Sentence-ALIGNED exact-substring duplicate regions "
        "(dedup.sentence_substring_regions — the C4-style form: stride-1 "
        "2-sentence spans over sentence_array_expr segmentation, global "
        "keep-first, gaps-and-islands merge; offsets index sentences so "
        "a cut never splits mid-word). Residue-coded 240-doc synthetic "
        "corpus (%6 classes share sentences, %5==2 uniques break runs) — "
        "multiple regions per doc and 3-start island merges, SF-invariant"
    ),
)
def sentence_dedup_regions(spark, sf_dir):
    docs = _synth_sentence_docs(spark, sf_dir)
    out = D.sentence_substring_regions(
        docs, "doc_id", "text", span_sentences=2
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "region_start",
        "region_end",
        big(F.col("region_sentences")).alias("region_sentences"),
    )


@query(
    "sentence_dedup_cut",
    oracle=f"""
    WITH regions AS ({_SENT_REGIONS_SQL}),
    sent AS ({_SENT_SYNTH_SQL}),
    kept AS (
        SELECT st.doc_id, st.j, st.s
        FROM sent st
        WHERE NOT EXISTS (SELECT 1 FROM regions r
                          WHERE r.doc_id = st.doc_id
                            AND st.j >= r.region_start
                            AND st.j < r.region_end)
    ),
    n AS (SELECT doc_id, 5 + doc_id % 4 AS n
          FROM ({_SENT_IDS_SQL}))
    SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
           CAST(n.n AS BIGINT) AS n_sentences,
           CAST(n.n - count(k.j) AS BIGINT) AS n_sentences_removed,
           md5(coalesce(string_agg(k.s, '. ' ORDER BY k.j), ''))
               AS cleaned_hash
    FROM n LEFT JOIN kept k ON n.doc_id = k.doc_id
    GROUP BY n.doc_id, n.n
    """,
    description=(
        "The sentence-granularity CUT (dedup.remove_duplicate_regions "
        "unit='sentence' over sentence_substring_regions output): "
        "duplicate sentence runs deleted whole — never mid-word — and "
        "survivors reassembled '. '-joined (hash emitted); no-region "
        "docs verbatim, the oracle recounting removals positionally vs "
        "Spark's merged-interval fold, same double invariant as the "
        "token cut"
    ),
)
def sentence_dedup_cut(spark, sf_dir):
    docs = _synth_sentence_docs(spark, sf_dir)
    regions = D.sentence_substring_regions(
        docs, "doc_id", "text", span_sentences=2
    )
    out = D.remove_duplicate_regions(
        docs, regions, "doc_id", "text", unit="sentence"
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_sentences",
        "n_sentences_removed",
        "cleaned_hash",
    )


_PARA_SYNTH_SQL = f"""
        SELECT doc_id, j,
               CASE WHEN j % 5 = 2
                    THEN 'unique d' || doc_id || ' j' || j || ' alpha'
                         || chr(10) ||
                         'unique d' || doc_id || ' j' || j || ' beta'
                    ELSE 'common p' || (doc_id % 6) || ' j' || j || ' alpha'
                         || chr(10) ||
                         'common p' || (doc_id % 6) || ' j' || j || ' beta'
               END AS p
        FROM (SELECT doc_id, unnest(generate_series(0, 5 + doc_id % 4 - 1)) AS j
              FROM ({_SENT_IDS_SQL}))
"""


def _synth_paragraph_docs(spark, sf_dir):
    """Residue-coded multi-PARAGRAPH corpus (two-line paragraphs,
    blank-line joined): docs in the same %6 class share paragraphs,
    per-doc uniques at j%5==2 break runs — the sentence synthesis one
    granularity up, exercising inner newlines inside the unit."""
    ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(240)
    )
    d = F.col("doc_id")
    para = lambda j: F.when(  # noqa: E731
        j % 5 == F.lit(2),
        F.format_string(
            "unique d%d j%d alpha\nunique d%d j%d beta", d, j, d, j
        ),
    ).otherwise(
        F.format_string(
            "common p%d j%d alpha\ncommon p%d j%d beta", d % 6, j, d % 6, j
        )
    )
    n = F.lit(5) + d % 4
    return ids.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), n - 1), para), "\n\n"
        ).alias("text"),
    )


@query(
    "paragraph_dedup_cut",
    oracle=f"""
    WITH para AS ({_PARA_SYNTH_SQL}),
    ranked AS (
        SELECT doc_id, j,
               row_number() OVER (PARTITION BY p ORDER BY doc_id, j) AS rn
        FROM para
    ),
    dup AS (
        SELECT doc_id, j,
               j - row_number() OVER (PARTITION BY doc_id ORDER BY j) AS isl
        FROM ranked WHERE rn > 1
    ),
    regions AS (
        SELECT doc_id, min(j) AS region_start, max(j) + 1 AS region_end
        FROM dup GROUP BY doc_id, isl
    ),
    kept AS (
        SELECT pa.doc_id, pa.j, pa.p
        FROM para pa
        WHERE NOT EXISTS (SELECT 1 FROM regions r
                          WHERE r.doc_id = pa.doc_id
                            AND pa.j >= r.region_start
                            AND pa.j < r.region_end)
    ),
    n AS (SELECT doc_id, 5 + doc_id % 4 AS n FROM ({_SENT_IDS_SQL}))
    SELECT CAST(n.doc_id AS BIGINT) AS doc_id,
           CAST(n.n AS BIGINT) AS n_paragraphs,
           CAST(n.n - count(k.j) AS BIGINT) AS n_paragraphs_removed,
           md5(coalesce(string_agg(k.p, chr(10) || chr(10) ORDER BY k.j),
                        '')) AS cleaned_hash
    FROM n LEFT JOIN kept k ON n.doc_id = k.doc_id
    GROUP BY n.doc_id, n.n
    """,
    description=(
        "Paragraph-granularity dedup + cut at the DOLMA shape "
        "(dedup.paragraph_substring_regions span_paragraphs=1 — any "
        "paragraph seen before anywhere is duplicate text — then "
        "remove_duplicate_regions unit='paragraph', blank-line "
        "reassembly): the third point on the unit axis. Residue-coded "
        "240-doc corpus of two-line paragraphs (%6 classes share, %5==2 "
        "uniques break runs; inner newlines exercise the unit split), "
        "oracle keyed on the paragraph STRING vs Spark's xxhash64 — "
        "collision-equivalence is the hash contract"
    ),
)
def paragraph_dedup_cut(spark, sf_dir):
    docs = _synth_paragraph_docs(spark, sf_dir)
    regions = D.paragraph_substring_regions(
        docs, "doc_id", "text", span_paragraphs=1
    )
    out = D.remove_duplicate_regions(
        docs, regions, "doc_id", "text", unit="paragraph"
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_paragraphs",
        "n_paragraphs_removed",
        "cleaned_hash",
    )


@query(
    "streaming_sentence_cut",
    oracle=f"""{_REGISTRY["sentence_dedup_cut"].oracle}""",
    description=(
        "The sentence-granularity pipeline in CONTINUOUS INTAKE "
        "(substring_intake_sink unit='sentence' — same sink, unit axis "
        "swapped): three ascending-id batches of the residue-coded "
        "sentence corpus against an accumulating sentence-span index; "
        "the accumulated corpus EQUALS the one-shot sentence cut, so the "
        "oracle is sentence_dedup_cut's own — driver evidence for the "
        "streaming sentence path next to streaming_substring_cut's "
        "token path"
    ),
)
def streaming_sentence_cut(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import substring_intake_sink

    # one synthesis shared by the three batch jobs — checkpoint only,
    # no repartition (r11 A/B; see streaming_substring_cut)
    docs = _synth_sentence_docs(spark, sf_dir).transform(materialize)
    base = tempfile.mkdtemp(prefix="sentstream_")
    sink = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=2, unit="sentence", emit_text=False,
    )
    for b, (lo, hi) in enumerate(((0, 80), (80, 160), (160, 1 << 31))):
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_sentences",
        "n_sentences_removed",
        "cleaned_hash",
    )


@query(
    "streaming_paragraph_cut",
    oracle=f"""{_REGISTRY["paragraph_dedup_cut"].oracle}""",
    description=(
        "The paragraph-granularity (Dolma-shape) pipeline in CONTINUOUS "
        "INTAKE (substring_intake_sink unit='paragraph' span=1 — same "
        "sink, third point on the unit axis): three ascending-id batches "
        "of the residue-coded two-line-paragraph corpus against an "
        "accumulating paragraph-hash index; the accumulated corpus "
        "EQUALS the one-shot paragraph cut, so the oracle is "
        "paragraph_dedup_cut's own — driver evidence completing the "
        "streaming unit axis (token r7, sentence r8, paragraph r9)"
    ),
)
def streaming_paragraph_cut(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import substring_intake_sink

    # one synthesis shared by the three batch jobs — checkpoint only,
    # no repartition (r11 A/B; see streaming_substring_cut)
    docs = _synth_paragraph_docs(spark, sf_dir).transform(materialize)
    base = tempfile.mkdtemp(prefix="parastream_")
    sink = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=1, unit="paragraph", emit_text=False,
    )
    for b, (lo, hi) in enumerate(((0, 80), (80, 160), (160, 1 << 31))):
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_paragraphs",
        "n_paragraphs_removed",
        "cleaned_hash",
    )


@query(
    "corpus_duplication_profile",
    oracle=f"""
    WITH cut AS ({_REGISTRY["exact_substring_dedup_cut"].oracle}),
    src AS (SELECT DISTINCT doc_id, source FROM documents)
    SELECT s.source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (c.n_tokens_removed > 0) AS BIGINT)
               AS n_docs_with_dups,
           CAST(sum(c.n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(c.n_tokens_removed) AS BIGINT) AS dup_tokens
    FROM cut c JOIN src s ON c.doc_id = s.doc_id
    GROUP BY s.source
    """,
    description=(
        "Per-source corpus duplication profile — the report every "
        "curation pipeline publishes before/after dedup: documents, "
        "documents carrying duplicate regions, total vs duplicate-region "
        "tokens per source (exact merged-interval union via "
        "remove_duplicate_regions; the published dup fraction is one "
        "division downstream). Source rollup rides the cut output — "
        "corpus scanned once beyond the region pass itself"
    ),
)
def corpus_duplication_profile(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    ).distinct()
    # body keyed on (doc_id, text) ALONE: if a doc_id ever mapped to two
    # sources, a (doc_id, source, text)-distinct body would carry dup
    # doc_id rows — violating exact_substring_regions' unique-id contract
    # (nondeterministic keep-first) and double-counting vs the oracle's
    # distinct (doc_id, text) cut
    body = docs.select("doc_id", "text").distinct()
    regions = D.exact_substring_regions(body, "doc_id", "text", span_tokens=10)
    cut = D.remove_duplicate_regions(body, regions, "doc_id", "text")
    return (
        cut.join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(
            big(F.count(F.lit(1))).alias("n_docs"),
            big(
                F.count(F.when(F.col("n_tokens_removed") > 0, 1))
            ).alias("n_docs_with_dups"),
            big(F.sum("n_tokens")).alias("total_tokens"),
            big(F.sum("n_tokens_removed")).alias("dup_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Gopher repetition signals (Rae et al. §A1.1 Table A1 — the line-level and
# n-gram-coverage subset repetition_stats doesn't cover). Residue-coded
# multi-line synthesis: even docs repeat line 1 at position 3 (duplicate
# lines + in-line dup 5-grams), d%7==2 docs append two identical 11-token
# tail lines (dup 10-grams), odd docs carry no repetition (both directions
# non-vacuous).
# ---------------------------------------------------------------------------

_REP_LINES_SQL = f"""
        SELECT doc_id, j,
               CASE WHEN j >= 50
                    THEN 'tail' || (doc_id % 6) ||
                         ' t1 t2 t3 t4 t5 t6 t7 t8 t9 t10'
                    ELSE 'w' || (doc_id % 6) || ' a' || jj || ' b' || jj ||
                         ' c' || jj || ' d' || jj || ' e' || jj END AS line
        FROM (SELECT doc_id, j,
                     CASE WHEN j = 3 AND doc_id % 2 = 0 THEN 1 ELSE j END AS jj
              FROM (SELECT doc_id,
                           unnest(generate_series(0, 4 + doc_id % 3 - 1)) AS j
                    FROM ({_SENT_IDS_SQL})
                    UNION ALL
                    SELECT doc_id, unnest([50, 51]) AS j
                    FROM ({_SENT_IDS_SQL}) WHERE doc_id % 7 = 2))
"""


def _rep_topgram_sql(n: int) -> str:
    return f"""
    SELECT doc_id, CAST(max(c * length(g)) AS BIGINT) AS top{n}gram_chars
    FROM (
        SELECT doc_id, g, c, max(c) OVER (PARTITION BY doc_id) AS mc
        FROM (SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(list_transform(
                               range(1, len(t) - {n} + 2),
                               i -> array_to_string(t[i:i+{n - 1}], ' ')
                           )) AS g
                    FROM toks WHERE len(t) >= {n})
              GROUP BY doc_id, g)
    ) WHERE c = mc GROUP BY doc_id
    """


def _rep_dupcov_sql(n: int) -> str:
    # interval-UNION merge, mirroring the operator: a new island only when
    # the start clears the running max interval end (layered windows — the
    # DuckDB no-nested-window rule)
    return f"""
    SELECT doc_id, CAST(sum(len) AS BIGINT) AS dup{n}gram_tokens
    FROM (
        SELECT doc_id, isl, max(i) + {n} - min(i) AS len
        FROM (
            SELECT doc_id, i,
                   sum(nw) OVER (PARTITION BY doc_id ORDER BY i) AS isl
            FROM (
                SELECT doc_id, i,
                       CASE WHEN i >= coalesce(
                                max(i + {n}) OVER (
                                    PARTITION BY doc_id ORDER BY i
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING),
                                -1)
                            THEN 1 ELSE 0 END AS nw
                FROM (
                    SELECT doc_id, i,
                           count(*) OVER (PARTITION BY doc_id, g) AS c
                    FROM (SELECT doc_id, i,
                                 array_to_string(t[i:i+{n - 1}], ' ') AS g
                          FROM (SELECT doc_id, t,
                                       unnest(range(1, len(t) - {n} + 2))
                                           AS i
                                FROM toks WHERE len(t) >= {n}))
                ) WHERE c > 1
            )
        ) GROUP BY doc_id, isl
    ) GROUP BY doc_id
    """


@query(
    "gopher_repetition_signals",
    oracle=f"""
    WITH lines AS ({_REP_LINES_SQL}),
    doc AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY j) AS text
            FROM lines GROUP BY doc_id),
    toks AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '') AS t
             FROM doc),
    lstats AS (
        SELECT doc_id,
               CAST(sum(c) AS BIGINT) AS n_lines,
               CAST(coalesce(sum(c) FILTER (c > 1), 0) AS BIGINT)
                   AS n_dup_lines,
               CAST(coalesce(sum(c * length(line)) FILTER (c > 1), 0)
                    AS BIGINT) AS chars_dup_lines
        FROM (SELECT doc_id, line, count(*) AS c
              FROM lines GROUP BY doc_id, line)
        GROUP BY doc_id
    ),
    t2 AS ({_rep_topgram_sql(2)}),
    t3 AS ({_rep_topgram_sql(3)}),
    t4 AS ({_rep_topgram_sql(4)}),
    d5 AS ({_rep_dupcov_sql(5)}),
    d10 AS ({_rep_dupcov_sql(10)})
    SELECT CAST(toks.doc_id AS BIGINT) AS doc_id,
           CAST(len(t) AS BIGINT) AS n_tokens,
           lstats.n_lines, lstats.n_dup_lines, lstats.chars_dup_lines,
           coalesce(t2.top2gram_chars, 0) AS top2gram_chars,
           coalesce(t3.top3gram_chars, 0) AS top3gram_chars,
           coalesce(t4.top4gram_chars, 0) AS top4gram_chars,
           coalesce(d5.dup5gram_tokens, 0) AS dup5gram_tokens,
           coalesce(d10.dup10gram_tokens, 0) AS dup10gram_tokens
    FROM toks
    JOIN lstats ON toks.doc_id = lstats.doc_id
    LEFT JOIN t2 ON toks.doc_id = t2.doc_id
    LEFT JOIN t3 ON toks.doc_id = t3.doc_id
    LEFT JOIN t4 ON toks.doc_id = t4.doc_id
    LEFT JOIN d5 ON toks.doc_id = d5.doc_id
    LEFT JOIN d10 ON toks.doc_id = d10.doc_id
    """,
    description=(
        "Gopher/MassiveText repetition signals, the §A1.1 Table A1 "
        "subset beyond repetition_stats (textan."
        "gopher_repetition_signals): duplicate-line occurrences and "
        "their characters, most-frequent-{2,3,4}-gram character "
        "coverage (count x gram length, coverage-max under ties), and "
        "duplicated-{5,10}-gram TOKEN coverage as a merged-interval "
        "union (overlaps count once — the exact_substring islands "
        "machinery within one document; documented deviation: tokens, "
        "not characters). Residue synthesis: even docs repeat a line, "
        "d%7==2 docs carry an adjacent 11-token line twin (dup10 "
        "fires), odd docs are repetition-free — both directions "
        "non-vacuous; all-integer relation"
    ),
)
def gopher_repetition_signals(spark, sf_dir):
    ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(240)
    )
    d = F.col("doc_id")

    def line(j):
        jj = F.when((j == F.lit(3)) & (d % 2 == F.lit(0)), F.lit(1)).otherwise(
            j
        )
        return F.format_string(
            "w%d a%d b%d c%d d%d e%d", d % 6, jj, jj, jj, jj, jj
        )

    n = F.lit(4) + d % 3
    arr = F.transform(F.sequence(F.lit(0), n - 1), line)
    tail = F.format_string(
        "tail%d t1 t2 t3 t4 t5 t6 t7 t8 t9 t10", d % 6
    )
    arr = F.when(
        d % 7 == F.lit(2), F.concat(arr, F.array(tail, tail))
    ).otherwise(arr)
    docs = ids.select("doc_id", F.array_join(arr, "\n").alias("text"))
    out = TA.gopher_repetition_signals(
        docs, "doc_id", "text", top_ns=(2, 3, 4), dup_ns=(5, 10)
    )
    return out.select(big(F.col("doc_id")).alias("doc_id"), *out.columns[1:])


# ---------------------------------------------------------------------------
# C4 line/page cleaning (Raffel et al. §2.2, published rules). The fixture
# text is single-line, so the input is residue-coded synthesis again: a
# 240-doc multi-line corpus in which every rule fires — short lines
# (j%7==3), javascript lines (j%7==5), missing terminal punctuation
# ((d+j)%4==2), '{' pages (d%11==4), 'lorem ipsum' pages (d%13==6).
# ---------------------------------------------------------------------------

_C4_LINES_SQL = f"""
        SELECT doc_id, j,
               CASE WHEN j = 100 THEN '{{ code }}'
                    WHEN j = 101 THEN 'Lorem ipsum dolor sit.'
                    WHEN j % 7 = 3 THEN 'Hi.'
                    WHEN j % 7 = 5 THEN 'Use javascript here now.'
                    ELSE 'Alpha beta w' || (doc_id % 6) || ' j' || j ||
                         CASE (doc_id + j) % 5 WHEN 0 THEN '.'
                              WHEN 1 THEN '?' WHEN 2 THEN ''
                              WHEN 3 THEN '!'
                              ELSE CASE doc_id % 2 WHEN 0 THEN '."'
                                   ELSE '.”' END END
               END AS line
        FROM (
            SELECT doc_id, unnest(generate_series(0, 7 + doc_id % 3 - 1)) AS j
            FROM ({_SENT_IDS_SQL})
            UNION ALL
            SELECT doc_id, 100 AS j FROM ({_SENT_IDS_SQL}) WHERE doc_id % 11 = 4
            UNION ALL
            SELECT doc_id, 101 AS j FROM ({_SENT_IDS_SQL}) WHERE doc_id % 13 = 6
        )
"""


def _synth_c4_docs(spark, sf_dir):
    """Spark twin of _C4_LINES_SQL, assembled as newline-joined TEXT so
    the operator exercises its own line split end-to-end."""
    ids = (
        load(spark, sf_dir, "documents")
        .select("doc_id")
        .distinct()
        .orderBy("doc_id")
        .limit(240)
    )
    d = F.col("doc_id")

    def line(j):
        ending = (
            F.when((d + j) % 5 == F.lit(0), F.lit("."))
            .when((d + j) % 5 == F.lit(1), F.lit("?"))
            .when((d + j) % 5 == F.lit(2), F.lit(""))
            .when((d + j) % 5 == F.lit(3), F.lit("!"))
            # quote endings: the line rule's second branch — ASCII
            # close-quote after punctuation (even docs) and the bare
            # curly close-quote (odd docs)
            .otherwise(
                F.when(d % 2 == F.lit(0), F.lit('."')).otherwise(F.lit(".”"))
            )
        )
        return (
            F.when(j % 7 == F.lit(3), F.lit("Hi."))
            .when(j % 7 == F.lit(5), F.lit("Use javascript here now."))
            .otherwise(
                F.concat(
                    F.format_string("Alpha beta w%d j%d", d % 6, j), ending
                )
            )
        )

    n = F.lit(7) + d % 3
    arr = F.transform(F.sequence(F.lit(0), n - 1), line)
    arr = F.when(
        d % 11 == 4, F.concat(arr, F.array(F.lit("{ code }")))
    ).otherwise(arr)
    arr = F.when(
        d % 13 == 6, F.concat(arr, F.array(F.lit("Lorem ipsum dolor sit.")))
    ).otherwise(arr)
    return ids.select("doc_id", F.array_join(arr, "\n").alias("text"))


@query(
    "c4_line_page_filters",
    oracle=f"""
    WITH lines AS ({_C4_LINES_SQL}),
    judged AS (
        SELECT doc_id, j, line,
               regexp_matches(line, '[.!?]["'')\\]]*$|["”]$')
               AND len(list_filter(string_split_regex(line, '\\s+'),
                                   x -> x <> '')) >= 3
               AND NOT contains(lower(line), 'javascript') AS ok
        FROM lines
    ),
    per_doc AS (
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (ok) AS n_lines_kept,
               coalesce(string_agg(line, chr(10) ORDER BY j)
                        FILTER (ok), '') AS cleaned,
               string_agg(line, chr(10) ORDER BY j) AS full_text
        FROM judged GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_lines_kept AS BIGINT) AS n_lines_kept,
           CAST(len(list_filter(list_transform(
                    string_split_regex(cleaned, '[.!?]+'),
                    s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                    s -> s <> '')) AS BIGINT) AS n_sentences_kept,
           len(list_filter(list_transform(
                   string_split_regex(cleaned, '[.!?]+'),
                   s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                   s -> s <> '')) >= 3
               AND NOT contains(lower(full_text), '{{')
               AND NOT contains(lower(full_text), 'lorem ipsum') AS doc_kept,
           md5(cleaned) AS cleaned_hash
    FROM per_doc
    """,
    description=(
        "C4 line/page cleaning (textan.c4_line_filters — Raffel et al. "
        "arXiv 1910.10683 §2.2 published rules: lines must end in "
        "terminal punctuation, have >=3 words, no 'javascript'; pages "
        "need >=min sentences after filtering, no '{{', no 'lorem "
        "ipsum'). Residue-coded 240-doc multi-line corpus fires every "
        "rule (short/unterminated/javascript lines, brace and lorem "
        "pages); min_sentences=3 calibrated so the page verdict is "
        "non-vacuous both ways"
    ),
)
def c4_line_page_filters(spark, sf_dir):
    docs = _synth_c4_docs(spark, sf_dir)
    out = TA.c4_line_filters(
        docs, "doc_id", "text", min_sentences=3
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_lines",
        "n_lines_kept",
        "n_sentences_kept",
        "doc_kept",
        "cleaned_hash",
    )


# ---------------------------------------------------------------------------
# Fused hygiene signals: the ONE-SCAN relation (C4 + script mix + RedPajama
# in one projection chain — zero joins; the component composition costs
# four scans + three shuffles because Catalyst neither merges self-joins
# nor CSEs across consumers). Input: the c4 synthesis corpus extended with
# cyrillic (d%9==5), ellipsis-terminated (d%10==7) and bullet (d%6==1)
# lines so every fused column family is non-vacuous.
# ---------------------------------------------------------------------------

_HYG_LINES_SQL = f"""
        SELECT doc_id, j, line FROM ({_C4_LINES_SQL})
        UNION ALL
        SELECT doc_id, 102 AS j, 'кот мир да пример тест.' AS line
        FROM ({_SENT_IDS_SQL}) WHERE doc_id % 9 = 5
        UNION ALL
        SELECT doc_id, 103 AS j, 'to be continued maybe...' AS line
        FROM ({_SENT_IDS_SQL}) WHERE doc_id % 10 = 7
        UNION ALL
        SELECT doc_id, 104 AS j, '- bullet item alpha beta.' AS line
        FROM ({_SENT_IDS_SQL}) WHERE doc_id % 6 = 1
"""


def _synth_hyg_docs(spark, sf_dir):
    """_synth_c4_docs extended with the three extra line classes, appended
    in the same j order the oracle's string_agg produces."""
    docs = _synth_c4_docs(spark, sf_dir)
    d = F.col("doc_id")
    extra = F.concat(
        F.when(d % 9 == F.lit(5), F.lit("\nкот мир да пример тест."))
        .otherwise(F.lit("")),
        F.when(d % 10 == F.lit(7), F.lit("\nto be continued maybe..."))
        .otherwise(F.lit("")),
        F.when(d % 6 == F.lit(1), F.lit("\n- bullet item alpha beta."))
        .otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id", F.concat(F.col("text"), extra).alias("text")
    )


@query(
    "hygiene_signals_fused",
    oracle=f"""
    WITH lines AS ({_HYG_LINES_SQL}),
    doc AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY j) AS text
            FROM lines GROUP BY doc_id),
    judged AS (
        SELECT doc_id, j, line,
               regexp_matches(line, '[.!?]["'')\\]]*$|["”]$')
               AND len(list_filter(string_split_regex(line, '\\s+'),
                                   x -> x <> '')) >= 3
               AND NOT contains(lower(line), 'javascript') AS ok
        FROM lines
    ),
    perdoc AS (
        SELECT doc_id,
               count(*) AS n_lines,
               count(*) FILTER (ok) AS n_lines_kept,
               coalesce(string_agg(line, chr(10) ORDER BY j)
                        FILTER (ok), '') AS cleaned,
               count(*) FILTER (regexp_matches(line, '(\\.\\.\\.|…)$'))
                   AS n_lines_end_ellipsis,
               count(*) FILTER (regexp_matches(line, '^[-*•‣▶◦·]'))
                   AS n_lines_start_bullet
        FROM judged GROUP BY doc_id
    ),
    toks AS (SELECT doc_id,
                    list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x <> '') AS t,
                    text
             FROM doc)
    SELECT CAST(toks.doc_id AS BIGINT) AS doc_id,
        CAST(len(regexp_extract_all(text, '\\p{{Latin}}')) AS BIGINT)
            AS n_latin,
        CAST(len(regexp_extract_all(text, '\\p{{Cyrillic}}')) AS BIGINT)
            AS n_cyrillic,
        CAST(len(regexp_extract_all(text, '\\p{{Han}}')) AS BIGINT) AS n_han,
        CAST(len(regexp_extract_all(text, '\\p{{Arabic}}')) AS BIGINT)
            AS n_arabic,
        CAST(len(regexp_extract_all(text, '\\d')) AS BIGINT) AS n_digit,
        CAST(length(text) AS BIGINT) AS n_chars,
        CAST(len(regexp_extract_all(text, '#'))
             + len(regexp_extract_all(text, '\\.\\.\\.'))
             + len(regexp_extract_all(text, '…')) AS BIGINT) AS n_symbols,
        CAST(len(t) AS BIGINT) AS n_words,
        CAST(len(list_distinct(t)) AS BIGINT) AS n_unique_words,
        CAST(len(list_filter(t, x -> NOT regexp_matches(x, '[a-z]')))
             AS BIGINT) AS n_no_alph_words,
        CAST(perdoc.n_lines AS BIGINT) AS n_lines,
        CAST(perdoc.n_lines_end_ellipsis AS BIGINT) AS n_lines_end_ellipsis,
        CAST(perdoc.n_lines_start_bullet AS BIGINT) AS n_lines_start_bullet,
        CAST(perdoc.n_lines_kept AS BIGINT) AS n_lines_kept,
        CAST(len(list_filter(list_transform(
                 string_split_regex(cleaned, '[.!?]+'),
                 s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                 s -> s <> '')) AS BIGINT) AS n_sentences_kept,
        len(list_filter(list_transform(
                string_split_regex(cleaned, '[.!?]+'),
                s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                s -> s <> '')) >= 3
            AND NOT contains(lower(text), '{{')
            AND NOT contains(lower(text), 'lorem ipsum') AS doc_kept,
        md5(cleaned) AS cleaned_hash
    FROM toks JOIN perdoc ON toks.doc_id = perdoc.doc_id
    """,
    description=(
        "ONE-SCAN fused hygiene relation (textan.hygiene_signals — C4 "
        "line/page cleaning + Unicode-script mix + RedPajama signals in "
        "one projection chain; the component composition costs four "
        "scans + three id-joins since Catalyst neither merges self-joins "
        "nor CSEs across consumers — equivalence to that composition is "
        "pinned in tests, plan pinned one FileScan / zero exchanges). "
        "The c4 residue corpus extended with cyrillic, ellipsis and "
        "bullet lines so every column family is non-vacuous"
    ),
)
def hygiene_signals_fused(spark, sf_dir):
    docs = _synth_hyg_docs(spark, sf_dir)
    out = TA.hygiene_signals(docs, "doc_id", "text", min_sentences=3)
    return out.select(big(F.col("doc_id")).alias("doc_id"), *out.columns[1:])


@query(
    "streaming_hygiene_gate",
    oracle=f"""
    SELECT * FROM ({_REGISTRY["hygiene_signals_fused"].oracle})
    WHERE doc_kept
    """,
    description=(
        "The fused hygiene gate in CONTINUOUS INTAKE "
        "(streaming.intake.hygiene_intake_sink — stateless foreachBatch: "
        "canonicalize -> one-scan hygiene_signals -> C4 verdict gate, "
        "survivors appended with the cleaned body): three batches of the "
        "hygiene synthesis corpus; stateless means N batches == one shot "
        "UNCONDITIONALLY (no index, no arrival-order contract), so the "
        "oracle is hygiene_signals_fused's own restricted to doc_kept. "
        "Signals re-derived from the persisted corpus rows"
    ),
)
def streaming_hygiene_gate(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import hygiene_intake_sink

    docs = _synth_hyg_docs(spark, sf_dir)
    base = tempfile.mkdtemp(prefix="hygstream_")
    sink = hygiene_intake_sink(
        base + "/corpus", "doc_id", "text",
        canonicalize=False,  # the synthesis is already canonical text
        min_sentences=3,
        report_path=base + "/report",
    )
    for b, (lo, hi) in enumerate(((0, 80), (80, 160), (160, 1 << 31))):
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    # survivors carry the CLEANED body; re-derive the full signal relation
    # from the persisted corpus and splice the doc_kept=true verdict the
    # gate asserted (cleaned text re-judged keeps its own page verdict
    # only if cleaning is idempotent, which kept-lines rejoining is for
    # line counts but NOT for n_lines == raw; report carries the intake
    # signals, so read those instead — they ARE the oracle's relation)
    out = spark.read.parquet(base + "/report").where(F.col("doc_kept"))
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        *[c for c in out.columns if c not in ("doc_id", "batch_id")],
    )



@query(
    "streaming_curated_intake",
    oracle=f"""
    WITH lines AS ({_HYG_LINES_SQL}),
    judged AS (
        SELECT doc_id, j, line,
               regexp_matches(line, '[.!?]["'')\\]]*$|["”]$')
               AND len(list_filter(string_split_regex(line, '\\s+'),
                                   x -> x <> '')) >= 3
               AND NOT contains(lower(line), 'javascript') AS ok
        FROM lines
    ),
    doc AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY j) AS fulltext
            FROM lines GROUP BY doc_id),
    perdoc AS (
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY j) FILTER (ok), '')
                   AS cleaned
        FROM judged GROUP BY doc_id
    ),
    kept_docs AS (
        SELECT p.doc_id, p.cleaned AS text
        FROM perdoc p JOIN doc d ON p.doc_id = d.doc_id
        WHERE len(list_filter(list_transform(
                  string_split_regex(p.cleaned, '[.!?]+'),
                  s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                  s -> s <> '')) >= 3
          AND NOT contains(lower(d.fulltext), '{{')
          AND NOT contains(lower(d.fulltext), 'lorem ipsum')
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM kept_docs
    ),
    pos AS (
        SELECT doc_id, i,
               array_to_string(list_slice(t, i + 1, i + 5), ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 5)) AS i
              FROM toks WHERE len(t) >= 5) s
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY shingle ORDER BY doc_id, i) AS rn
        FROM pos
    ),
    dup AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
        FROM ranked WHERE rn > 1
    ),
    regions AS (
        SELECT doc_id, min(i) AS region_start, max(i) + 5 AS region_end
        FROM dup GROUP BY doc_id, isl
    ),
    tok_pos AS (
        SELECT doc_id, i, t[i + 1] AS tok
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1)) AS i
              FROM toks WHERE len(t) > 0)
    ),
    survivors AS (
        SELECT tp.doc_id, tp.i, tp.tok
        FROM tok_pos tp
        WHERE NOT EXISTS (SELECT 1 FROM regions r
                          WHERE r.doc_id = tp.doc_id
                            AND tp.i >= r.region_start
                            AND tp.i < r.region_end)
    )
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(len(t.t) AS BIGINT) AS n_tokens,
           CAST(len(t.t) - count(k.i) AS BIGINT) AS n_tokens_removed,
           md5(coalesce(string_agg(k.tok, ' ' ORDER BY k.i), ''))
               AS cleaned_hash
    FROM toks t LEFT JOIN survivors k ON t.doc_id = k.doc_id
    GROUP BY t.doc_id, len(t.t)
    """,
    description=(
        "TWO-STAGE continuous curation intake — the production ordering "
        "(cheap stateless gate BEFORE any index touches text): stage 1 is "
        "hygiene_intake_sink (one-scan fused C4/script/RedPajama gate, "
        "survivors carry the cleaned body), stage 2 is "
        "substring_intake_sink (Lee-et-al. exact-substring cut against "
        "the accumulating versioned shingle index) consuming stage 1's "
        "survivor corpus batch-by-batch. Three ascending-id batches; "
        "both stages are deterministic and arrival order == keep-first "
        "order, so N batches == one shot COMPOSED and the oracle is the "
        "hygiene oracle's kept/cleaned docs piped through the one-shot "
        "region+cut SQL (span 5; 184 regions over 177 of 201 survivors "
        "on the fixture, island merges to 33 tokens — both stages "
        "non-vacuous)"
    ),
)
def streaming_curated_intake(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import (
        hygiene_intake_sink,
        substring_intake_sink,
    )

    # one synthesis shared by the three batch jobs — checkpoint only,
    # no repartition (r11 A/B; see streaming_substring_cut)
    docs = _synth_hyg_docs(spark, sf_dir).transform(materialize)
    base = tempfile.mkdtemp(prefix="curstream_")
    gate = hygiene_intake_sink(
        base + "/survivors", "doc_id", "text",
        canonicalize=False,  # the synthesis is already canonical text
        min_sentences=3,
    )
    cut = substring_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        span_tokens=5, emit_text=False,
    )
    for b, (lo, hi) in enumerate(((0, 80), (80, 160), (160, 1 << 31))):
        rng = (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        gate(docs.where(rng), b)
        # stage 2 consumes stage 1's survivor corpus; the doc_id range
        # filter makes the read recompute-safe by construction (a re-scan
        # after a later gate append can only see out-of-range rows, which
        # the predicate drops — no localCheckpoint guard needed)
        cut(spark.read.parquet(base + "/survivors").where(rng), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_tokens",
        "n_tokens_removed",
        "cleaned_hash",
    )


@query(
    "corpus_mixture_sample",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    totals AS (SELECT source, sum(n_tokens) AS domain_tokens FROM base GROUP BY source),
    budgets(source, budget) AS (VALUES ('src0', 700), ('src1', 5000), ('src2', 300)),
    rates AS (
        SELECT t.source,
               CASE WHEN b.budget IS NULL OR t.domain_tokens <= 0 THEN 65536
                    ELSE CAST(floor(CAST(b.budget AS DOUBLE) / t.domain_tokens * 65536)
                              AS BIGINT) END AS thresh
        FROM totals t LEFT JOIN budgets b ON t.source = b.source
    )
    SELECT base.doc_id, base.source, base.n_tokens
    FROM base JOIN rates ON base.source = rates.source
    WHERE thresh >= 65536
       OR substr(md5(base.source || ':' || CAST(base.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', thresh)
    """,
    description=(
        "Token-budgeted corpus mixture sampling: per-domain rates "
        "min(1, budget/tokens) via md5 key-hash thresholds — deterministic "
        "membership, oracle-checked sample"
    ),
)
def corpus_mixture_sample(spark, sf_dir):
    out = TA.mixture_sample(
        load(spark, sf_dir, "documents"),
        "doc_id", "source", "text",
        budgets={"src0": 700, "src1": 5000, "src2": 300},
    )
    return out.select(big(F.col("doc_id")).alias("doc_id"), "source", "n_tokens")


# ---------------------------------------------------------------------------
# BPE tokenizer-training merge step: weighted adjacent-symbol-pair counts
# over the distinct-word table. Pair work scales with vocabulary, not corpus.
# ---------------------------------------------------------------------------

@query(
    "bpe_pair_merge_step",
    oracle=r"""
    WITH w AS (
        SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    ),
    wc AS (SELECT word, count(*) AS c FROM w GROUP BY word),
    ids AS (
        SELECT word, c, unnest(generate_series(1, len(word) - 1)) AS i
        FROM wc WHERE len(word) >= 2
    )
    SELECT substr(word, i, 2) AS pair,
           CAST(sum(c) AS BIGINT) AS cnt,
           CAST(count(DISTINCT word) AS BIGINT) AS n_words
    FROM ids GROUP BY pair ORDER BY cnt DESC, pair LIMIT 50
    """,
    description=(
        "One distributed BPE merge step: adjacent char-pair counts weighted "
        "by word frequency over the DISTINCT word table (work ∝ vocab, not "
        "corpus); top-50 merge candidates under a total order"
    ),
)
def bpe_pair_merge_step(spark, sf_dir):
    out = TA.bpe_pair_counts(load(spark, sf_dir, "documents"), "text")
    return (
        out.orderBy(F.col("cnt").desc(), F.col("pair"))
        .limit(50)
        .select("pair", big(F.col("cnt")).alias("cnt"),
                big(F.col("n_words")).alias("n_words"))
    )


# ---------------------------------------------------------------------------
# Per-document OOV rate vs the corpus's own top-k vocabulary: the
# integer-exact perplexity stand-in (rare-token-heavy docs score high).
# ---------------------------------------------------------------------------

@query(
    "doc_oov_rate",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                  x -> x <> '')) AS word
        FROM documents
    ),
    wc AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
    vocab AS (SELECT word FROM wc ORDER BY c DESC, word LIMIT 20)
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE v.word IS NULL) AS BIGINT) AS n_oov,
           CAST(count(*) FILTER (WHERE v.word IS NULL) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS oov_rate
    FROM toks t LEFT JOIN vocab v ON t.word = v.word
    GROUP BY t.doc_id
    """,
    description=(
        "Per-doc out-of-vocabulary rate against the corpus top-20 vocab — "
        "closed-vocab quality signal; integer-exact (no float-log "
        "perplexity determinism risk)"
    ),
)
def doc_oov_rate(spark, sf_dir):
    return TA.oov_stats(load(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Temperature (alpha=0.5) mixture sampling: domain weights ∝ sqrt(tokens),
# flattening the domain distribution instead of hard budgets. sqrt is
# IEEE-correctly-rounded, so the whole rate expression — and therefore the
# sampled MEMBERSHIP — is bit-identical cross-engine; the one cross-row sum
# (Σ sqrt weights) runs in exact DECIMAL(18,6) per the dsum rule.
# ---------------------------------------------------------------------------

@query(
    "mixture_temperature_sample",
    oracle=r"""
    WITH base AS (
        SELECT doc_id, source,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    totals AS (SELECT source, sum(n_tokens) AS t FROM base GROUP BY source),
    wsum AS (
        SELECT CAST(sum(CAST(sqrt(CAST(t AS DOUBLE)) AS DECIMAL(18,6)))
                    AS DOUBLE) AS W
        FROM totals
    ),
    rates AS (
        SELECT source,
               CASE WHEN t <= 0 THEN CAST(65536 AS BIGINT)
                    ELSE least(CAST(65536 AS BIGINT),
                               CAST(floor(sqrt(CAST(t AS DOUBLE)) / W
                                          * CAST(8000 AS DOUBLE)
                                          / CAST(t AS DOUBLE) * 65536)
                                    AS BIGINT)) END AS thresh
        FROM totals, wsum
    )
    SELECT base.doc_id, base.source, base.n_tokens
    FROM base JOIN rates ON base.source = rates.source
    WHERE thresh >= 65536
       OR substr(md5(base.source || ':' || CAST(base.doc_id AS VARCHAR)), 1, 4)
          < printf('%04x', thresh)
    """,
    description=(
        "Temperature mixture sampling (alpha=0.5): per-domain keep-rates "
        "∝ sqrt(tokens) normalized to an 8000-token target, md5-hash "
        "membership — deterministic sample, oracle-checked end to end"
    ),
)
def mixture_temperature_sample(spark, sf_dir):
    out = TA.temperature_mixture_sample(
        load(spark, sf_dir, "documents"),
        "doc_id", "source", "text",
        target_tokens=8000, alpha=0.5,
    )
    return out.select(big(F.col("doc_id")).alias("doc_id"), "source", "n_tokens")


# ---------------------------------------------------------------------------
# Gopher-style rule filter + the corpus quality dashboard rollup.
# Thresholds are fixture-calibrated (synthetic docs run 10-99 tokens with
# mean word length 3.7-5.3) so every rule splits the corpus non-vacuously;
# the operator's defaults are the published Gopher bands.
# ---------------------------------------------------------------------------

_GOPHER_ORACLE = """
WITH t AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
), s AS (
    SELECT doc_id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CASE WHEN len(toks) > 0
             THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS mean_word_len,
        CASE WHEN len(toks) > 0
             THEN 1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS dup_token_frac,
        CAST(len(list_filter(list_distinct(toks),
                 x -> list_contains(['the','a','of','and','to','in'], x))) AS BIGINT)
            AS n_stopwords_distinct
    FROM t
)
SELECT doc_id, n_words, mean_word_len, dup_token_frac, n_stopwords_distinct,
    (n_words >= 30 AND n_words <= 90) AS word_count_ok,
    (mean_word_len >= 3.0 AND mean_word_len <= 4.5) AS mean_len_ok,
    (dup_token_frac <= 0.6) AS dup_ok,
    (n_stopwords_distinct >= 2) AS stopword_ok,
    ((n_words >= 30 AND n_words <= 90)
     AND (mean_word_len >= 3.0 AND mean_word_len <= 4.5)
     AND dup_token_frac <= 0.6
     AND n_stopwords_distinct >= 2) AS passes_gopher
FROM s
"""


@query(
    "gopher_quality_flags",
    oracle=_GOPHER_ORACLE,
    description="Gopher/MassiveText token-level quality rules, each flag exposed + conjunction (fixture-calibrated bands)",
)
def gopher_quality_flags_q(spark, sf_dir):
    return TA.gopher_quality_flags(
        load(spark, sf_dir, "documents"),
        "doc_id",
        "text",
        min_words=30,
        max_words=90,
        min_mean_word_len=3.0,
        max_mean_word_len=4.5,
        max_dup_token_frac=0.6,
        min_distinct_stopwords=2,
    )


_QUALITY_REPORT_ORACLE = """
WITH t AS (
    SELECT lang, source,
           list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '') AS toks
    FROM documents
), s AS (
    SELECT lang, source,
        CAST(len(toks) AS BIGINT) AS n_words,
        CASE WHEN len(toks) > 0
             THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS mean_word_len,
        CASE WHEN len(toks) > 0
             THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
             ELSE 0.0 END AS diversity
    FROM t
)
SELECT lang,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
    CAST(sum(n_words) AS BIGINT) AS total_words,
    CAST(CAST(avg(mean_word_len) AS DECIMAL(38,6)) AS DOUBLE) AS avg_word_len,
    CAST(CAST(avg(diversity) AS DECIMAL(38,6)) AS DOUBLE) AS avg_diversity,
    CAST(sum(CASE WHEN n_words >= 30 AND n_words <= 90 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_in_word_band
FROM s
GROUP BY lang
"""


@query(
    "corpus_quality_report",
    oracle=_QUALITY_REPORT_ORACLE,
    description="Per-language corpus quality dashboard: doc/source counts, exact word totals, davg word-length/diversity, band counts",
)
def corpus_quality_report(spark, sf_dir):
    from data_etl_with_dbt_spark.suite.registry import davg

    docs = load(spark, sf_dir, "documents")
    toks = TA.tokens_expr(F.col("text"))
    n = F.size("__t")
    per_doc = docs.select(
        F.col("lang"),
        F.col("source"),
        toks.alias("__t"),
    ).select(
        "lang",
        "source",
        n.cast("bigint").alias("n_words"),
        F.when(
            n > 0,
            F.aggregate(
                "__t", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / n.cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("mean_word_len"),
        F.when(
            n > 0, F.size(F.array_distinct("__t")).cast("double") / n.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("diversity"),
    )
    return per_doc.groupBy("lang").agg(
        big(F.count(F.lit(1))).alias("n_docs"),
        big(F.countDistinct("source")).alias("n_sources"),
        F.sum("n_words").cast("bigint").alias("total_words"),
        davg(F.col("mean_word_len")).alias("avg_word_len"),
        davg(F.col("diversity")).alias("avg_diversity"),
        big(
            F.sum(
                F.when(
                    (F.col("n_words") >= 30) & (F.col("n_words") <= 90), 1
                ).otherwise(0)
            )
        ).alias("n_in_word_band"),
    )


# ---------------------------------------------------------------------------
# Corpus-level boilerplate pruning by n-gram document frequency (the
# RefinedWeb/CCNet boilerplate-removal shape — drop ALL occurrences,
# including the first, unlike dedup_spans_keep_first). Fixture-calibrated:
# at 5-token spans and min_df=3 the documents table has 35-41 boilerplate
# spans at sf0.01/sf0.001 — non-vacuous at both driver scales.
# ---------------------------------------------------------------------------

@query(
    "boilerplate_ngram_prune",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
        FROM documents
    ),
    spans AS (
        SELECT doc_id, CAST(start / 5 AS BIGINT) AS pos,
               array_to_string(list_slice(t, start + 1, start + 5), ' ') AS span
        FROM (SELECT doc_id, t,
                     unnest(generate_series(0, greatest(len(t) - 1, 0), 5)) AS start
              FROM toks) s
        WHERE len(list_slice(t, start + 1, start + 5)) > 0
    ),
    bp AS (SELECT span FROM spans GROUP BY span HAVING count(DISTINCT doc_id) >= 3),
    marked AS (
        SELECT s.doc_id, s.pos, s.span, b.span IS NOT NULL AS is_bp
        FROM spans s LEFT JOIN bp b ON s.span = b.span
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_spans,
           CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_spans_dropped,
           CAST(sum(CASE WHEN is_bp THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE) AS boilerplate_frac,
           md5(coalesce(string_agg(CASE WHEN NOT is_bp THEN span END, ' ' ORDER BY pos), ''))
               AS kept_hash
    FROM marked GROUP BY doc_id
    """,
    description=(
        "Boilerplate pruning by n-gram document frequency (RefinedWeb "
        "shape): 5-token spans seen in >=3 distinct docs are dropped from "
        "ALL docs (first occurrence included), documents reassembled"
    ),
)
def boilerplate_ngram_prune(spark, sf_dir):
    out = D.ngram_df_prune(
        load(spark, sf_dir, "documents"), "doc_id", "text",
        span_tokens=5, min_df=3,
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_spans", "n_spans_dropped", "boilerplate_frac", "kept_hash",
    )


# ---------------------------------------------------------------------------
# Full iterative BPE training. No SQL oracle — the merge loop is an
# iterative algorithm (driver records a rows-only check); the strong check
# is tests/test_operators.py's pure-Python reference BPE, which must agree
# merge-for-merge on the same corpus.
# ---------------------------------------------------------------------------

@query(
    "bpe_train_merges",
    oracle=None,  # iterative algorithm: K driver-coordinated merge rounds
    description=(
        "Iterative BPE tokenizer training (8 merges): weighted pair count "
        "-> total-order argmax -> greedy merge fold, corpus scanned once, "
        "every round vocabulary-sized"
    ),
)
def bpe_train_merges(spark, sf_dir):
    merges = TA.train_bpe(
        load(spark, sf_dir, "documents"), "text", num_merges=8
    )
    return spark.createDataFrame(
        [(m["step"], m["left"], m["right"], m["merged"], m["cnt"]) for m in merges],
        "step bigint, left string, right string, merged string, cnt bigint",
    )


# ---------------------------------------------------------------------------
# GPT-style packed pretraining windows: the corpus as ONE token stream
# (EOS-separated, doc_id order), sliced into fixed windows that cross
# document boundaries. The oracle is the single-threaded row_number
# spelling; the Spark side must reproduce the exact assignment from the
# bucketed distributed index — proving the offset arithmetic over the
# EXPLODED token stream, the true corpus-scale use of global_row_index.
# ---------------------------------------------------------------------------

@query(
    "packed_token_windows",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               list_append(
                   list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
                   '<eos>') AS t
        FROM documents
    ),
    flat AS (
        SELECT doc_id, i, t[i] AS tok,
               row_number() OVER (ORDER BY doc_id, i) - 1 AS idx
        FROM toks, unnest(generate_series(1, len(t))) AS s(i)
    )
    SELECT CAST(idx // 64 AS BIGINT) AS window_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           md5(string_agg(tok, ' ' ORDER BY idx)) AS window_hash
    FROM flat GROUP BY 1
    """,
    description=(
        "GPT-style packed pretraining windows: EOS-joined corpus token "
        "stream sliced into fixed 64-token examples crossing doc "
        "boundaries; global token index via the bucketed distributed plan"
    ),
)
def packed_token_windows(spark, sf_dir):
    return TA.packed_token_windows(
        load(spark, sf_dir, "documents"), "doc_id", "text", window_tokens=64
    )


@query(
    "chunked_documents_overlap",
    oracle=r"""
    WITH src AS (SELECT DISTINCT doc_id, text FROM documents),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        FROM src
    ),
    nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    nc AS (
        SELECT doc_id, t,
               CASE WHEN n <= 30 THEN 1
                    ELSE 1 + (n - 30 + 19) // 20 END AS n_chunks
        FROM nn
    ),
    ch AS (
        SELECT doc_id, n_chunks, t,
               unnest(generate_series(0, n_chunks - 1)) AS chunk_id
        FROM nc
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(chunk_id * 20 AS BIGINT) AS chunk_start,
           CAST(len(list_slice(t, chunk_id * 20 + 1, chunk_id * 20 + 30))
                AS BIGINT) AS chunk_len,
           md5(array_to_string(
               list_slice(t, chunk_id * 20 + 1, chunk_id * 20 + 30), ' '))
               AS chunk_hash
    FROM ch
    """,
    description=(
        "Overlapping token-window chunking (textan.chunk_documents — the "
        "RAG/context-window prep packed_token_windows is not: windows "
        "stay INSIDE document boundaries, consecutive chunks overlap by "
        "chunk-stride tokens, the last chunk always reaches the doc end "
        "and no redundant suffix chunk is emitted): chunk 30 / stride 20 "
        "over the documents table, chunk body as md5 (hash-not-payload). "
        "Integer chunk-count arithmetic spelled DIV/// on both sides "
        "(the double-narrowing trap); one projection chain, zero "
        "shuffles, no UDFs"
    ),
)
def chunked_documents_overlap(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").distinct()
    out = TA.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=30, stride=20
    )
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "chunk_id",
        "n_chunks",
        "chunk_start",
        "chunk_len",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


@query(
    "chunk_dedup_stats",
    oracle=r"""
    WITH src AS (SELECT DISTINCT doc_id, text FROM documents),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        FROM src
    ),
    nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    nc AS (
        SELECT doc_id, t,
               CASE WHEN n <= 30 THEN 1
                    ELSE 1 + (n - 30 + 19) // 20 END AS n_chunks
        FROM nn
    ),
    ch AS (
        SELECT doc_id, t,
               unnest(generate_series(0, n_chunks - 1)) AS i
        FROM nc
    ),
    bodies AS (
        SELECT doc_id, i,
               md5(array_to_string(
                   list_slice(t, i * 20 + 1, i * 20 + 30), ' ')) AS h
        FROM ch
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY h ORDER BY doc_id, i) AS rn
        FROM bodies
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(count(*) FILTER (rn > 1) AS BIGINT) AS n_dup_chunks
    FROM ranked GROUP BY doc_id
    """,
    description=(
        "Chunk-level exact dedup accounting — the RAG preprocessing step "
        "after chunk_documents (dedupe chunks by content BEFORE paying "
        "embedding cost): global keep-first by (doc_id, chunk_id) over "
        "md5(chunk body) — the HASH rides the exchange, never the chunk "
        "text (the dedup family convention) — rolled up to per-doc total "
        "and duplicate chunk counts. The fixture's planted duplicate "
        "spans align on the stride grid often enough to be non-vacuous "
        "(48 dup chunks at sf0.001, 41 at sf0.01 under chunk 30 / "
        "stride 20)"
    ),
)
def chunk_dedup_stats(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").select("doc_id", "text").distinct()
    chunks = TA.chunk_documents(
        docs, "doc_id", "text", chunk_tokens=30, stride=20
    )
    w = Window.partitionBy(F.md5(F.col("chunk_text"))).orderBy(
        "doc_id", "chunk_id"
    )
    ranked = chunks.select(
        "doc_id", "chunk_id", F.row_number().over(w).alias("__rn")
    )
    return ranked.groupBy("doc_id").agg(
        big(F.count(F.lit(1))).alias("n_chunks"),
        big(F.sum(F.when(F.col("__rn") > 1, 1).otherwise(0))).alias(
            "n_dup_chunks"
        ),
    ).select(big(F.col("doc_id")).alias("doc_id"), "n_chunks", "n_dup_chunks")


@query(
    "streaming_chunk_dedup",
    oracle=r"""
    WITH src AS (SELECT DISTINCT doc_id, text FROM documents),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
        FROM src
    ),
    nn AS (SELECT doc_id, t, len(t) AS n FROM toks WHERE len(t) > 0),
    nc AS (
        SELECT doc_id, t,
               CASE WHEN n <= 30 THEN 1
                    ELSE 1 + (n - 30 + 19) // 20 END AS n_chunks
        FROM nn
    ),
    ch AS (
        SELECT doc_id, t, n_chunks,
               unnest(generate_series(0, n_chunks - 1)) AS i
        FROM nc
    ),
    bodies AS (
        SELECT doc_id, i, n_chunks,
               array_to_string(
                   list_slice(t, i * 20 + 1, i * 20 + 30), ' ') AS body,
               len(list_slice(t, i * 20 + 1, i * 20 + 30)) AS blen
        FROM ch
    ),
    ranked AS (
        SELECT doc_id, i, n_chunks, body, blen,
               row_number() OVER (PARTITION BY body ORDER BY doc_id, i)
                   AS rn
        FROM bodies
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(i AS BIGINT) AS chunk_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(i * 20 AS BIGINT) AS chunk_start,
           CAST(blen AS BIGINT) AS chunk_len,
           md5(body) AS chunk_hash
    FROM ranked WHERE rn = 1
    """,
    description=(
        "CHUNK-granularity dedup in CONTINUOUS INTAKE "
        "(streaming.intake.chunk_intake_sink — chunk_documents per batch, "
        "whole duplicate chunks dropped against the accumulating "
        "versioned chunk-hash index, keep-first by (doc_id, chunk_id)): "
        "three ascending-id batches; chunks never span documents, so "
        "batch boundaries are invisible and the survivor corpus EQUALS "
        "the one-shot global keep-first — the oracle is that one-shot "
        "SQL. The chunk-level member of the Lee-pipeline sink family "
        "(drop whole duplicate chunks before paying embedding cost)"
    ),
)
def streaming_chunk_dedup(spark, sf_dir):
    import tempfile

    from data_etl_with_dbt_spark.streaming.intake import chunk_intake_sink

    # shared scan+distinct, checkpoint only — no repartition (r11 A/B;
    # see streaming_substring_cut)
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(materialize)
    )
    base = tempfile.mkdtemp(prefix="chunkstream_")
    sink = chunk_intake_sink(
        base + "/index", base + "/corpus", "doc_id", "text",
        chunk_tokens=30, stride=20,
    )
    for b, (lo, hi) in enumerate(((0, 170), (170, 340), (340, 1 << 31))):
        sink(docs.where((F.col("doc_id") >= lo) & (F.col("doc_id") < hi)), b)
    out = spark.read.parquet(base + "/corpus")
    return out.select(
        big(F.col("doc_id")).alias("doc_id"),
        "chunk_id",
        "n_chunks",
        "chunk_start",
        "chunk_len",
        F.md5(F.col("chunk_text")).alias("chunk_hash"),
    )


# ---------------------------------------------------------------------------
# BPE corpus ENCODING — the deployment half of bpe_train_merges: apply the
# learned merge table to every document and emit per-doc token statistics
# plus an order-sensitive fingerprint of the id sequence (hash-not-payload
# convention). Rows-only by design (the merge table is the output of an
# iterative driver-coordinated loop); encode agreement against a reference
# Python BPE is pytest-asserted, and the heavy stage runs on the DISTINCT
# word table with the corpus contributing one scan + one broadcast join.
# ---------------------------------------------------------------------------

@query(
    "bpe_encode_documents",
    oracle=None,  # merges come from the iterative trainer; agreement pytest-checked
    description=(
        "Encode documents into BPE token ids under 8 trained merges: "
        "per-doc word/token counts + md5 fingerprint of the id sequence "
        "(vocabulary-sized merge work, corpus joins by broadcast)"
    ),
)
def bpe_encode_documents(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    merges = TA.train_bpe(docs, "text", num_merges=8)
    enc = TA.bpe_encode(docs, "doc_id", "text", merges)
    per_doc = enc.groupBy("doc_id").agg(
        big(F.count(F.lit(1))).alias("n_words"),
        big(F.sum(F.size("ids"))).alias("n_bpe_tokens"),
        F.md5(
            F.array_join(
                F.flatten(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                        lambda s: s["ids"],
                    )
                ).cast("array<string>"),
                " ",
            )
        ).alias("ids_fingerprint"),
    )
    return per_doc.select(
        big(F.col("doc_id")).alias("doc_id"), "n_words", "n_bpe_tokens", "ids_fingerprint"
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters over the corpus token stream — frequency
# estimation from a depth*width cell relation (KBs) instead of a
# vocabulary-sized exact count. Rows-only by design (cell hashing is
# xxhash64, Spark-specific); the exact companions are explode_word_counts /
# vocab_coverage_topk, and the no-undercount + merge-linearity guarantees
# are property-tested in tests/test_operators.py.
# ---------------------------------------------------------------------------

@query(
    "cms_token_counts",
    oracle=None,  # sketch cells hash with xxhash64 (engine-specific); exact companion: explode_word_counts
    description=(
        "Count-min sketch (4x4096 cells) over document tokens: top-20 "
        "estimated heavy hitters — sublinear-space frequency, mergeable "
        "across shards by cell-wise sum"
    ),
)
def cms_token_counts(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.sketch import cms_build, cms_estimate

    # the exploded token stream feeds BOTH the sketch build and the
    # distinct probe set: cut lineage so the explode+tokenize runs once
    toks = (
        load(spark, sf_dir, "documents")
        .select(F.explode(TA.tokens_expr(F.col("text"))).alias("token"))
        .transform(materialize, eager=True)
    )
    cms = cms_build(toks, "token", depth=4, width=4096)
    distinct = toks.distinct()
    est = cms_estimate(cms, distinct, "token", depth=4, width=4096)
    return (
        est.select("token", big(F.col("est_count")).alias("est_count"))
        .orderBy(F.col("est_count").desc(), "token")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Deterministic negative sampling for contrastive training: each document
# draws k pseudo-random negatives from the corpus via md5 of (doc_id, draw
# index) — a pure per-row expression, so the pairing is reproducible across
# reruns, repartitioning, and engines (oracle-checked membership, the
# stratified-sample convention). The candidate id joins back to documents
# (semi join) so only real docs survive, and accidental self-pairs drop.
# At 100 TB: one explode (k rows per doc) + one key join, no RNG state.
# ---------------------------------------------------------------------------

@query(
    "negative_samples_documents",
    oracle="""
    WITH du AS (SELECT DISTINCT doc_id FROM documents),
    draws AS (
        SELECT d.doc_id,
               CAST(t.j AS BIGINT) AS neg_rank,
               CAST(CAST('0x' || substr(md5('neg:' || CAST(d.doc_id AS VARCHAR)
                    || ':' || CAST(t.j AS VARCHAR)), 1, 6) AS BIGINT) % n.n AS BIGINT) AS neg_doc_id
        FROM du d
        CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n FROM du) n
        CROSS JOIN range(4) t(j)
    )
    SELECT draws.doc_id, neg_rank, neg_doc_id
    FROM draws
    JOIN du neg ON neg.doc_id = draws.neg_doc_id
    WHERE draws.neg_doc_id <> draws.doc_id
    """,
    description=(
        "Deterministic contrastive negative sampling: 4 md5-drawn negatives "
        "per doc, membership oracle-checked — no RNG state, reproducible "
        "pairing at any scale"
    ),
)
def negative_samples_documents(spark, sf_dir):
    # distinct doc_id universe: the modulus and the membership join must
    # both see one row per document (dup2-tolerant, oracle mirrors)
    docs = load(spark, sf_dir, "documents").select("doc_id").distinct()
    n = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    draws = (
        docs.select("doc_id")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"),
            "n",
        )
        .select(
            "doc_id",
            F.col("j").cast("bigint").alias("neg_rank"),
            (
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit("neg:"),
                                F.col("doc_id").cast("string"),
                                F.lit(":"),
                                F.col("j").cast("string"),
                            )
                        ),
                        1,
                        6,
                    ),
                    16,
                    10,
                ).cast("bigint")
                % F.col("n")
            ).alias("neg_doc_id"),
        )
    )
    real = docs.select(F.col("doc_id").alias("neg_doc_id"))
    return (
        draws.join(real, "neg_doc_id", "semi")
        .where(F.col("neg_doc_id") != F.col("doc_id"))
        .select(big(F.col("doc_id")).alias("doc_id"), "neg_rank", "neg_doc_id")
    )


# ---------------------------------------------------------------------------
# Epoch UPSAMPLING for dataset mixtures — the other half of mixture_sample
# (which only downsamples): a source weighted "2.3 epochs" repeats every
# doc twice and a deterministic md5-chosen 30% a third time, so the
# realized mixture hits the fractional target with zero RNG state. The
# repeat fanout is explode(sequence(1, reps)) — row-local, scan-parallel;
# at 100 TB the copies never materialize as storage, they are plan-time
# fanout feeding the shuffle/packing stage downstream.
# ---------------------------------------------------------------------------

@query(
    "corpus_epoch_upsample",
    oracle="""
    WITH w AS (
        SELECT doc_id, source,
               CASE WHEN source IN ('src0', 'src1', 'src2') THEN 2 ELSE 1 END
                   + CASE WHEN substr(md5('ep:' || CAST(doc_id AS VARCHAR)), 1, 4) <
                               CASE WHEN source IN ('src0', 'src1', 'src2') THEN '4ccc'
                                    WHEN source IN ('src3', 'src4') THEN '8000'
                                    ELSE '0000' END
                          THEN 1 ELSE 0 END AS reps
        FROM documents
    )
    SELECT doc_id, source, CAST(r.i + 1 AS BIGINT) AS copy_id
    FROM w CROSS JOIN range(4) r(i)
    WHERE r.i < reps
    """,
    description=(
        "Fractional-epoch upsampling (src0-2 at 2.3x, src3-4 at 1.5x, rest "
        "1x): deterministic md5-chosen extra copies hit the fractional "
        "target with no RNG — the mixture-weights half mixture_sample "
        "can't do"
    ),
)
def corpus_epoch_upsample(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    whole = F.when(F.col("source").isin("src0", "src1", "src2"), 2).otherwise(1)
    frac_threshold = (
        F.when(F.col("source").isin("src0", "src1", "src2"), "4ccc")  # 2.3 epochs
        .when(F.col("source").isin("src3", "src4"), "8000")           # 1.5 epochs
        .otherwise("0000")                                            # 1 epoch
    )
    bucket = F.substring(
        F.md5(F.concat(F.lit("ep:"), F.col("doc_id").cast("string"))), 1, 4
    )
    reps = whole + F.when(bucket < frac_threshold, 1).otherwise(0)
    return docs.select(
        big(F.col("doc_id")).alias("doc_id"),
        "source",
        F.explode(F.sequence(F.lit(1), reps)).alias("copy_id"),
    ).select("doc_id", "source", big(F.col("copy_id")).alias("copy_id"))


# ---------------------------------------------------------------------------
# Length-bucketed batching — group similar-length docs into fixed-size
# batches so per-batch padding waste is bounded (the dynamic-batching
# trick in every serious training/inference loader). Buckets come from
# percentile_disc decile BOUNDARIES (one aggregation, broadcast back as a
# 1-row frame, bucket = counting boundaries below you) — NOT a global
# ntile window, which would be a corpus-sized single-partition sort at
# scale. Batch numbering within a bucket is a 10-way-parallel window; at
# extreme per-bucket cardinality the bucketed global-index machinery
# (global_row_index) replaces it — same trade documented there.
# ---------------------------------------------------------------------------

@query(
    "length_bucketed_batches",
    oracle=r"""
    WITH toks AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
        FROM documents
    ),
    cuts AS (
        SELECT quantile_disc(n_tokens, 0.1) AS c1, quantile_disc(n_tokens, 0.2) AS c2,
               quantile_disc(n_tokens, 0.3) AS c3, quantile_disc(n_tokens, 0.4) AS c4,
               quantile_disc(n_tokens, 0.5) AS c5, quantile_disc(n_tokens, 0.6) AS c6,
               quantile_disc(n_tokens, 0.7) AS c7, quantile_disc(n_tokens, 0.8) AS c8,
               quantile_disc(n_tokens, 0.9) AS c9
        FROM toks
    ),
    b AS (
        SELECT doc_id, n_tokens,
               CAST(1 + CASE WHEN n_tokens > c1 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c2 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c3 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c4 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c5 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c6 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c7 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c8 THEN 1 ELSE 0 END
                      + CASE WHEN n_tokens > c9 THEN 1 ELSE 0 END AS BIGINT) AS bucket
        FROM toks CROSS JOIN cuts
    ),
    r AS (
        SELECT doc_id, n_tokens, bucket,
               row_number() OVER (PARTITION BY bucket ORDER BY n_tokens, doc_id) AS rn
        FROM b
    )
    SELECT doc_id, n_tokens, bucket, CAST((rn - 1) // 16 AS BIGINT) AS batch_id
    FROM r
    """,
    description=(
        "Length-bucketed batching: decile buckets from percentile_disc "
        "boundaries (broadcast compare, no global sort), contiguous "
        "batches of 16 within each bucket — bounded padding waste for "
        "training/inference loaders"
    ),
)
def length_bucketed_batches(spark, sf_dir):
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    # toks feeds TWO consumers (the percentile cuts and the bucket join);
    # no cross-consumer CSE means the per-doc tokenize — the only
    # corpus-sized stage — would run twice without the cut
    toks = docs.select(
        "doc_id", F.size(TA.tokens_expr(F.col("text"))).cast("bigint").alias("n_tokens")
    ).transform(materialize)
    cuts = toks.agg(
        *[
            F.expr(
                f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY n_tokens)"
            ).alias(f"c{i}")
            for i in range(1, 10)
        ]
    )
    bucket = F.lit(1)
    for i in range(1, 10):
        bucket = bucket + F.when(F.col("n_tokens") > F.col(f"c{i}"), 1).otherwise(0)
    b = toks.crossJoin(F.broadcast(cuts)).select(
        "doc_id", "n_tokens", bucket.cast("bigint").alias("bucket")
    )
    wr = Window.partitionBy("bucket").orderBy("n_tokens", "doc_id")
    # integer division spelled DIV (the cast-rounding rule: a double->int
    # cast would round in DuckDB and truncate in Spark)
    return b.select(
        big(F.col("doc_id")).alias("doc_id"),
        "n_tokens",
        "bucket",
        F.row_number().over(wr).alias("__rn"),
    ).select(
        "doc_id", "n_tokens", "bucket", big(F.expr("(__rn - 1) DIV 16")).alias("batch_id")
    )


# ---------------------------------------------------------------------------
# Zipf exponent of the corpus vocabulary — fit ln(freq) ~ a + s*ln(rank)
# by OLS; natural text sits near s = -1, and a corpus drifting away from
# its usual exponent is a cheap distribution-shift alarm (template spam
# pushes it shallower, dedup of head terms steeper). Rank assignment is a
# vocabulary-sized window (metadata, not corpus); the logs are dec6-
# quantized per value (libm rule) and the OLS runs on decimal-exact
# component sums, the agg_linear_regression machinery.
# ---------------------------------------------------------------------------

@query(
    "zipf_exponent_vocab",
    oracle=r"""
    WITH freq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS f
        FROM (
            SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS term
            FROM documents
        )
        GROUP BY term
    ),
    ranked AS (
        SELECT CAST(CAST(ln(CAST(row_number() OVER (ORDER BY f DESC, term) AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE) AS lx,
               CAST(CAST(ln(CAST(f AS DOUBLE)) AS DECIMAL(38,6)) AS DOUBLE) AS ly
        FROM freq
    ),
    comp AS (
        SELECT CAST(count(*) AS DOUBLE) AS n,
               CAST(SUM(CAST(lx AS DECIMAL(18,6))) AS DOUBLE) AS sx,
               CAST(SUM(CAST(ly AS DECIMAL(18,6))) AS DOUBLE) AS sy,
               CAST(SUM(CAST(lx * ly AS DECIMAL(18,6))) AS DOUBLE) AS sxy,
               CAST(SUM(CAST(lx * lx AS DECIMAL(18,6))) AS DOUBLE) AS sxx
        FROM ranked
    )
    SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS zipf_exponent,
           CAST(n AS BIGINT) AS n_vocab
    FROM comp
    """,
    description=(
        "Zipf exponent of the vocabulary (OLS of ln freq on ln rank, "
        "decimal-exact components): natural text ~ -1; drift is a cheap "
        "corpus-shift alarm"
    ),
)
def zipf_exponent_vocab(spark, sf_dir):
    from pyspark.sql import Window

    from data_etl_with_dbt_spark.suite.registry import dec6, dsum

    docs = load(spark, sf_dir, "documents")
    freq = (
        docs.select(F.explode(TA.tokens_expr(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("f"))
    )
    w = Window.orderBy(F.desc("f"), F.asc("term"))
    ranked = freq.select(
        dec6(F.log(F.row_number().over(w).cast("double"))).alias("lx"),
        dec6(F.log(F.col("f").cast("double"))).alias("ly"),
    )
    comp = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dsum(F.col("lx")).alias("sx"),
        dsum(F.col("ly")).alias("sy"),
        dsum(F.col("lx") * F.col("ly")).alias("sxy"),
        dsum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return comp.select(slope.alias("zipf_exponent"), big(F.col("n")).alias("n_vocab"))


# ---------------------------------------------------------------------------
# Entity resolution end to end: blocking -> Levenshtein match graph ->
# connected components -> canonical entity per cluster. The transitive
# step is what pair output can't express (A~B, B~C => one entity even
# when dist(A, C) exceeds the threshold); the oracle replays the same
# fixpoint as a recursive CTE.
# ---------------------------------------------------------------------------

@query(
    "part_entity_clusters",
    oracle="""
    WITH RECURSIVE pu AS (
        SELECT DISTINCT p_partkey, p_name, p_brand FROM part
    ), pairs AS (
        SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
        FROM pu a JOIN pu b
          ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 2
    ), sym AS (
        SELECT id_a AS s, id_b AS d FROM pairs
        UNION ALL
        SELECT id_b AS s, id_a AS d FROM pairs
    ), reach(id, r) AS (
        SELECT p_partkey, p_partkey FROM pu
        UNION
        SELECT sym.s, reach.r FROM sym JOIN reach ON sym.d = reach.id
    ), clusters AS (
        SELECT id AS p_partkey, CAST(MIN(r) AS BIGINT) AS cluster_id
        FROM reach GROUP BY id
    ), sizes AS (
        SELECT cluster_id AS c2, CAST(count(*) AS BIGINT) AS cluster_size
        FROM clusters GROUP BY cluster_id
    )
    SELECT p.p_partkey, p.p_name, p.p_brand,
           c.cluster_id, s.cluster_size,
           (p.p_partkey = c.cluster_id) AS is_canonical
    FROM pu p
    JOIN clusters c ON p.p_partkey = c.p_partkey
    JOIN sizes s ON c.cluster_id = s.c2
    """,
    description=(
        "Entity resolution over part names: brand blocking, Levenshtein<=2 "
        "match graph, connected components, canonical entity + cluster "
        "size — transitive identity the pair list can't express"
    ),
)
def part_entity_clusters(spark, sf_dir):
    from data_etl_with_dbt_spark.operators.relational import resolve_entities

    # pre-dedup: entity ids must be unique for the component fixpoint;
    # checkpointed once for resolve_entities' three consumers (pair
    # blocking, the node frame, the final rejoin) — r11
    part = (
        load(spark, sf_dir, "part")
        .select("p_partkey", "p_name", "p_brand")
        .distinct()
        .transform(materialize)
    )
    resolved = resolve_entities(
        part, "p_brand", "p_partkey", "p_name", max_dist=2,
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    )
    return resolved.select(
        big(F.col("p_partkey")).alias("p_partkey"),
        "p_name",
        "p_brand",
        big(F.col("cluster_id")).alias("cluster_id"),
        "cluster_size",
        "is_canonical",
    )


# ---------------------------------------------------------------------------
# The composite curation decision — defined LAST because it interpolates
# the gopher/decontamination/substring-cut oracles, which must already be
# bound above.
# ---------------------------------------------------------------------------


def _on_distinct_docs(oracle_sql: str) -> str:
    """Re-point a component oracle at the (doc_id, text)-deduped source —
    the composite decision query pre-dedups its input on the contract key
    (dup2 convention), so every component must read the SAME deduped
    relation or row multiplicities diverge between engines."""
    return oracle_sql.replace(
        "FROM documents",
        "FROM (SELECT DISTINCT doc_id, text FROM documents)",
    )


@query(
    "curation_decisions",
    bench=True,  # r9: 17th headline — the most expensive composite
    # (Gopher + n-gram contamination + substring cut + id-keyed joins)
    # so the substring/composite machinery gets round-over-round floor
    # tracking (the r7 media_frame_sampling precedent)
    oracle=f"""
    WITH g AS ({_on_distinct_docs(_GOPHER_ORACLE)}),
    c AS ({_on_distinct_docs(_DECONTAM_ORACLE)}),
    cut AS ({_REGISTRY["exact_substring_dedup_cut"].oracle})
    SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
           g.passes_gopher,
           COALESCE(c.contaminated, FALSE) AS contaminated,
           (g.doc_id % 97 = 0) AS is_benchmark,
           (cut.n_tokens_removed * 2 > cut.n_tokens) AS mostly_dup,
           (g.passes_gopher
            AND NOT COALESCE(c.contaminated, FALSE)
            AND NOT (g.doc_id % 97 = 0)
            AND NOT (cut.n_tokens_removed * 2 > cut.n_tokens)) AS keep_doc
    FROM g
    JOIN cut ON g.doc_id = cut.doc_id
    LEFT JOIN c ON g.doc_id = c.doc_id
    """,
    description=(
        "ONE curation decision per document — the composite relation the "
        "training-data pipeline actually materializes: Gopher quality "
        "conjunction AND not n-gram-contaminated AND not a benchmark doc "
        "AND not mostly duplicate text (merged-interval dup tokens > "
        "half), each flag exposed for audit. Components reuse the "
        "gopher/decontamination/substring-cut oracles verbatim over the "
        "(doc_id, text)-deduped source; booleans only — float-free"
    ),
)
def curation_decisions(spark, sf_dir):
    # ONE documents scan + distinct shared by all five consumers (gopher,
    # bench/train split, regions, cut) — Catalyst gives no cross-consumer
    # CSE, so without the checkpoint each consumer re-scanned the parquet
    # AND re-ran the (doc_id, text) distinct exchange (5 scans + 5
    # text-carrying shuffles in the r11 before-plan). The round-robin
    # repartition restores post-distinct parallelism (AQE coalesces the
    # tiny fixture shuffle to ~1 partition, serializing every downstream
    # per-doc CPU stage — the same unsplittable-fixture trap the suite's
    # shuffle_parallelism knobs exist for; keyless round-robin survives
    # AQE, a hash repartition here would be re-coalesced). r12: the spread
    # is CONDITIONAL (spread_small fires only when the relation is
    # estimated fixture-small — at warehouse scale the distinct's own
    # partitioning already spreads it and an extra corpus shuffle would be
    # pure waste), and the materialization goes through the materialize()
    # scale-seam (localCheckpoint here, versioned table beyond the size
    # threshold).
    docs = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .distinct()
        .transform(spread_small)
        .transform(materialize)
    )
    g = TA.gopher_quality_flags(
        docs, "doc_id", "text",
        min_words=30, max_words=90,
        min_mean_word_len=3.0, max_mean_word_len=4.5,
        max_dup_token_frac=0.6, min_distinct_stopwords=2,
    ).select("doc_id", "passes_gopher")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    cont = D.benchmark_contamination(
        train, bench, "doc_id", "text", n=3, threshold=0.5,
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    ).select("doc_id", "contaminated")
    regions = D.exact_substring_regions(docs, "doc_id", "text", span_tokens=10)
    cut = D.remove_duplicate_regions(docs, regions, "doc_id", "text")
    mostly = cut.select(
        "doc_id",
        (F.col("n_tokens_removed") * 2 > F.col("n_tokens")).alias(
            "mostly_dup"
        ),
    )
    contaminated = F.coalesce(F.col("contaminated"), F.lit(False))
    is_bench = F.col("doc_id") % 97 == 0
    return (
        g.join(mostly, "doc_id")
        .join(cont, "doc_id", "left")
        .select(
            big(F.col("doc_id")).alias("doc_id"),
            "passes_gopher",
            contaminated.alias("contaminated"),
            is_bench.alias("is_benchmark"),
            "mostly_dup",
            (
                F.col("passes_gopher")
                & ~contaminated
                & ~is_bench
                & ~F.col("mostly_dup")
            ).alias("keep_doc"),
        )
    )


@query(
    "curation_decisions_full",
    oracle=f"""
    WITH lines AS ({_HYG_LINES_SQL}),
    doc AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY j) AS text
            FROM lines GROUP BY doc_id),
    judged AS (
        SELECT doc_id, j, line,
               regexp_matches(line, '[.!?]["'')\\]]*$|["”]$')
               AND len(list_filter(string_split_regex(line, '\\s+'),
                                   x -> x <> '')) >= 3
               AND NOT contains(lower(line), 'javascript') AS ok
        FROM lines
    ),
    perdoc AS (
        SELECT doc_id,
               coalesce(string_agg(line, chr(10) ORDER BY j) FILTER (ok), '')
                   AS cleaned,
               count(*) FILTER (regexp_matches(line, '(\\.\\.\\.|…)$'))
                   AS n_ell,
               count(*) FILTER (regexp_matches(line, '^[-*•‣▶◦·]')) AS n_bul
        FROM judged GROUP BY doc_id
    ),
    hyg AS (
        SELECT d.doc_id,
               len(list_filter(list_transform(
                   string_split_regex(p.cleaned, '[.!?]+'),
                   s -> trim(regexp_replace(s, '\\s+', ' ', 'g'))),
                   s -> s <> '')) >= 3
                 AND NOT contains(lower(d.text), '{{')
                 AND NOT contains(lower(d.text), 'lorem ipsum') AS c4_kept,
               (len(regexp_extract_all(d.text, '\\p{{Cyrillic}}'))
                + len(regexp_extract_all(d.text, '\\p{{Han}}'))
                + len(regexp_extract_all(d.text, '\\p{{Arabic}}'))) = 0
                   AS latin_only,
               (p.n_ell = 0 AND p.n_bul = 0) AS rp_clean
        FROM doc d JOIN perdoc p ON d.doc_id = p.doc_id
    ),
    toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\\s+'),
                           x -> x <> '') AS t
        FROM doc
    ),
    g AS (
        SELECT doc_id,
               (len(t) >= 25 AND len(t) <= 38)
               AND (CAST(list_sum(list_transform(t, x -> length(x)))
                         AS DOUBLE) / len(t) >= 3.0
                    AND CAST(list_sum(list_transform(t, x -> length(x)))
                             AS DOUBLE) / len(t) <= 3.85)
               AND (1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t))
                   <= 0.49 AS passes_gopher
        FROM toks
    ),
    grams AS (
        SELECT doc_id,
               unnest(list_distinct(list_transform(
                   range(1, greatest(len(t) - 2, 1) + 1),
                   i -> array_to_string(t[i:i+2], ' ')))) AS gram
        FROM toks
    ),
    bgrams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
    cont AS (
        SELECT gr.doc_id,
               (CAST(count(b.gram) AS DOUBLE) / CAST(count(*) AS DOUBLE))
                   >= 0.6 AS contaminated
        FROM grams gr LEFT JOIN bgrams b ON gr.gram = b.gram
        WHERE gr.doc_id % 97 <> 0
        GROUP BY gr.doc_id
    ),
    pos AS (
        SELECT doc_id, i,
               array_to_string(list_slice(t, i + 1, i + 10), ' ') AS shingle
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 10)) AS i
              FROM toks WHERE len(t) >= 10) s
    ),
    ranked AS (
        SELECT doc_id, i,
               row_number() OVER (PARTITION BY shingle ORDER BY doc_id, i) AS rn
        FROM pos
    ),
    dup AS (
        SELECT doc_id, i,
               i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS isl
        FROM ranked WHERE rn > 1
    ),
    regions AS (
        SELECT doc_id, min(i) AS rs, max(i) + 10 AS re
        FROM dup GROUP BY doc_id, isl
    ),
    tok_pos AS (
        SELECT doc_id, i
        FROM (SELECT doc_id, t, unnest(generate_series(0, len(t) - 1)) AS i
              FROM toks WHERE len(t) > 0)
    ),
    kept AS (
        SELECT tp.doc_id, tp.i
        FROM tok_pos tp
        WHERE NOT EXISTS (SELECT 1 FROM regions r
                          WHERE r.doc_id = tp.doc_id
                            AND tp.i >= r.rs AND tp.i < r.re)
    ),
    cut AS (
        SELECT t.doc_id,
               (len(t.t) - count(k.i)) * 2 > len(t.t) AS mostly_dup
        FROM toks t LEFT JOIN kept k ON t.doc_id = k.doc_id
        GROUP BY t.doc_id, len(t.t)
    )
    SELECT CAST(h.doc_id AS BIGINT) AS doc_id,
           h.c4_kept, h.latin_only, h.rp_clean,
           g.passes_gopher,
           COALESCE(cont.contaminated, FALSE) AS contaminated,
           (h.doc_id % 97 = 0) AS is_benchmark,
           cut.mostly_dup,
           (h.c4_kept AND h.latin_only AND h.rp_clean AND g.passes_gopher
            AND NOT COALESCE(cont.contaminated, FALSE)
            AND NOT (h.doc_id % 97 = 0)
            AND NOT cut.mostly_dup) AS keep_doc
    FROM hyg h
    JOIN g ON h.doc_id = g.doc_id
    JOIN cut ON h.doc_id = cut.doc_id
    LEFT JOIN cont ON h.doc_id = cont.doc_id
    """,
    description=(
        "EVERY published gate in ONE per-doc keep/drop relation — "
        "curation_decisions extended with the fused hygiene verdicts "
        "(the r9 verdict's roadmap item): C4 page verdict + Unicode-"
        "script band + RedPajama ellipsis/bullet band (all three from "
        "ONE hygiene_signals scan) AND Gopher quality AND not n-gram-"
        "contaminated AND not a benchmark doc AND not mostly duplicate "
        "(span-10 merged regions > half), each flag exposed for audit. "
        "Runs on the hygiene synthesis corpus (the real documents table "
        "is single-line punctuation-free text, so line/script gates "
        "would be vacuous there); every flag fixture-calibrated "
        "non-vacuous both ways (c4 201/39, script 213/27, rp 184/56, "
        "gopher 127/113, contaminated 21, benchmark 3, mostly_dup "
        "210/30, keep_doc 6/234); booleans only — float-free"
    ),
)
def curation_decisions_full(spark, sf_dir):
    # ONE synthesis shared by all six consumers (hygiene, gopher,
    # bench/train split, regions, cut) — without the checkpoint each
    # consumer re-ran the full 240-id sample + projection chain (no
    # cross-consumer CSE); the round-robin repartition spreads the
    # per-doc CPU off the LIMIT's single partition (see curation_decisions)
    docs = (
        _synth_hyg_docs(spark, sf_dir)
        .transform(spread_small)
        .transform(materialize)
    )
    hs = TA.hygiene_signals(docs, "doc_id", "text", min_sentences=3)
    hyg = hs.select(
        "doc_id",
        F.col("doc_kept").alias("c4_kept"),
        (
            (F.col("n_cyrillic") + F.col("n_han") + F.col("n_arabic")) == 0
        ).alias("latin_only"),
        (
            (F.col("n_lines_end_ellipsis") == 0)
            & (F.col("n_lines_start_bullet") == 0)
        ).alias("rp_clean"),
    )
    g = TA.gopher_quality_flags(
        docs, "doc_id", "text",
        min_words=25, max_words=38,
        min_mean_word_len=3.0, max_mean_word_len=3.85,
        max_dup_token_frac=0.49,
        # the synthesis corpus has at most one distinct stopword ('to',
        # d%10==7 only) — the stopword rule is inherently degenerate
        # here, so it is disabled rather than left vacuous-false
        min_distinct_stopwords=0,
    ).select("doc_id", "passes_gopher")
    bench = docs.where(F.col("doc_id") % 97 == 0)
    train = docs.where(F.col("doc_id") % 97 != 0)
    cont = D.benchmark_contamination(
        train, bench, "doc_id", "text", n=3, threshold=0.6,
        shuffle_parallelism=spark.sparkContext.defaultParallelism,
    ).select("doc_id", "contaminated")
    regions = D.exact_substring_regions(docs, "doc_id", "text", span_tokens=10)
    cut = D.remove_duplicate_regions(docs, regions, "doc_id", "text").select(
        "doc_id",
        (F.col("n_tokens_removed") * 2 > F.col("n_tokens")).alias(
            "mostly_dup"
        ),
    )
    contaminated = F.coalesce(F.col("contaminated"), F.lit(False))
    is_bench = F.col("doc_id") % 97 == 0
    return (
        hyg.join(g, "doc_id")
        .join(cut, "doc_id")
        .join(cont, "doc_id", "left")
        .select(
            big(F.col("doc_id")).alias("doc_id"),
            "c4_kept",
            "latin_only",
            "rp_clean",
            "passes_gopher",
            contaminated.alias("contaminated"),
            is_bench.alias("is_benchmark"),
            "mostly_dup",
            (
                F.col("c4_kept")
                & F.col("latin_only")
                & F.col("rp_clean")
                & F.col("passes_gopher")
                & ~contaminated
                & ~is_bench
                & ~F.col("mostly_dup")
            ).alias("keep_doc"),
        )
    )
