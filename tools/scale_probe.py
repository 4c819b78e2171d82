"""Operator scaling probe over the synthetic corpus source.

The fixtures cap out at sf0.1; this tool load-tests individual operators at
arbitrary corpus sizes using the ``synthetic_docs`` generator source (rows
are computed, not stored — the input scales to whatever fits the probe
budget). For each (operator, rows) cell it runs the operator to a count and
reports wall time and throughput, so scaling curves (rows vs time) land in
BENCH_NOTES with measured numbers instead of assertions.

Usage:
    python tools/scale_probe.py                    # default ops, default sizes
    python tools/scale_probe.py exact,gopher 100000,400000

Run from a non-repo cwd (engine convention: warehouse dirs land under cwd).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _ops():
    from data_etl_with_dbt_spark.operators import (
        dedup as D,
        relational as R,
        textan as TA,
    )

    return {
        "exact": lambda df: D.dedup_exact(df, "doc_id", "text"),
        "minhash": lambda df: D.minhash_lsh_pairs(df, "doc_id", "text"),
        "boilerplate": lambda df: D.ngram_df_prune(df, "doc_id", "text"),
        "spans": lambda df: D.span_dedup(df, "doc_id", "text"),
        "gopher": lambda df: TA.gopher_quality_flags(df, "doc_id", "text"),
        "perplexity": lambda df: TA.unigram_logprob_score(df, "doc_id", "text"),
        "bpe_step": lambda df: TA.bpe_pair_counts(df, "text"),
        "packed": lambda df: TA.packed_token_windows(
            df, "doc_id", "text", window_tokens=2048
        ),
        "quota": lambda df: R.per_key_cap(
            df, ["source"], [F.col("n_chars").desc(), F.col("doc_id")], n=1000
        ),
        "bm25": lambda df: TA.bm25_scores(
            df, "doc_id", "text", ["the", "and", "of"], limit=100
        ),
        "invindex": lambda df: TA.inverted_index(df, "doc_id", "text"),
        "chunking": lambda df: TA.chunk_documents(
            df, "doc_id", "text", chunk_tokens=64, stride=48
        ),
        "substr_inc": _substr_inc(bloom=False),
        "substr_inc_bloom": _substr_inc(bloom=True),
        "cms": _cms,
        "hll": _hll,
        "kmv": _kmv,
        "sampled_q": _sampled_quantiles,
        "unigram": _unigram,
        "zorder": _zorder,
        "weighted_sample": _weighted_sample,
        "bpe_encode": _bpe_encode,
        "robots_audit": _robots_audit,
        "recrawl": _recrawl,
        "crawl_slots": _crawl_slots,
        "sentence_regions": _sentence_regions,
        "sentence_cut": _sentence_cut,
        "c4_lines": _c4_lines,
        "script_mix": _script_mix,
        "url_features": _url_features,
        "canonicalize": _canonicalize,
        "nfkc": _nfkc,
        "paragraph_cut": _paragraph_cut,
        "repetition": _repetition,
        "hygiene_fused": _hygiene_fused,
        "hygiene_joined": _hygiene_joined,
    }


def _substr_inc(bloom: bool):
    """Incremental exact-substring regions of the odd-id half judged
    against a prebuilt even-id-half index — plain vs bloom-fronted. The
    synthetic corpus has almost no cross-half duplication, i.e. the
    steady-state intake regime where the bloom prunes nearly every batch
    hash and the accumulated index stays out of the shuffle entirely.
    Index (and bloom words) are built ONCE per (op, rows) cell and cached
    by the input's object identity so the timed pass measures the probe,
    not the prep."""
    cache: dict[int, tuple] = {}

    def fn(df):
        from data_etl_with_dbt_spark.operators import dedup as D
        from data_etl_with_dbt_spark.operators.sketch import (
            bloom_build,
            bloom_parameters,
        )

        key = id(df)
        if key not in cache:
            b1 = df.where(F.col("doc_id") % 2 == 0)
            empty = df.sparkSession.createDataFrame([], "span_hash bigint")
            _, h1 = D.incremental_exact_substring_regions(
                b1, empty, "doc_id", "text", span_tokens=10
            )
            index = h1.select("span_hash").localCheckpoint(eager=True)
            if bloom:
                m, k = bloom_parameters(max(index.count(), 1), 0.01)
                words = bloom_build(index, "span_hash", m, k).localCheckpoint(
                    eager=True
                )
                cache[key] = (index, words, m, k)
            else:
                cache[key] = (index, None, None, None)
        index, words, m, k = cache[key]
        b2 = df.where(F.col("doc_id") % 2 == 1)
        regions, _ = D.incremental_exact_substring_regions(
            b2, index, "doc_id", "text", span_tokens=10,
            index_bloom=words, bloom_bits=m, bloom_hashes=k,
        )
        return regions

    return fn


def _probe_url(host_mod: int = 1000):
    # 1000 synthetic hosts: the rules side stays host-cardinality
    # (broadcastable) while the URL side scales with the probe rows
    return F.concat(
        F.lit("https://h"),
        (F.col("doc_id") % host_mod).cast("string"),
        F.lit(".example.com/p/"),
        F.col("doc_id").cast("string"),
    )


def _robots_audit(df):
    from data_etl_with_dbt_spark.sources.robots import audit_robots

    urls = df.select("doc_id", _probe_url().alias("url"))
    rules = [
        (f"h{i}.example.com", "User-agent: *\nDisallow: /private/\nAllow: /p/\n")
        for i in range(1000)
    ]
    robots = df.sparkSession.createDataFrame(
        rules, "host string, robots_txt string"
    )
    return audit_robots(urls, robots)


def _recrawl(df):
    from data_etl_with_dbt_spark.sources.robots import recrawl_schedule

    fetched = F.timestamp_seconds(
        F.lit(1704067200) + (F.col("doc_id") % 2_592_000)
    )
    snapshot = df.select(_probe_url().alias("url"), fetched.alias("fetched_at"))
    seeds = df.where(F.col("doc_id") % 3 < 2).select(
        _probe_url().alias("loc"),
        F.date_format(
            F.timestamp_seconds(
                F.lit(1704067200 + 86400) + (F.col("doc_id") % 2_592_000)
            ),
            "yyyy-MM-dd HH:mm:ss",
        ).alias("lastmod"),
    )
    return recrawl_schedule(seeds, snapshot, now="2024-03-01 00:00:00")


def _crawl_slots(df):
    from data_etl_with_dbt_spark.sources.robots import crawl_slots

    sched = df.select(
        _probe_url().alias("url"),
        (F.col("doc_id") % 4).cast("int").alias("priority"),
        (F.col("doc_id") % 100_000).cast("bigint").alias("staleness_seconds"),
    )
    return crawl_slots(sched, per_host_delay_s=5)


def _cms(df):
    from data_etl_with_dbt_spark.operators.sketch import cms_build
    from data_etl_with_dbt_spark.operators.textan import tokens_expr

    toks = df.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
    return cms_build(toks, "token", depth=4, width=4096)


def _hll(df):
    from data_etl_with_dbt_spark.operators.sketch import hll_build
    from data_etl_with_dbt_spark.operators.textan import tokens_expr

    toks = df.select(F.explode(tokens_expr(F.col("text"))).alias("token"))
    return hll_build(toks, "token", p=12)


def _zorder(df):
    from data_etl_with_dbt_spark.operators.layout import zorder_key

    return zorder_key(df, "doc_id", "n_chars", bits=16)


def _weighted_sample(df):
    u = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 6),
        16,
        10,
    ).cast("bigint")
    key = u.cast("double") / F.lit(16777216.0) / F.col("n_chars").cast("double")
    return df.select("doc_id", key.alias("k")).orderBy("k", "doc_id").limit(1000)


# canned merge rules over the generator's vocabulary — the probe measures
# ENCODING (distinct-word folds + broadcast join), not training
_PROBE_MERGES = [
    {"step": i, "left": l, "right": r, "merged": l + r, "cnt": 1}
    for i, (l, r) in enumerate(
        [("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("o", "n"), ("e", "r"), ("s", "t"), ("an", "d")]
    )
]


def _kmv(df):
    from data_etl_with_dbt_spark.operators.sketch import kmv_build
    from data_etl_with_dbt_spark.operators.textan import tokens_expr

    toks = df.select(
        "source", F.explode(tokens_expr(F.col("text"))).alias("token")
    )
    return kmv_build(toks, "token", k=64, group_cols=["source"])


def _sampled_quantiles(df):
    from data_etl_with_dbt_spark.operators.sketch import sampled_quantiles

    return sampled_quantiles(
        df, key_col="doc_id", value_col="n_chars", probs=[0.5, 0.9],
        rate=0.1, group_cols=["source"],
    )


def _unigram(df):
    # training runs to a model (driver list), so wrap it back into a frame
    from data_etl_with_dbt_spark.operators import textan as TA

    model = TA.train_unigram_lm(
        df, "text", vocab_size=64, max_piece_len=4, num_iters=2, seed_size=200
    )
    return df.sparkSession.createDataFrame(
        [(m["piece"],) for m in model], "piece string"
    )


def _bpe_encode(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    return TA.bpe_encode(df, "doc_id", "text", _PROBE_MERGES)


def _sentence_text(n_sents: int = 12, classes: int = 1000):
    """Residue-coded multi-sentence text (the suite synthesis pattern at
    probe scale): docs in the same %classes class share sentences, a
    per-doc unique sentence every 5th position breaks runs — heavy
    cross-doc duplication at any row count, pure codegen to build."""
    d = F.col("doc_id")
    sent = lambda j: F.when(  # noqa: E731
        j % 5 == F.lit(2),
        F.format_string("unique d%d j%d", d, j),
    ).otherwise(
        F.format_string("common c%d j%d", d % classes, j)
    )
    return F.concat(
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(n_sents - 1)), sent),
            ". ",
        ),
        F.lit("."),
    )


def _sentence_regions(df):
    from data_etl_with_dbt_spark.operators import dedup as D

    docs = df.select("doc_id", _sentence_text().alias("text"))
    return D.sentence_substring_regions(
        docs, "doc_id", "text", span_sentences=3
    )


def _sentence_cut(df):
    from data_etl_with_dbt_spark.operators import dedup as D

    docs = df.select("doc_id", _sentence_text().alias("text"))
    regions = D.sentence_substring_regions(
        docs, "doc_id", "text", span_sentences=3
    )
    return D.remove_duplicate_regions(
        docs, regions, "doc_id", "text", unit="sentence"
    )


def _c4_lines(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    # newline-joined variant of the sentence synthesis: every C4 rule
    # fires (no-terminal lines via the %4 ending, short 'Hi.' lines,
    # javascript lines)
    d = F.col("doc_id")
    line = lambda j: F.when(j % 7 == F.lit(3), F.lit("Hi.")).when(  # noqa: E731
        j % 7 == F.lit(5), F.lit("Use javascript here now.")
    ).otherwise(
        F.concat(
            F.format_string("Alpha beta w%d j%d", d % 1000, j),
            F.when((d + j) % 4 == F.lit(2), F.lit("")).otherwise(F.lit(".")),
        )
    )
    docs = df.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), F.lit(11)), line), "\n"
        ).alias("text"),
    )
    return TA.c4_line_filters(docs, "doc_id", "text", min_sentences=3)


def _script_mix(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    mixed = df.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 3 == 0, F.lit(" кот мир"))
            .when(F.col("doc_id") % 3 == 1, F.lit(" 你好世界"))
            .otherwise(F.lit(" مرحبا")),
        ).alias("text"),
    )
    return TA.script_mix_stats(mixed, "doc_id", "text")


def _url_features(df):
    from data_etl_with_dbt_spark.functions.web import url_features

    return df.select("doc_id", *url_features(_probe_url()))


def _messy_text():
    """Probe-scale crawl mess: smart quotes, NBSP/ZWSP, CRLF, tabs,
    em-dashes, ellipsis chars, newline runs around the synthetic body —
    every canonicalize rule fires on every row."""
    d = F.col("doc_id")
    return F.concat(
        F.lit("“Title d"), d.cast("string"),
        F.lit("” nav​\r\nBody\ttext — with"),
        F.repeat(F.lit(" "), (d % 3 + 1).cast("int")),
        F.lit("gaps…\n\n\n\nPara d"), d.cast("string"), F.lit(".  "),
    )


def _canonicalize(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    docs = df.select("doc_id", _messy_text().alias("text"))
    return TA.canonicalize_text(docs, "doc_id", "text")


def _nfkc(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    docs = df.select(
        "doc_id",
        F.concat(F.lit("\ufb01le \uff21\uff42\uff43 x\u00b2 "), F.col("text"))
        .alias("text"),
    )
    return TA.nfkc_normalize(docs, "doc_id", "text")


def _paragraph_text(classes: int = 1000):
    """Blank-line-joined variant of the sentence synthesis (two-line
    paragraphs so the unit split itself is exercised)."""
    d = F.col("doc_id")
    para = lambda j: F.when(  # noqa: E731
        j % 5 == F.lit(2),
        F.format_string("unique d%d j%d\nline two", d, j),
    ).otherwise(
        F.format_string("common c%d j%d\nline two", d % classes, j)
    )
    return F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(7)), para), "\n\n"
    )


def _repetition(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    # multi-line synthesis with a repeated line (even ids) so the line,
    # top-gram, and dup-coverage paths all do real work
    d = F.col("doc_id")
    line = lambda j: F.format_string(  # noqa: E731
        "w%d a%d b%d c%d d%d e%d", d % 1000, j, j, j, j, j
    )
    arr = F.transform(
        F.sequence(F.lit(0), F.lit(5)),
        lambda j: F.when(
            (j == F.lit(3)) & (d % 2 == F.lit(0)), line(F.lit(1))
        ).otherwise(line(j)),
    )
    docs = df.select("doc_id", F.array_join(arr, "\n").alias("text"))
    return TA.gopher_repetition_signals(
        docs, "doc_id", "text", top_ns=(2, 3, 4), dup_ns=(5, 10)
    )


def _hygiene_docs(df):
    # multi-line page with a url column: every gate family does real work
    d = F.col("doc_id")
    line = lambda j: F.format_string(  # noqa: E731
        "Alpha beta w%d j%d line text here.", d % 1000, j
    )
    text = F.array_join(
        F.transform(F.sequence(F.lit(0), F.lit(7)), line), "\n"
    )
    return df.select("doc_id", _probe_url().alias("url"), text.alias("text"))


def _hygiene_fused(df):
    from data_etl_with_dbt_spark.operators import textan as TA

    return TA.hygiene_signals(
        _hygiene_docs(df), "doc_id", "text", url_col="url", min_sentences=3
    )


def _hygiene_joined(df):
    """The component composition hygiene_signals replaces: four relations
    over the same input joined on id — the probe pair quantifies the
    fused form's scan/join savings."""
    from data_etl_with_dbt_spark.functions.web import url_features
    from data_etl_with_dbt_spark.operators import textan as TA

    docs = _hygiene_docs(df)
    uf = docs.select("doc_id", *url_features("url"))
    sm = TA.script_mix_stats(docs, "doc_id", "text")
    rp = TA.redpajama_quality_signals(docs, "doc_id", "text").drop("n_lines")
    c4 = TA.c4_line_filters(docs, "doc_id", "text", min_sentences=3)
    return uf.join(sm, "doc_id").join(rp, "doc_id").join(c4, "doc_id")


def _paragraph_cut(df):
    from data_etl_with_dbt_spark.operators import dedup as D

    docs = df.select("doc_id", _paragraph_text().alias("text"))
    regions = D.paragraph_substring_regions(
        docs, "doc_id", "text", span_paragraphs=1
    )
    return D.remove_duplicate_regions(
        docs, regions, "doc_id", "text", unit="paragraph"
    )


def main() -> None:
    from data_etl_with_dbt_spark.session import get_spark
    from data_etl_with_dbt_spark.sources import register_synthetic_source

    names = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    sizes = (
        [int(s) for s in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [100_000, 400_000]
    )
    spark = get_spark(
        "scale_probe", master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    )
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    register_synthetic_source(spark)
    ops = _ops()
    if names is not None:
        unknown = sorted(set(names) - set(ops))
        if unknown:
            raise SystemExit(
                f"unknown op(s) {unknown}; available: {sorted(ops)}"
            )
    chosen = {k: v for k, v in ops.items() if names is None or k in names}

    print(f"{'op':<12} {'rows':>9} {'sec':>7} {'rows/s':>10}")
    for name, fn in chosen.items():
        for rows in sizes:
            df = (
                spark.read.format("synthetic_docs")
                .option("rows", rows)
                .option("partitions", 64)
                .option("seed", 13)
                .load()
            )
            fn(df).count()  # warm (codegen + JIT); generation cost included
            t0 = time.time()
            fn(df).count()
            dt = time.time() - t0
            print(f"{name:<12} {rows:>9,} {dt:>7.2f} {rows / dt:>10,.0f}")
    spark.stop()


if __name__ == "__main__":
    main()
