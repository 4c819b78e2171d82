"""Property-style tests for corpus span operators: across randomized
corpora, n-gram DF pruning and keep-first span dedup agree on span
inventories, and the df threshold's edge settings produce the two
degenerate outcomes exactly (min_df=1 drops everything; min_df > |docs|
drops nothing and reassembles every doc verbatim)."""

from __future__ import annotations

import hashlib
import random

from data_etl_with_dbt_spark.operators.dedup import ngram_df_prune, span_dedup

VOCAB = ["aa", "bb", "cc", "dd", "ee", "ff"]


def make_docs(spark, seed: int, n_docs: int):
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        n = rng.randint(1, 30)
        rows.append((i, " ".join(rng.choice(VOCAB) for _ in range(n))))
    return rows, spark.createDataFrame(rows, "id long, text string")


def test_span_inventory_matches_keep_first_dedup(spark):
    """Both operators tile documents into the same spans; their per-doc
    n_spans must agree for every doc, every span size, every corpus."""
    for seed in (1, 2, 3):
        rows, docs = make_docs(spark, seed, 40)
        for k in (2, 5):
            prune = {
                r.id: r.n_spans
                for r in ngram_df_prune(docs, "id", "text", span_tokens=k).collect()
            }
            dedup = {
                r.id: r.n_spans
                for r in span_dedup(docs, "id", "text", span_tokens=k).collect()
            }
            assert prune == dedup, (seed, k)


def test_min_df_one_drops_every_span(spark):
    rows, docs = make_docs(spark, 7, 30)
    empty_hash = hashlib.md5(b"").hexdigest()
    out = ngram_df_prune(docs, "id", "text", span_tokens=3, min_df=1).collect()
    assert len(out) == 30
    for r in out:
        assert r.n_spans_dropped == r.n_spans
        assert r.boilerplate_frac == 1.0
        assert r.kept_hash == empty_hash


def test_min_df_above_corpus_size_keeps_everything_verbatim(spark):
    rows, docs = make_docs(spark, 11, 25)
    out = {
        r.id: r
        for r in ngram_df_prune(
            docs, "id", "text", span_tokens=4, min_df=26
        ).collect()
    }
    for i, text in rows:
        toks = text.split()
        expect = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert out[i].n_spans_dropped == 0
        assert out[i].boilerplate_frac == 0.0
        assert out[i].kept_hash == expect, i
