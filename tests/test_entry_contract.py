"""Sanity checks on the driver contract adapter (__spark_entry__)."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest


@pytest.fixture(scope="module")
def entry_mod():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", os.path.join(os.path.dirname(__file__), "..", "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_oracles_are_subset_of_queries(entry_mod):
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 50
    assert len(osql) >= 35


def test_every_oracle_parses_in_duckdb(entry_mod):
    """The driver registers the fixture tables as views; every oracle must at
    least bind and plan against that catalog."""
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, sql in entry_mod.oracle_sql().items():
        con.execute(f"EXPLAIN {sql}")  # raises on syntax/binding errors


def test_entry_runs(spark, entry_mod):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.columns) >= 5


def test_rows_only_queries_are_the_approximate_family(entry_mod):
    from data_etl_with_dbt_spark.suite import QUERIES

    rows_only = {n for n, q in QUERIES.items() if not q.oracle}
    assert rows_only == {
        "dedup_minhash_lsh",
        "dedup_incremental_minhash",  # MinHash-estimated Jaccard: no SQL oracle
        "dedup_simhash_pairs",
        "ann_lsh_topk",
        "ann_ivf_topk",
        "ann_cosine_topk_arrow",  # BLAS accumulation: 1e-12 agreement, not bit-exact
        "embedding_near_dup",
        "semantic_dedup_clusters_lsh",
        "approx_aggregates",
        "hll_user_cardinality",  # DataSketches HLL estimate: no SQL oracle
        "bpe_train_merges",  # iterative merge loop: reference-impl-tested instead
        "pagerank_similarity_graph",  # float fixpoint: reference-impl-tested
        "bpe_encode_documents",  # encodes under the iterative trainer's merges
        "cms_token_counts",  # sketch cells hash with xxhash64 (engine-specific)
        "ann_pq_topk",  # codebook quantization: approximate by construction
        "ann_pq_rerank_topk",  # shortlist stage is approximate by construction
        "pca_embeddings",  # driver-side eigh: numpy-agreement-tested instead
        "unigram_lm_vocab",  # iterative Viterbi-EM: reference-impl-tested
        "topic_model_documents",  # variational EM: theme-separation-tested
        "learned_embedding_ann",  # trained embeddings: neighbor-quality-tested
        "image_dhash_near_dup",  # decode+perceptual hash: ground truth by construction
        "audio_spectral_report",  # FFT features: ground truth by construction
        "warc_ingest_pipeline",  # throughput bench; oracle-checked twins are
        # warc_documents_roundtrip / warc_ingest_accounting
    }


def test_queries_survive_hostile_session_conf(spark, duck, entry_mod):
    """The driver owns the SparkSession; the adapter must repair semantics
    at runtime. Simulate a hostile session (ANSI on, non-UTC timezone) and
    check a timestamp- and cast-sensitive query still matches its oracle."""
    from tests.test_oracle_parity import assert_frames_match

    old_ansi = spark.conf.get("spark.sql.ansi.enabled")
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        # core_transform: the reference's cast/epoch shape; recrawl: the
        # most timezone-sensitive round-6 query (to_timestamp on lastmod
        # strings + date_format + unix_micros + a pinned 'now' literal)
        for bare in ("core_transform_events", "recrawl_schedule_events"):
            name = entry_mod.exposed_name(bare)
            got = entry_mod.queries()[name](spark, os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")).toPandas()
            want = duck.execute(entry_mod.oracle_sql()[name]).df()
            assert_frames_match(got, want, name)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old_ansi)
        spark.conf.set("spark.sql.session.timeZone", old_tz)
