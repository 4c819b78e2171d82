"""Semantic properties of the session-6 suite entries — invariants the
oracle hash can't express (the hash proves cross-engine equality, these
prove the *math* means what the docstring claims)."""

from __future__ import annotations

import pytest

from data_etl_with_dbt_spark.suite import QUERIES
from tests.conftest import SF_DIR


def run(spark, name):
    return QUERIES[name].fn(spark, SF_DIR).toPandas()


def test_concurrency_peak_bounds(spark):
    pdf = run(spark, "concurrent_sessions_peak")
    assert len(pdf) == 5  # one row per event type
    assert (pdf.peak_concurrency >= 1).all()
    assert (pdf.peak_concurrency <= pdf.n_intervals).all()


def test_interpolation_fills_between_neighbours(spark):
    pdf = run(spark, "linear_interpolate_events")
    # every missing row is filled (each fixture user has known neighbours)
    assert pdf.filled_value.notna().all()
    # known rows pass through the original measure's range
    assert (pdf.filled_value > 0).all()
    assert pdf.was_missing.any() and (~pdf.was_missing).any()


def test_ewma_is_a_convex_smoother(spark):
    pdf = run(spark, "ewma_daily_revenue").sort_values("day").reset_index(drop=True)
    assert len(pdf) == 60
    # first point seeds the series; 1e-6 slack for the emission quantization
    assert abs(pdf.ewma[0] - pdf.rev[0]) < 1e-6
    # every EWMA point is a convex combination -> inside the running range
    run_min, run_max = pdf.rev[0], pdf.rev[0]
    for i in range(1, len(pdf)):
        run_min, run_max = min(run_min, pdf.rev[i]), max(run_max, pdf.rev[i])
        assert run_min - 1e-6 <= pdf.ewma[i] <= run_max + 1e-6


def test_km_survival_is_a_decreasing_probability(spark):
    pdf = run(spark, "survival_km_conversion").sort_values("duration_s").reset_index(drop=True)
    assert (pdf.survival > 0).all() and (pdf.survival <= 1).all()
    assert (pdf.survival.diff().dropna() <= 1e-9).all()  # non-increasing
    assert (pdf.n_at_risk.diff().dropna() < 0).all()  # risk set shrinks
    assert (pdf.n_events <= pdf.n_at_risk).all()


def test_bm25_scores_positive_and_bounded(spark):
    pdf = run(spark, "bm25_top_docs")
    assert len(pdf) == 20
    assert (pdf.bm25 > 0).all()
    assert (pdf.matched_terms.between(1, 3)).all()
    # top-k comes back score-descending
    assert (pdf.bm25.diff().dropna() <= 1e-9).all()


def test_inverted_index_postings_are_sorted_heads(spark):
    pdf = run(spark, "inverted_index_terms")
    for _, r in pdf.iterrows():
        ids = [int(x) for x in r.postings_head.split(",")]
        assert ids == sorted(ids)
        assert len(ids) == min(r.df, 12)
        assert r.total_tf >= r.df


def test_dsir_weights_prefer_target_language(spark):
    from pyspark.sql import functions as F

    pdf = run(spark, "dsir_importance_weights")
    assert (pdf.n_tokens > 0).all()
    # the top-30 most-target-like docs should be mostly the target language
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "lang").toPandas()
    top = pdf.merge(docs, on="doc_id")
    frac_en = (top.lang == "en").mean()
    all_en = (docs.lang == "en").mean()
    assert frac_en >= all_en  # selection is at least as English as the corpus


def test_fertility_stats_are_consistent(spark):
    pdf = run(spark, "tokenizer_fertility_stats")
    assert (pdf.bpe_ish_tokens >= pdf.ws_tokens).all()  # subwords >= words
    assert (pdf.fertility >= 1).all()
    assert (pdf.chars_per_token > 0).all()
    assert pdf.n_docs.sum() == 500 * (1 if "0.001" in SF_DIR else 1)


def test_curriculum_is_a_bucket_ordered_permutation(spark):
    pdf = run(spark, "curriculum_schedule_documents").sort_values("schedule_pos")
    n = len(pdf)
    assert sorted(pdf.schedule_pos) == list(range(1, n + 1))
    # difficulty never decreases along the schedule
    assert (pdf.difficulty_bucket.diff().dropna() >= 0).all()
    # each quintile holds n/5 docs
    assert set(pdf.difficulty_bucket.value_counts()) == {n // 5}


def test_reconcile_orders_by_worst_mismatch(spark):
    pdf = run(spark, "reconcile_order_totals")
    assert len(pdf) == 15
    mags = pdf.diff_abs if hasattr(pdf, "diff_abs") else pdf["diff"].abs()
    assert (mags.diff().dropna() <= 1e-9).all()
    # diff really is header minus detail
    assert ((pdf.header_total - pdf.line_total) - pdf["diff"]).abs().max() < 1e-6


def test_fd_check_distinguishes_keys_from_nonkeys(spark):
    pdf = run(spark, "functional_dependency_check").set_index("fd")
    assert bool(pdf.loc["customer: c_custkey->c_mktsegment", "holds"]) is True
    assert pdf.loc["customer: c_custkey->c_mktsegment", "extra_values"] == 0
    assert bool(pdf.loc["events: user_id->event_type", "holds"]) is False
    # extra_values == 0 exactly when the FD holds
    assert ((pdf.extra_values == 0) == pdf.holds).all()


def test_session_entry_exit_accounting(spark):
    pdf = run(spark, "session_entry_exit")
    assert (pdf.n_bounces <= pdf.n_sessions).all()
    assert (pdf.avg_duration_s >= 0).all()
    # bounce-only cells (all sessions single-event) have zero duration
    bounce_only = pdf[pdf.n_bounces == pdf.n_sessions]
    assert (bounce_only.avg_duration_s == 0).all()
    # every bounce is a session that enters and exits on the same event
    assert (pdf[pdf.entry_type != pdf.exit_type].n_bounces == 0).all()


@pytest.mark.parametrize(
    "name,helper",
    [("bm25_top_docs", "bm25_scores"), ("inverted_index_terms", "inverted_index")],
)
def test_suite_entries_delegate_to_public_operators(name, helper):
    import inspect

    src = inspect.getsource(QUERIES[name].fn)
    assert helper in src  # the library surface is the single implementation


def test_bm25_empty_query_raises_and_multiplicity_weights(spark):
    import pytest as _pytest

    from data_etl_with_dbt_spark.operators.textan import bm25_scores

    docs = spark.createDataFrame(
        [(1, "alpha beta beta"), (2, "alpha gamma"), (3, "delta delta")],
        "doc_id long, text string",
    )
    with _pytest.raises(ValueError, match="non-empty"):
        bm25_scores(docs, "doc_id", "text", [])
    once = {r.doc_id: r.bm25 for r in bm25_scores(docs, "doc_id", "text", ["beta"]).collect()}
    twice = {r.doc_id: r.bm25 for r in bm25_scores(docs, "doc_id", "text", ["beta", "beta"]).collect()}
    # bag-of-terms: the repeated term contributes per occurrence
    assert twice[1] == _pytest.approx(2 * once[1])
