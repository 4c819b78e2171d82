"""Semantic properties of the label-aggregation / divergence / fingerprint
operators — invariants the DuckDB oracle can't express (it only proves both
engines compute the same thing; these prove the thing computed is right)."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.suite import QUERIES
from tests.conftest import SF_DIR


def test_majority_vote_invariants(spark):
    rows = QUERIES["majority_label_vote"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_winner <= r.n_votes
        assert 1 <= r.n_labels <= r.n_votes
        assert 0.0 < r.agreement <= 1.0
        # winner holds a strict plurality or the tie-break ran (≥ mean share)
        assert r.n_winner * r.n_labels >= r.n_votes or r.n_labels == 1


def test_fleiss_kappa_bounds_and_perfect_agreement(spark):
    row = QUERIES["annotator_agreement"].fn(spark, SF_DIR).collect()[0]
    assert -1.0 <= row.kappa <= 1.0
    assert 0.0 <= row.p_obs <= 1.0
    assert 0.0 < row.p_exp < 1.0

    # construct perfect agreement: every item's votes share one label;
    # replicate the operator's math shape directly on a tiny frame
    votes = spark.createDataFrame(
        [(i, "yes" if i % 2 else "no") for i in range(20) for _ in range(3)],
        "item_id long, label string",
    )
    counts = votes.groupBy("item_id", "label").agg(F.count(F.lit(1)).alias("cnt"))
    items = counts.groupBy("item_id").agg(
        F.sum("cnt").alias("n_i"), F.sum(F.col("cnt") * F.col("cnt")).alias("s2")
    )
    p_i = (F.col("s2") - F.col("n_i")).cast("double") / (
        F.col("n_i") * (F.col("n_i") - 1)
    ).cast("double")
    p_obs = items.agg(F.avg(p_i).alias("p")).collect()[0].p
    assert p_obs == 1.0  # unanimous raters → observed agreement exactly 1


def test_divergences_are_nonnegative(spark):
    kl = QUERIES["kl_divergence_sources"].fn(spark, SF_DIR).collect()
    assert kl
    for r in kl:
        # Gibbs' inequality up to the per-term 1e-6 ln quantization
        assert r.kl_nats >= -1e-3, r
    mi = QUERIES["mutual_information_events"].fn(spark, SF_DIR).collect()[0]
    assert mi.mi_nats >= -1e-3
    assert mi.n_cells >= 1


def test_hard_negative_labels_differ(spark):
    emb = QUERIES["hard_negative_mining"].fn(spark, SF_DIR)
    from data_etl_with_dbt_spark.sources.io import read_parquet

    labels = read_parquet(spark, f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").alias("query_id"), F.col("label").cast("bigint").alias("qlabel")
    )
    joined = emb.join(labels, "query_id").collect()
    assert joined
    for r in joined:
        assert r.neg_label != r.qlabel
        assert -1.0 - 1e-6 <= r.cosine <= 1.0 + 1e-6


def test_hamming_near_pairs_pigeonhole_recall_matches_brute_force(spark):
    """The band-join must find EVERY pair within the Hamming radius
    (pigeonhole guarantee) and, after the verify step, nothing beyond it —
    checked against an all-pairs brute force on seeded random fingerprints
    with planted near-duplicates."""
    import itertools

    import numpy as np

    from data_etl_with_dbt_spark.operators.dedup import hamming_near_pairs

    rng = np.random.RandomState(99)
    fps = list(rng.randint(-(2**63), 2**63, size=60, dtype=np.int64))
    # plant twins: flip ≤4 random bits of the first 10 fingerprints
    for i in range(10):
        x = int(fps[i])
        for b in rng.choice(64, size=int(rng.randint(1, 5)), replace=False):
            x ^= 1 << int(b)
        x &= (1 << 64) - 1
        fps.append(np.int64(x - (1 << 64) if x >= (1 << 63) else x))
    df = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(fps)], "id long, fp long"
    )
    got = {
        (r.id_a, r.id_b)
        for r in hamming_near_pairs(df, "id", "fp", bits=64, max_hamming=4).collect()
    }
    expect = set()
    vals = [int(v) & ((1 << 64) - 1) for v in fps]
    for a, b in itertools.combinations(range(len(vals)), 2):
        if bin(vals[a] ^ vals[b]).count("1") <= 4:
            expect.add((a, b))
    assert got == expect


class TestScrubPii:
    def test_counts_on_original_and_masks_in_order(self, spark):
        """Counts audit the ORIGINAL text (a later kind's mask can't hide
        an earlier kind's evidence); masks apply in kind order; rows
        without PII pass through untouched."""
        from data_etl_with_dbt_spark.operators.textan import scrub_pii

        docs = spark.createDataFrame(
            [
                (1, "mail a.b+c@ex-ample.org and b@x.io, call 555-010-1234"),
                (2, "server at 10.1.2.3 and 192.168.0.255 no mail"),
                (3, "clean text with numbers 12345 and d.o.t.s"),
                (4, "u4@example.com from 10.4.0.1 tel +555 0104 9999"),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in scrub_pii(docs, "id", "text").collect()}
        assert (out[1].n_email, out[1].n_phone, out[1].n_ipv4) == (2, 1, 0)
        assert out[1].scrubbed_text == "mail <EMAIL> and <EMAIL>, call <PHONE>"
        assert (out[2].n_email, out[2].n_phone, out[2].n_ipv4) == (0, 0, 2)
        assert out[2].scrubbed_text == "server at <IPV4> and <IPV4> no mail"
        assert (out[3].n_email, out[3].n_phone, out[3].n_ipv4) == (0, 0, 0)
        assert out[3].scrubbed_text == docs.collect()[2].text
        # all three kinds in one row; '+' prefix phone form
        assert (out[4].n_email, out[4].n_phone, out[4].n_ipv4) == (1, 1, 1)
        assert out[4].scrubbed_text == "<EMAIL> from <IPV4> tel <PHONE>"

    def test_custom_kinds_and_order(self, spark):
        from data_etl_with_dbt_spark.operators.textan import scrub_pii

        docs = spark.createDataFrame(
            [(1, "id ABC-123 then XYZ-999")], "id long, text string"
        )
        out = scrub_pii(
            docs, "id", "text", kinds={"ticket": r"[A-Z]{3}-\d{3}"}
        ).collect()[0]
        assert out.n_ticket == 2
        assert out.scrubbed_text == "id <TICKET> then <TICKET>"

    def test_rejects_kind_names_with_replacement_metachars(self, spark):
        """'$'/'\\' in a kind name would be read as group refs/escapes by
        Java's regex replacement, silently corrupting the mask token
        (ADVICE r7) — reject loudly instead."""
        import pytest

        from data_etl_with_dbt_spark.operators.textan import scrub_pii

        docs = spark.createDataFrame([(1, "x")], "id long, text string")
        for bad in ("usd$", "a\\b"):
            with pytest.raises(ValueError, match="group"):
                scrub_pii(docs, "id", "text", kinds={bad: r"\d+"})


class TestScriptMixStats:
    def test_counts_per_script_and_digits(self, spark):
        from data_etl_with_dbt_spark.operators.textan import script_mix_stats

        docs = spark.createDataFrame(
            [
                (1, "héllo мир 你好 مرحبا 123"),
                (2, "plain ascii only"),
                (3, ""),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in script_mix_stats(docs, "id", "text").collect()}
        assert (out[1].n_latin, out[1].n_cyrillic, out[1].n_han,
                out[1].n_arabic, out[1].n_digit, out[1].n_chars) == (
            5, 3, 2, 5, 3, 22)
        assert out[2].n_latin == 14 and out[2].n_cyrillic == 0
        assert out[3].n_chars == 0

    def test_custom_script_classes(self, spark):
        from data_etl_with_dbt_spark.operators.textan import script_mix_stats

        docs = spark.createDataFrame(
            [(1, "αβγ abc")], "id long, text string"
        )
        out = script_mix_stats(
            docs, "id", "text", scripts={"greek": "IsGreek"}
        ).collect()[0]
        assert out.n_greek == 3
        assert out.n_chars == 7


class TestC4LineFilters:
    def test_published_rules(self, spark):
        """Raffel et al. §2.2: terminal-punct lines only, >=3 words, no
        'javascript' lines; pages need >= min sentences after filtering,
        no '{', no 'lorem ipsum' (case-insensitive, judged on the
        ORIGINAL text)."""
        import hashlib as _h

        from data_etl_with_dbt_spark.operators.textan import c4_line_filters

        docs = spark.createDataFrame(
            [
                # 3 good lines; one unterminated, one short, one js
                (1, "Alpha beta gamma one.\nno terminal here\nHi.\n"
                    "Use javascript now please.\nDelta epsilon zeta two!\n"
                    'He said "stop right there."'),
                # page banned by brace even though lines are clean
                (2, "Alpha beta gamma one.\nfn() { return }\n"
                    "Delta epsilon zeta two."),
                # page banned by Lorem Ipsum (case-insensitive)
                (3, "Lorem Ipsum dolor sit amet.\nAlpha beta gamma one."),
                # everything dropped -> md5('')
                (4, "short\nalso short\nnope"),
            ],
            "id long, text string",
        )
        out = {
            r.id: r
            for r in c4_line_filters(
                docs, "id", "text", min_sentences=2, emit_text=True
            ).collect()
        }
        assert out[1].n_lines == 6 and out[1].n_lines_kept == 3
        assert out[1].cleaned_text == (
            "Alpha beta gamma one.\nDelta epsilon zeta two!\n"
            'He said "stop right there."'
        )
        # 4, not 3: the engine's sentence split ([.!?]+) leaves the
        # closing quote after the final period as its own fragment —
        # consistent with sentence_array_expr everywhere else
        assert out[1].n_sentences_kept == 4 and out[1].doc_kept
        assert not out[2].doc_kept          # '{' page rule
        assert out[2].n_lines_kept == 2     # lines themselves were fine
        assert not out[3].doc_kept          # lorem ipsum, case-insensitive
        assert out[4].n_lines_kept == 0
        assert out[4].cleaned_hash == _h.md5(b"").hexdigest()
        assert not out[4].doc_kept

    def test_null_text_is_empty_page_never_minus_one(self, spark):
        """NULL text must count as an empty page — split(NULL) is NULL and
        this engine pins size(NULL) = -1, so without the coalesce guard
        the -1 sentinel leaks into n_lines / n_lines_kept (the ADVICE-r8
        finding; same class as the url_features subset70 bug)."""
        import hashlib as _h

        from data_etl_with_dbt_spark.operators.textan import (
            c4_line_filters,
            redpajama_quality_signals,
        )

        docs = spark.createDataFrame(
            [(1, None), (2, "Alpha beta gamma one. Delta epsilon zeta.")],
            "id long, text string",
        )
        r = {
            x.id: x
            for x in c4_line_filters(
                docs, "id", "text", min_sentences=1
            ).collect()
        }[1]
        assert r.n_lines == 0 and r.n_lines_kept == 0
        assert r.n_sentences_kept == 0
        assert r.doc_kept is False
        assert r.cleaned_hash == _h.md5(b"").hexdigest()
        r = {
            x.id: x
            for x in redpajama_quality_signals(docs, "id", "text").collect()
        }[1]
        for f in (
            "n_words", "n_unique_words", "n_no_alph_words", "n_symbols",
            "n_lines", "n_lines_end_ellipsis", "n_lines_start_bullet",
        ):
            assert getattr(r, f) == 0, f

    def test_custom_ban_lists(self, spark):
        from data_etl_with_dbt_spark.operators.textan import c4_line_filters

        docs = spark.createDataFrame(
            [(1, "Buy cheap pills online now.\nAlpha beta gamma delta.")],
            "id long, text string",
        )
        out = c4_line_filters(
            docs, "id", "text", min_sentences=1,
            banned_line_words=("pills",), banned_doc_substrings=(),
        ).collect()[0]
        assert out.n_lines_kept == 1 and out.doc_kept


class TestCanonicalizeText:
    def test_rules(self, spark):
        from data_etl_with_dbt_spark.operators.textan import canonicalize_text

        docs = spark.createDataFrame(
            [
                # smart quotes, NBSP, ZWSP, CRLF, tab, em-dash, BEL,
                # ellipsis char, 4-newline run, trailing spaces
                (1, "“Hi”\u00a0there\u200b.\r\nTab\there — "
                    "x\u0007…\n\n\n\nPara.  "),
                (2, None),
                (3, "already clean.\n\nsecond para."),
            ],
            "id long, text string",
        )
        out = {
            r.id: r for r in canonicalize_text(docs, "id", "text").collect()
        }
        assert out[1].text == (
            '"Hi" there.\nTab here - x...\n\nPara.'
        )
        assert out[1].n_chars_raw > out[1].n_chars
        assert out[2].text == "" and out[2].n_chars_raw == 0
        assert out[3].text == "already clean.\n\nsecond para."
        # structure preservation: the paragraph boundary survived, so the
        # paragraph unit split downstream is unchanged
        assert out[1].text.count("\n\n") == 1

    def test_idempotent(self, spark):
        """canonicalize(canonicalize(x)) == canonicalize(x) — re-running a
        nightly pipeline over already-cleaned text must be a no-op (every
        rule's output is a fixed point: ASCII quotes/dashes, single
        spaces, lone newlines, at most one blank line, trimmed edges)."""
        import random

        rng = random.Random(7)
        alphabet = [
            "a", "b", " ", "  ", "\t", "\n", "\n\n\n", "\r\n", "“", "”",
            "‘", "’", "—", "–", "…", "\u00a0", "\u200b", "\u0007", ".",
            "x y", "\u3000", "″",
        ]
        rows = [
            (i, "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40))))
            for i in range(40)
        ]
        from data_etl_with_dbt_spark.operators.textan import canonicalize_text

        docs = spark.createDataFrame(rows, "id long, text string")
        once = canonicalize_text(docs, "id", "text").select("id", "text")
        twice = canonicalize_text(once, "id", "text").select("id", "text")
        a = {r.id: r.text for r in once.collect()}
        b = {r.id: r.text for r in twice.collect()}
        assert a == b

    def test_nfkc_normalize_escape_hatch(self, spark):
        """The documented NFKC escape hatch: ligatures, fullwidth forms,
        compatibility decompositions, and combining-sequence composition
        — stdlib unicodedata through Arrow mapInPandas, schema
        passthrough, NULL passthrough, bad form rejected."""
        import pytest

        from data_etl_with_dbt_spark.operators.textan import nfkc_normalize

        docs = spark.createDataFrame(
            [
                (1, "ﬁle Ａｂｃ x² ½"),
                (2, None),
                (3, "café"),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in nfkc_normalize(docs, "id", "text").collect()}
        assert out[1].text == "file Abc x2 1⁄2"
        assert out[2].text is None
        assert out[3].text == "caf\u00e9"  # combining acute COMPOSED
        assert nfkc_normalize(docs, "id", "text").schema == docs.schema
        with pytest.raises(ValueError, match="NFKC"):
            nfkc_normalize(docs, "id", "text", form="NFX")

    def test_stays_jvm_side(self, spark):
        from data_etl_with_dbt_spark.operators.textan import canonicalize_text
        from data_etl_with_dbt_spark.plans import lint

        df = spark.createDataFrame([(1, "x")], "id long, text string")
        assert not any(
            f.code == "python-eval"
            for f in lint.lint_plan(canonicalize_text(df, "id", "text"))
        )

    def test_composes_with_c4_line_filters(self, spark):
        """The intended pipeline position: canonicalize BEFORE the C4
        rules. A page whose lines end in curly quotes / NBSP-padded
        periods FAILS the terminal-punctuation rule raw, but passes once
        canonicalized — the reason the pre-gate exists."""
        from data_etl_with_dbt_spark.operators.textan import (
            c4_line_filters,
            canonicalize_text,
        )

        messy = (
            "Alpha beta gamma one.\u00a0\r\n"        # NBSP after the period
            "“Delta epsilon zeta two.”\r\n"  # curly-quote ending
            "Eta theta iota three…"             # unicode ellipsis
        )
        docs = spark.createDataFrame([(1, messy)], "id long, text string")
        raw = c4_line_filters(
            docs, "id", "text", min_sentences=1
        ).collect()[0]
        # raw: NBSP-terminated line fails; ellipsis-char line fails
        assert raw.n_lines_kept == 1
        canon = canonicalize_text(docs, "id", "text")
        cooked = c4_line_filters(
            canon, "id", "text", min_sentences=1
        ).collect()[0]
        assert cooked.n_lines_kept == 3 and cooked.doc_kept


class TestHygieneSignalsFused:
    def test_equals_component_join(self, spark):
        """The one-scan fusion must emit EXACTLY the rows the four
        component relations joined on id produce — same column names,
        same values — on messy multi-line docs covering every rule
        (junk/short/js lines, brace and lorem pages, cyrillic, bullets,
        ellipsis, NULL text, urls incl. an unparseable host)."""
        import random

        from data_etl_with_dbt_spark.functions.web import url_features
        from data_etl_with_dbt_spark.operators.textan import (
            c4_line_filters,
            hygiene_signals,
            redpajama_quality_signals,
            script_mix_stats,
        )

        rng = random.Random(17)
        pieces = [
            "Alpha beta gamma one.",
            "no terminal here",
            "Hi.",
            "Use javascript now please.",
            "- bullet item alpha beta.",
            "to be continued maybe...",
            "кот мир да пример тест.",
            "fn() { return }",
            "Lorem Ipsum dolor sit amet.",
            "123 456 %% tokens here.",
        ]
        rows = []
        for i in range(30):
            n = rng.randint(1, 7)
            rows.append(
                (
                    i,
                    "\n".join(rng.choice(pieces) for _ in range(n)),
                    f"https://h{i}.example.com/p{i}?a=1"
                    if i % 3
                    else f"https://10.0.{270 + i}.1/p",  # unparseable host
                )
            )
        rows.append((99, None, "https://ok.example.com/"))
        docs = spark.createDataFrame(rows, "id long, text string, url string")

        fused = hygiene_signals(
            docs, "id", "text", url_col="url", min_sentences=2
        )
        c4 = c4_line_filters(docs, "id", "text", min_sentences=2)
        sm = script_mix_stats(docs, "id", "text")
        rp = redpajama_quality_signals(docs, "id", "text").drop("n_lines")
        uf = docs.select("id", *url_features("url"))
        joined = uf.join(sm, "id").join(rp, "id").join(c4, "id")

        assert sorted(fused.columns) == sorted(joined.columns)
        cols = sorted(fused.columns)
        key = lambda t: tuple(  # noqa: E731 - None-safe total order
            (v is None, str(v)) for v in t
        )
        got = sorted(
            (tuple(r) for r in fused.select(*cols).collect()), key=key
        )
        exp = sorted(
            (tuple(r) for r in joined.select(*cols).collect()), key=key
        )
        assert got == exp

    def test_single_scan_no_joins(self, spark):
        """The fusion's reason to exist: ONE scan, zero joins, zero
        exchanges — vs the component composition's four scans + three
        joins."""
        from data_etl_with_dbt_spark.operators.textan import hygiene_signals

        df = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).select("doc_id", "text")
        plan = (
            hygiene_signals(df, "doc_id", "text")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("FileScan parquet") == 1
        assert "Join" not in plan and "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


class TestRedpajamaSignals:
    def test_signal_counts(self, spark):
        from data_etl_with_dbt_spark.operators.textan import (
            redpajama_quality_signals,
        )

        docs = spark.createDataFrame(
            [
                (1, "- first bullet\nplain line here\nwait for it...\n"
                    "count 123 %% symbols # and … done\nalpha alpha alpha"),
                (2, ""),
            ],
            "id long, text string",
        )
        out = {
            r.id: r
            for r in redpajama_quality_signals(docs, "id", "text").collect()
        }
        r = out[1]
        assert r.n_lines == 5
        assert r.n_lines_start_bullet == 1
        assert r.n_lines_end_ellipsis == 1
        # no-alph words: '123', '%%', '#', '…' (plus '-' from the bullet)
        assert r.n_no_alph_words == 5
        assert r.n_symbols == 3  # '#', '...', '…'
        assert r.n_words == 20 and r.n_unique_words == 18  # alpha x3 dedups
        r = out[2]
        assert (r.n_words, r.n_lines, r.n_symbols) == (0, 0, 0)
