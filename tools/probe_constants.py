"""Round-start probe of every fixture-calibrated constant in the suite.

The driver REGENERATES the parquet fixtures each round (CLAUDE.md standing
risk; q8 went vacuous in r4, q19/q16 in r5 exactly this way), so every
constant that was calibrated against a previous round's data must be
re-checked before trusting the registry: semantic thresholds (0.35 x2),
decontamination residues (%97, %19), fetch-plan budget/quota truncation
non-vacuity, the media <120-id corpus, and the TPC-H substitution
predicates with a vacuity history. Also records sum(basket_size^2) on
lineitem — the work metric of market_basket_lift's pair join — to settle
floor-shift questions (host drift vs fixture drift) with data.

Run: ``python tools/probe_constants.py`` (DuckDB single-threaded + numpy;
no Spark). Prints one table row per probe; exits non-zero if any probe
goes VACUOUS or a cosine sits within 1e-9 of a calibrated threshold.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

SFS = ["sf0.001", "sf0.01", "sf0.1"]
ROOT = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")

FAILURES: list[str] = []


def row(name: str, sf: str, value, ok: bool, note: str = "") -> None:
    flag = "ok" if ok else "VACUOUS/FAIL"
    print(f"{name:38s} {sf:8s} {str(value):>24s}  {flag}  {note}")
    if not ok:
        FAILURES.append(f"{name}@{sf}: {value} {note}")


def connect(sf: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("SET threads=4")
    for t in [
        "region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{ROOT}/{sf}/{t}.parquet')"
        )
    return con


def cosine_margins(sf: str) -> None:
    """Semantic thresholds: 0.35 for LSH/exact semantic dedup (all-pairs
    cosine on distinct embeddings) and 0.35 for decontamination
    (train %19!=0 x bench %19==0). Both need (a) hits on BOTH sides of
    the threshold (non-vacuous) and (b) no cosine within 1e-9 of it
    (ADVICE r7: BLAS summation-order variation must not flip a pair)."""
    con = connect(sf)
    rows = con.execute(
        "SELECT DISTINCT vec_id, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    X = np.asarray([list(r[1]) for r in rows], dtype=np.float64)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    Xn = X / n
    S = Xn @ Xn.T
    iu = np.triu_indices(len(ids), k=1)
    pair = S[iu]
    thr = 0.35
    margin = np.abs(pair - thr).min()
    above = int((pair >= thr).sum())
    row(
        "semantic_dedup cos>=0.35 pairs", sf, above,
        above > 0 and margin > 1e-9,
        f"max={pair.max():.4f} margin={margin:.2e}",
    )
    bench_mask = ids % 19 == 0
    Sc = S[~bench_mask][:, bench_mask]
    cmargin = np.abs(Sc - thr).min()
    hits = int((Sc >= thr).sum())
    contaminated = int(((Sc >= thr).sum(axis=1) > 0).sum())
    row(
        "semantic_decontam hits (%19 split)", sf,
        f"{contaminated}/{(~bench_mask).sum()} docs",
        hits > 0 and contaminated < int((~bench_mask).sum())
        and cmargin > 1e-9,
        f"bench={int(bench_mask.sum())} margin={cmargin:.2e}",
    )
    con.close()


def ngram_decontam(sf: str) -> None:
    con = connect(sf)
    nb, nt = con.execute(
        "SELECT count(DISTINCT doc_id) FILTER (doc_id % 97 = 0),"
        " count(DISTINCT doc_id) FILTER (doc_id % 97 <> 0) FROM documents"
    ).fetchone()
    row("ngram_decontam %97 bench/train", sf, f"{nb}/{nt}", nb > 0 and nt > 0)
    con.close()


def media_corpus(sf: str) -> None:
    con = connect(sf)
    n = con.execute(
        "SELECT count(DISTINCT doc_id) FROM documents WHERE doc_id < 120"
    ).fetchone()[0]
    row("media corpus doc_id<120", sf, n, n > 0)
    con.close()


def tpch_substitutions(sf: str) -> None:
    con = connect(sf)
    checks = [
        ("q14/q8 p_type='PROMO'", "SELECT count(*) FROM part WHERE p_type='PROMO'"),
        ("q19 Brand#12 sz1-15", "SELECT count(*) FROM part WHERE p_brand='Brand#12' AND p_size BETWEEN 1 AND 15"),
        ("q19 Brand#23 sz1-25", "SELECT count(*) FROM part WHERE p_brand='Brand#23' AND p_size BETWEEN 1 AND 25"),
        ("q19 Brand#15 sz1-50", "SELECT count(*) FROM part WHERE p_brand='Brand#15' AND p_size BETWEEN 1 AND 50"),
        ("q16 Brand#13 excl", "SELECT count(*) FROM part WHERE p_brand='Brand#13' AND p_size IN (1,7,14,23,36,45,49,9)"),
    ]
    for name, sql in checks:
        c = con.execute(sql).fetchone()[0]
        row(name, sf, c, c > 0)
    con.close()


def fetch_plan_truncation(sf: str) -> None:
    """Both truncation stages of crawl_fetch_plan must stay non-vacuous:
    some host must exceed the 20-per-host quota, and the post-quota
    survivor count must exceed the 400-URL budget."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from data_etl_with_dbt_spark.suite.registry import QUERIES

    sched_sql = QUERIES["recrawl_schedule_events"].oracle
    con = connect(sf)
    mx, post_quota = con.execute(
        f"""
        WITH sched AS ({sched_sql}),
        hosted AS (
            SELECT url,
                   lower(regexp_extract(url, '^https://([^/]+)', 1)) AS host
            FROM sched WHERE priority >= 1
        ),
        per_host AS (SELECT host, count(*) AS c FROM hosted GROUP BY host)
        SELECT max(c), sum(least(c, 20)) FROM per_host
        """
    ).fetchone()
    row(
        "fetch_plan quota20/budget400", sf,
        f"maxhost={mx} postq={post_quota}",
        mx is not None and mx > 20 and post_quota > 400,
    )
    con.close()


def basket_work(sf: str) -> None:
    """sum(basket_size^2) — the pair-join work metric for
    market_basket_lift; recorded per round to attribute floor shifts."""
    con = connect(sf)
    s2, nord = con.execute(
        """
        WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        sz AS (SELECT l_orderkey, count(*) AS b FROM basket GROUP BY 1)
        SELECT sum(b*b), count(*) FROM sz
        """
    ).fetchone()
    row("market_basket sum(b^2)/orders", sf, f"{s2}/{nord}", s2 is not None and s2 > 0)
    con.close()


def curation_components(sf: str) -> None:
    """Round-8 composite inputs: the Gopher bands (30-90 words etc.), the
    0.5 n-gram contamination threshold, and the mostly-dup split
    (dup tokens > half) must each split the corpus non-vacuously — the
    curation_decisions oracle reuses all three verbatim."""
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from data_etl_with_dbt_spark.suite.registry import QUERIES

    con = connect(sf)
    g = con.execute(
        f"""SELECT count(*) FILTER (passes_gopher),
                   count(*) FILTER (NOT passes_gopher)
            FROM ({QUERIES["gopher_quality_flags"].oracle})"""
    ).fetchone()
    row("gopher bands pass/fail", sf, f"{g[0]}/{g[1]}", g[0] > 0 and g[1] > 0)
    c = con.execute(
        f"""SELECT count(*) FILTER (contaminated), count(*)
            FROM ({QUERIES["decontaminate_ngram_overlap"].oracle})"""
    ).fetchone()
    # contamination at 0.5 is allowed to be zero at one SF (it fires at
    # sf0.001); report it, only fail if ALL rows contaminated
    row(
        "ngram contaminated@0.5", sf, f"{c[0]}/{c[1]}",
        c[0] < c[1], "zero-ok (fires at sf0.001)",
    )
    d = con.execute(
        f"""SELECT count(*) FILTER (n_tokens_removed * 2 > n_tokens),
                   count(*)
            FROM ({QUERIES["exact_substring_dedup_cut"].oracle})"""
    ).fetchone()
    row("mostly-dup docs (dup>half)", sf, f"{d[0]}/{d[1]}", 0 < d[0] < d[1])
    con.close()


def main() -> int:
    for sf in SFS:
        cosine_margins(sf)
        ngram_decontam(sf)
        media_corpus(sf)
        tpch_substitutions(sf)
        fetch_plan_truncation(sf)
        basket_work(sf)
        curation_components(sf)
    print()
    if FAILURES:
        print("FAILED probes:")
        for f in FAILURES:
            print(" -", f)
        return 1
    print("all probes non-vacuous, all margins safe")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
