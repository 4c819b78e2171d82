"""Fixture-calibration margin guards (ADVICE r7).

semantic_contamination / semantic dedup compare float64 cosines from numpy
BLAS matmuls against the calibrated 0.35 threshold, while the DuckDB
oracle recomputes each cosine with a sequential dot-product fold. The two
summation orders differ in the last ulps, so a pair landing WITHIN
floating-point noise of the threshold could flip the integer hit count
between engines and break driver hash parity. These tests pin the
guarantee explicitly: on the current fixtures, no relevant cosine lies
within 1e-9 of 0.35, on either side of either split.

Pure numpy + pyarrow (no Spark session) so the guard is cheap enough to
run every round against the REGENERATED fixtures.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
THRESHOLD = 0.35
EPS = 1e-9


def _normalized_embeddings(sf: str):
    t = pq.read_table(
        os.path.join(TESTDATA, sf, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    ).to_pydict()
    seen = {}
    for vid, emb in zip(t["vec_id"], t["embedding"]):
        seen[(vid, tuple(emb))] = (vid, emb)
    ids = np.array([v[0] for v in seen.values()])
    X = np.asarray([v[1] for v in seen.values()], dtype=np.float64)
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0.0] = 1.0
    return ids, X / n


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_semantic_dedup_threshold_margin(sf):
    ids, Xn = _normalized_embeddings(sf)
    S = Xn @ Xn.T
    pair = S[np.triu_indices(len(ids), k=1)]
    margin = np.abs(pair - THRESHOLD).min()
    assert margin > EPS, (
        f"{sf}: a pairwise cosine sits {margin:.2e} from the 0.35 "
        "threshold — BLAS summation-order variation could flip it; "
        "recalibrate the suite threshold"
    )
    assert (pair >= THRESHOLD).any(), f"{sf}: dedup threshold went vacuous"


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01"])
def test_semantic_decontamination_threshold_margin(sf):
    ids, Xn = _normalized_embeddings(sf)
    bench = ids % 19 == 0
    S = Xn[~bench] @ Xn[bench].T
    margin = np.abs(S - THRESHOLD).min()
    assert margin > EPS, (
        f"{sf}: a train-bench cosine sits {margin:.2e} from 0.35 — "
        "cross-engine hit counts could diverge; recalibrate"
    )
    hits_per_train = (S >= THRESHOLD).sum(axis=1)
    assert hits_per_train.sum() > 0, f"{sf}: decontamination went vacuous"
    assert (hits_per_train == 0).any(), (
        f"{sf}: every train doc contaminated — threshold too low to "
        "discriminate"
    )
