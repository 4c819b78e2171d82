"""Property-style tests for apply_cdc: randomized change batches compared
against a dictionary reference model (the semantics spec: highest-sequence
op per key wins; delete nets to absent; untouched keys pass through)."""

from __future__ import annotations

import random

from data_etl_with_dbt_spark.operators.relational import apply_cdc


def _scenario(rng: random.Random):
    base = {k: rng.uniform(-100, 100) for k in rng.sample(range(12), rng.randint(0, 8))}
    n_changes = rng.randint(1, 25)
    changes = []
    for seq in range(1, n_changes + 1):
        k = rng.randrange(12)
        op = rng.choice(["insert", "update", "delete"])
        changes.append((k, rng.uniform(-100, 100), seq, op))
    return base, changes


def _model(base: dict, changes: list) -> dict:
    latest: dict = {}
    for k, v, seq, op in changes:
        if k not in latest or seq > latest[k][1]:
            latest[k] = ((op, v), seq)
    out = dict(base)
    for k, ((op, v), _seq) in latest.items():
        if op == "delete":
            out.pop(k, None)
        else:
            out[k] = v
    return out


def test_apply_cdc_matches_reference_model(spark):
    rng = random.Random(42)
    for trial in range(6):
        base, changes = _scenario(rng)
        base_df = spark.createDataFrame(
            [(k, v) for k, v in base.items()] or [(None, None)], "id long, v double"
        ).where("id IS NOT NULL")
        ch_df = spark.createDataFrame(changes, "id long, v double, seq long, op string")
        got = {r.id: r.v for r in apply_cdc(base_df, ch_df, key="id", seq_col="seq").collect()}
        want = _model(base, changes)
        assert got == want, f"trial {trial}: {got} != {want}\nbase={base}\nchanges={changes}"
