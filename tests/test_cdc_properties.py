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


class TestTableDiffProperties:
    """Randomized table_diff vs a dict reference model: statuses and
    changed-column lists must match the obvious per-key definition for
    arbitrary overlaps, NULL patterns, and column differences."""

    def _scenario(self, rng):
        keys_a = rng.sample(range(20), rng.randint(0, 15))
        keys_b = rng.sample(range(20), rng.randint(0, 15))

        def row(k):
            return (
                k,
                rng.choice([None, "x", "y", "z"]),
                rng.choice([None, 1.0, 2.0, 3.0]),
            )

        return [row(k) for k in keys_a], [row(k) for k in keys_b]

    def _model(self, a_rows, b_rows):
        a = {r[0]: r[1:] for r in a_rows}
        b = {r[0]: r[1:] for r in b_rows}
        out = {}
        for k in set(a) | set(b):
            if k not in b:
                out[k] = ("only_a", "")
            elif k not in a:
                out[k] = ("only_b", "")
            else:
                diffs = [
                    name
                    for name, x, y in (
                        ("s", a[k][0], b[k][0]),
                        ("v", a[k][1], b[k][1]),
                    )
                    if x != y  # NULL-safe: None == None is equal
                ]
                out[k] = ("changed" if diffs else "equal", ",".join(diffs))
        return out

    def test_matches_reference_model(self, spark):
        import random

        from data_etl_with_dbt_spark.plans.monitor import table_diff

        rng = random.Random(23)
        for trial in range(6):
            a_rows, b_rows = self._scenario(rng)
            a = spark.createDataFrame(a_rows, "k int, s string, v double")
            b = spark.createDataFrame(b_rows, "k int, s string, v double")
            got = {
                r.k: (r.diff_status, r.changed_cols)
                for r in table_diff(a, b, ["k"]).collect()
            }
            assert got == self._model(a_rows, b_rows), f"trial {trial}"
