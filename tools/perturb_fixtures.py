"""Generate a PERTURBED copy of a fixture directory and (optionally) run
the oracle-parity sweep against it.

    python tools/perturb_fixtures.py [src_sf_dir] [out_dir]
    SPARK_GRAFT_TEST_SF_DIR=<out_dir> python -m pytest tests/test_oracle_parity.py -q

Why: the grading driver REGENERATES the parquet fixtures every round
(TESTDATA.md; the events timestamp type already changed twice across
rounds), so any suite query whose cross-engine hash-match is secretly
fixture-lucky — a tie under LIMIT without a total order, a threshold
sitting on a data point, an engine-divergent expression that happens to
agree on today's values — passes every in-repo check and then goes red in
a later round. Re-running the SAME parity harness on a deterministic
row-subset of the fixtures (70% of every large table, lookup tables kept
whole; FK completeness deliberately broken for orders/customer stress)
changes every aggregate, every ranking, and every threshold comparison
while remaining byte-identical input to BOTH engines — parity must still
hold on every oracle-bearing query, or the query was fragile.

Modes (third argv, default ``subset70``) — all deterministic, no RNG, so
re-runs and engines agree on the bytes:

* ``subset70`` — keep row i iff i % 10 < 7: every aggregate, ranking, and
  threshold moves; FKs go incomplete.
* ``subset30`` — keep i % 10 < 3: harsher — sparse groups, empty windows,
  more LIMIT ties to expose missing total orders.
* ``dup2``     — every row TWICE: stresses uniqueness assumptions
  (surrogate keys, row_number dedup, distinct counts) identically on both
  engines. KNOWN to red the key-contract class (see BENCH_NOTES session
  4): operators whose semantics assume the PK uniqueness TPC-H declares.
* ``reverse``  — same rows, file order reversed: every aggregate is
  identical, so any parity failure is an ORDER dependency — a
  collect_list whose merge order leaks into output, a LIMIT without a
  total order, a float fold whose accumulation order the query promised
  not to expose (the round-5 PRF-vector bug class).
* ``ts_nanos`` — rows unchanged, but events.ts re-typed TIMESTAMP(NANOS)
  (the round-1 fixture form; the driver has already changed this type
  between rounds once) — rehearses the sources/io nanos→µs normalization
  against every events-touching oracle.
"""

from __future__ import annotations

import os
import sys

LOOKUPS = {"region", "nation"}  # tiny dimension tables: subsetting these
# just blanks region-filtered queries into vacuity; keep them whole
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


VALID_MODES = ("subset70", "subset30", "dup2", "reverse", "ts_nanos")


def perturb(src: str, out: str, mode: str = "subset70") -> None:
    import pyarrow.parquet as pq

    # validate BEFORE writing anything: the old per-table check fired
    # after the lookup tables landed, leaving a partial output directory
    # on a typo'd mode
    if mode not in VALID_MODES:
        raise SystemExit(f"unknown mode {mode!r}; valid: {VALID_MODES}")
    os.makedirs(out, exist_ok=True)
    import pyarrow as pa

    for t in TABLES:
        tbl = pq.read_table(os.path.join(src, f"{t}.parquet"))
        if mode == "ts_nanos":
            if t == "events":
                i = tbl.schema.get_field_index("ts")
                tbl = tbl.set_column(
                    i, "ts", tbl.column("ts").cast(pa.timestamp("ns"))
                )
        elif t not in LOOKUPS:
            if mode == "subset70":
                take = [i for i in range(tbl.num_rows) if i % 10 < 7]
            elif mode == "subset30":
                take = [i for i in range(tbl.num_rows) if i % 10 < 3]
            elif mode == "dup2":
                take = [i // 2 for i in range(2 * tbl.num_rows)]
            elif mode == "reverse":
                take = list(range(tbl.num_rows - 1, -1, -1))
            else:
                raise SystemExit(f"unknown mode {mode!r}")
            tbl = tbl.take(take)
        kw = {"store_schema": False} if mode == "ts_nanos" else {}
        pq.write_table(tbl, os.path.join(out, f"{t}.parquet"), **kw)
        print(f"{t}: {tbl.num_rows} rows -> {out}")


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/perturbed_fixtures"
    mode = sys.argv[3] if len(sys.argv) > 3 else "subset70"
    perturb(src, out, mode)
    print(
        f"\nrun:  SPARK_GRAFT_TEST_SF_DIR={out} "
        "python -m pytest tests/test_oracle_parity.py -q"
    )


if __name__ == "__main__":
    main()
