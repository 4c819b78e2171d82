"""Physical-plan linter: mechanical checks for the anti-patterns that kill
plans at 100 TB. The repo's own regression tests (tests/test_plan_shapes.py)
assert these properties query-by-query; this module exposes the same checks
as a reusable pre-flight for user-authored pipelines:

    findings = lint_plan(df)            # [] == clean
    lint_plan(df, max_shuffles=1)       # enforce a shuffle budget

Checked (each maps to a measured failure mode, see BENCH_NOTES.md):

* ``cartesian``      — CartesianProduct / BroadcastNestedLoopJoin: O(|L|·|R|)
                       row explosion; usually a missing equi-key or a range
                       join that should be banded.
* ``python-eval``    — BatchEvalPython / ArrowEvalPython: per-row (or even
                       Arrow-batched) Python in the plan; hot paths belong in
                       JVM expressions.
* ``single-partition``— Exchange SinglePartition: the whole dataset through
                       one task (global sort / unpartitioned window); fine
                       for k-row metadata frames, fatal on data paths.
* ``unpushed-filter`` — a Filter sitting directly on a parquet FileScan with
                       an empty PushedFilters list: the predicate streams
                       every row instead of pruning row groups.
* ``shuffle-budget``  — more Exchange nodes than ``max_shuffles`` (opt-in):
                       each exchange re-materializes the stream; the
                       headline queries here compile to ≤ 1.

Text-match based by design: it reads ``executedPlan`` output, the same
surface ``.explain`` gives users, so findings quote recognizable plan
fragments. A finding is a hint, not a verdict — e.g. a deliberate
``crossJoin(broadcast(scalar_agg))`` trips ``cartesian``; pass
``allow=("cartesian",)`` to acknowledge."""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    code: str
    message: str

    def __str__(self) -> str:  # readable in assertion output
        return f"[{self.code}] {self.message}"


_EXCHANGE = re.compile(r"Exchange (hash|range)partitioning|Exchange SinglePartition")


def count_exchanges(plan: str) -> int:
    """Materializing exchanges in a physical-plan string. A ReusedExchange
    line embeds the original's "Exchange hashpartitioning(...)" text but
    materializes nothing — counting it would fail shuffle budgets for
    exactly the exchange-reuse pattern worth rewarding."""
    return sum(
        1
        for line in plan.splitlines()
        if "ReusedExchange" not in line and _EXCHANGE.search(line)
    )


def plan_text(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def lint_plan(
    df: DataFrame,
    max_shuffles: int | None = None,
    allow: tuple[str, ...] = (),
) -> list[Finding]:
    plan = plan_text(df)
    findings: list[Finding] = []

    if "CartesianProduct" in plan or "BroadcastNestedLoopJoin" in plan:
        findings.append(
            Finding(
                "cartesian",
                "nested-loop/cartesian join: O(|L|*|R|) at scale — add an "
                "equi-key, band the range condition, or broadcast a scalar",
            )
        )
    if "BatchEvalPython" in plan or "ArrowEvalPython" in plan:
        findings.append(
            Finding(
                "python-eval",
                "Python evaluation in the plan: rows serialize out of the "
                "JVM — prefer built-in expressions; if Python is required, "
                "Arrow-batched mapInPandas on a narrow projection",
            )
        )
    # Exchange SinglePartition is FINE when it merges a global aggregate's
    # partials (one pre-aggregated row per upstream partition rides the
    # wire, not the dataset — the partial/final pattern). It is a data-path
    # hazard when the FULL stream funnels through one task: an
    # unpartitioned window, a global sort, a repartition(1).
    _agg = re.compile(r"HashAggregate|SortAggregate|ObjectHashAggregate")
    plan_lines = plan.splitlines()
    for i, line in enumerate(plan_lines):
        if "Exchange SinglePartition" not in line:
            continue
        producer = next(
            (l for l in plan_lines[i + 1 : i + 3] if l.strip()), ""
        )
        consumers = plan_lines[max(0, i - 3) : i]
        if _agg.search(producer) and any(_agg.search(l) for l in consumers):
            continue  # partial+final global aggregate: partials-only wire
        findings.append(
            Finding(
                "single-partition",
                "single-partition exchange on a data path (global sort / "
                "unpartitioned window / repartition(1)): the whole input "
                "flows through ONE task — partition the window, use "
                "TakeOrderedAndProject-shaped top-k, or pre-aggregate "
                "before the merge",
            )
        )
        break
    # a Filter with a REAL predicate (not just null guards) sitting directly
    # on a parquet scan (only Project/ColumnarToRow between) where nothing
    # selective was pushed: the scan decodes every row group and the
    # predicate runs post-hoc on every row
    lines = plan.splitlines()
    _passthrough = ("ColumnarToRow", "Project", "InputAdapter", "WholeStageCodegen")
    for i, line in enumerate(lines):
        fm = re.search(r"Filter \((.*)$", line)
        if fm is None:
            continue
        cond = re.sub(r"isnotnull\([^)]*\)|isnull\([^)]*\)", "", fm.group(1))
        if not re.search(r"[A-Za-z0-9#]", cond.replace("AND", "")):
            continue  # pure null-check filter: IsNotNull pushdown IS complete
        for nxt in lines[i + 1 : i + 6]:
            if "FileScan parquet" in nxt:
                pm = re.search(r"PushedFilters: \[([^\]]*)\]", nxt)
                pushed = (
                    [p.strip() for p in pm.group(1).split(",") if p.strip()]
                    if pm
                    else []
                )
                if pm is not None and all(p.startswith("IsNotNull") for p in pushed):
                    findings.append(
                        Finding(
                            "unpushed-filter",
                            "filter over a parquet scan pushed nothing "
                            f"selective (PushedFilters: [{pm.group(1)}]) — "
                            "the predicate prunes no row groups; "
                            "restructure it into a pushable comparison on "
                            "the raw column",
                        )
                    )
                break
            if not any(t in nxt for t in _passthrough):
                break  # something non-trivial between filter and scan
        if any(f.code == "unpushed-filter" for f in findings):
            break
    if max_shuffles is not None:
        n = count_exchanges(plan)
        if n > max_shuffles:
            findings.append(
                Finding(
                    "shuffle-budget",
                    f"{n} exchanges (budget {max_shuffles}): each one "
                    "re-materializes the stream — broadcast dimensions, "
                    "reuse partitioning across stages, or pre-bucket",
                )
            )
    return [f for f in findings if f.code not in allow]


def assert_clean(df: DataFrame, **kwargs) -> None:
    """Raise AssertionError listing every finding — the one-liner for tests
    and CI gates: ``lint.assert_clean(my_query_df, max_shuffles=1)``."""
    findings = lint_plan(df, **kwargs)
    assert not findings, "; ".join(str(f) for f in findings)
