"""One-pass data-quality observation: metrics collected DURING the write job
via ``DataFrame.observe`` (Spark's Observation API) instead of separate
count actions afterwards.

Why it matters at scale: the dbt-style test protocol (``plans/dq.py``) runs
each check as its own action — correct, but each action re-reads the
materialized table. ``observe`` attaches aggregate expressions to the plan
itself, so the metrics fall out of the SAME job that materializes the model:
a 100 TB write produces its row count, null counts, ranges, and violation
tallies for free (the aggregates ride the existing scan, map-side combined,
merged on the driver as one tiny row).

The two surfaces compose: ``observed_metrics`` for the in-flight numbers,
then ``plans/monitor.record_stats``-style history + anomaly detection on
top. Checks that need row-level evidence (WHICH rows violated) still use
``dq.run_test`` — observation tells you THAT something is wrong in the same
job; the targeted violation query tells you what, scanning only on demand.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def standard_metrics(df: DataFrame, columns: list[str] | None = None) -> list:
    """The default per-write metric set: row count plus per-column null
    tallies (the T1 not_null check as a free aggregate). All BIGINT."""
    cols = columns if columns is not None else df.columns
    exprs = [F.count(F.lit(1)).alias("n_rows")]
    exprs += [
        F.count(F.when(F.col(c).isNull(), 1)).alias(f"nulls_{c}") for c in cols
    ]
    return exprs


def observed_write(
    df: DataFrame,
    write: Callable[[DataFrame], None],
    metrics: list | None = None,
    name: str = "dq",
) -> dict:
    """Run ``write(df)`` with observation attached; returns the metric dict
    measured over exactly the rows the write consumed — one job, no second
    scan, and no race against concurrent table changes (the numbers are
    from the write's own read, not a later re-read)."""
    obs = Observation(name)
    observed = df.observe(obs, *(metrics if metrics is not None else standard_metrics(df)))
    write(observed)
    return obs.get


def violation_metrics(checks: dict[str, F.Column]) -> list:
    """Violation tallies from boolean predicates: each entry counts rows
    where the predicate is TRUE (violating). Pass e.g.
    ``{"negative_fare": F.col("fare_amount") <= 0}``; pair with
    ``dq.run_test`` afterwards only for checks that reported > 0."""
    return [
        F.count(F.when(pred, 1)).alias(f"violations_{label}")
        for label, pred in checks.items()
    ]
