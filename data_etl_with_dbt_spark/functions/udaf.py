"""Custom aggregate (UDAF) surface — the one §2.11 mechanism the engine
had not yet exemplified. Spark's Python UDAF story is the GROUPED_AGG
pandas_udf: one Arrow batch per group per column, a scalar back.

Ground rules encoded here (and in the tests):

* **Reach for a UDAF last.** Most "custom" aggregates are expressible in
  Catalyst (trimmed mean = percentile_disc bounds + conditional AVG;
  geometric mean = exp(avg(ln x))) and those forms are codegen'd,
  map-side combined, and cross-engine checkable. The UDAF exemplars exist
  for the cases that genuinely need imperative per-group logic — and each
  ships NEXT TO its built-in twin so the trade is measurable.
* **GROUPED_AGG does not partial-aggregate.** Every group's full column
  ships to one task as an Arrow batch — fine for bounded groups,
  dangerous for skewed/huge ones (the same bound as collect_list). The
  built-in spellings keep map-side combine; that asymmetry is the real
  cost of the Python escape hatch, more than the interpreter.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


@F.pandas_udf("double")
def trimmed_mean_udaf(v: pd.Series) -> float:
    """GROUPED_AGG UDAF: 10%-trimmed mean (drop the lowest and highest
    decile, average the rest) — the robust-location estimate."""
    lo, hi = v.quantile(0.1), v.quantile(0.9)
    kept = v[(v >= lo) & (v <= hi)]
    return float(kept.mean()) if len(kept) else float("nan")


def trimmed_mean_builtin(df, keys: list[str], col: str, frac: float = 0.1):
    """The Catalyst spelling of a per-group trimmed mean: percentile_disc
    bounds in one aggregation (DATA values, so the bounds are actual
    sample points), broadcast back, conditional AVG in a second — the
    winsorize pattern, both passes map-side combined, no Python, no
    whole-group materialization. Returns ``keys + [trimmed_mean]``.

    The numeric result can differ at the margins from the UDAF's
    pandas-interpolated quantile bounds; the tests compare within
    tolerance, not bit-exactly — the point of the pair is the PLAN
    difference, not decimal agreement."""
    bounds = df.groupBy(*[F.col(k).alias(f"__k_{k}") for k in keys]).agg(
        F.expr(f"percentile_disc({frac}) WITHIN GROUP (ORDER BY {col})").alias("__lo"),
        F.expr(f"percentile_disc({1 - frac}) WITHIN GROUP (ORDER BY {col})").alias("__hi"),
    )
    # null-safe equality: a plain == never matches NULL keys, which would
    # silently DROP the whole NULL-key group the UDAF twin keeps
    cond = [df[k].eqNullSafe(bounds[f"__k_{k}"]) for k in keys]
    joined = df.join(F.broadcast(bounds), cond)
    inside = (F.col(col) >= F.col("__lo")) & (F.col(col) <= F.col("__hi"))
    return joined.groupBy(*keys).agg(
        F.avg(F.when(inside, F.col(col))).alias("trimmed_mean")
    )


def geometric_mean(col: Column) -> Column:
    """Geometric mean the Catalyst way: ``exp(avg(ln(x)))`` for positive
    x — the built-in twin that makes a geometric-mean UDAF unnecessary."""
    return F.exp(F.avg(F.log(col)))
