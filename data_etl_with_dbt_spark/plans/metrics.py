"""Metrics layer (dbt semantic-layer shape): declare a measure ONCE —
aggregation, base relation, allowed dimensions, optional filter — and query
it by (metrics, dimensions) without rewriting the aggregation anywhere.

Why it earns its place in the engine rather than staying a style guide:

* **Consistency** — "revenue" is one definition; every dashboard slice of
  it compiles from the same expression, the core promise of a semantic
  layer.
* **One scan for N metrics** — querying several metrics over the same base
  relation compiles to a SINGLE groupBy with N aggregate expressions (not
  N queries): one pass over 100 TB, map-side combined, however many
  measures ride along. Metrics over different bases join on the requested
  dimensions afterwards (dimension-cardinality frames, metadata not data).
* **Declarative filters** — a metric's filter is a Column predicate pushed
  into the scan (Catalyst sees it before the aggregation, so parquet
  pruning still applies).

Spark-first: a metric is ``(loader, measure_fn, dimensions, filter_fn)``
where ``measure_fn()`` returns an aggregate Column — the registry never
stores SQL text, so Catalyst owns the whole plan.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class MetricSpec:
    name: str
    loader: Callable[[SparkSession], DataFrame]
    measure: Callable[[], Column]  # aggregate expression factory
    dimensions: list[str]  # dimensions this metric may be sliced by
    filter: Callable[[], Column] | None = None
    description: str = ""
    # timestamp/date column for metric_time grains (dbt semantic layer's
    # metric_time): declared once, so "daily revenue" and "monthly
    # revenue" are the SAME metric at different grains, never two
    # definitions that can drift
    time_dimension: str | None = None


class MetricRegistry:
    def __init__(self) -> None:
        self._metrics: dict[str, MetricSpec] = {}

    def define(
        self,
        name: str,
        loader: Callable[[SparkSession], DataFrame],
        measure: Callable[[], Column],
        dimensions: list[str],
        filter: Callable[[], Column] | None = None,
        description: str = "",
        time_dimension: str | None = None,
    ) -> None:
        self._metrics[name] = MetricSpec(
            name, loader, measure, list(dimensions), filter, description,
            time_dimension,
        )

    def __contains__(self, name: str) -> bool:
        return name in self._metrics

    def list(self) -> list[str]:
        return sorted(self._metrics)

    def query(
        self,
        spark: SparkSession,
        metrics: list[str],
        dimensions: list[str] | None = None,
        grain: str | None = None,
    ) -> DataFrame:
        """Compile a (metrics, dimensions) request to DataFrame plans.

        Validates every requested dimension against every metric's allowed
        set (the semantic-layer guarantee: no accidental slicing by a
        dimension the measure doesn't support). Metrics sharing a loader
        AND filter collapse into one groupBy — one scan computes them all;
        groups from different bases full-outer-join on the dimension key so
        a missing slice in one base shows NULL, not a dropped row.

        ``grain`` ('day'/'week'/'month'/'quarter'/'year') adds a
        ``metric_time`` column truncated from each metric's declared
        ``time_dimension`` — the dbt-semantic-layer metric_time: one
        metric definition serves every rollup granularity."""
        _GRAINS = ("day", "week", "month", "quarter", "year")
        if grain is not None and grain not in _GRAINS:
            raise ValueError(f"grain must be one of {_GRAINS}, got {grain!r}")
        dims = list(dimensions or [])
        specs = []
        for m in metrics:
            if m not in self._metrics:
                raise KeyError(f"unknown metric {m!r}; defined: {self.list()}")
            spec = self._metrics[m]
            bad = [d for d in dims if d not in spec.dimensions]
            if bad:
                raise ValueError(
                    f"metric {spec.name!r} cannot slice by {bad}; allowed: {spec.dimensions}"
                )
            if grain is not None and spec.time_dimension is None:
                raise ValueError(
                    f"metric {spec.name!r} declares no time_dimension; "
                    f"cannot roll up at grain {grain!r}"
                )
            specs.append(spec)

        # group metrics by (loader, filter, time dim) identity -> one scan
        # per group; with no grain the time dimension never enters the
        # plan, so it must not split metrics that share loader+filter
        # into separate scans
        groups: dict[tuple, list[MetricSpec]] = {}
        for s in specs:
            tkey = s.time_dimension if grain else None
            groups.setdefault((s.loader, s.filter, tkey), []).append(s)

        keys = dims + (["metric_time"] if grain else [])
        frames = []
        for (loader, filt, tdim), group in groups.items():
            df = loader(spark)
            if filt is not None:
                df = df.where(filt())
            if grain:
                df = df.withColumn(
                    "metric_time",
                    F.date_trunc(grain, F.col(tdim)).cast("date"),
                )
            aggs = [s.measure().alias(s.name) for s in group]
            if keys:
                frames.append(df.groupBy(*keys).agg(*aggs))
            else:
                frames.append(df.agg(*aggs))

        out = frames[0]
        for f in frames[1:]:
            out = out.join(f, keys, "full_outer") if keys else out.crossJoin(f)
        return out
