"""Cross-run data-quality monitoring (the dbt-elementary / anomaly-test
capability): persist a few scalar health metrics per model run, then flag
runs whose metrics sit far outside their own history.

The reference's DQ surface (T1-T5, `plans/dq.py`) asserts point-in-time
invariants; this module catches the failures those can't — a feed that
silently halves, a null fraction creeping up, a mean drifting after an
upstream schema change.

Scale posture: metrics are computed in ONE distributed aggregation per run
(count + per-column null/mean folded into a single row), and the history
table grows by `n_metrics` rows per run — bytes, not data. Detection reads
only the history table; it never rescans the monitored data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

STATS_TABLE = "dq_run_stats"


def collect_stats(
    df: DataFrame,
    table: str,
    run_id: int,
    numeric_cols: list[str] | None = None,
) -> DataFrame:
    """One row per metric for this run: row_count, plus null_frac_<c> and
    mean_<c> for each requested numeric column — all from a single
    aggregation pass over ``df``."""
    aggs = [F.count(F.lit(1)).cast("double").alias("row_count")]
    for c in numeric_cols or []:
        n = F.count(F.lit(1))
        aggs.append(
            (F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)) / n)
            .cast("double")
            .alias(f"null_frac_{c}")
        )
        aggs.append(F.avg(c).cast("double").alias(f"mean_{c}"))
    wide = df.agg(*aggs)
    metrics = wide.unpivot([], wide.columns, "metric", "value")
    return metrics.select(
        F.lit(table).alias("table"),
        F.lit(run_id).cast("bigint").alias("run_id"),
        "metric",
        "value",
    )


def record_stats(
    df: DataFrame,
    table: str,
    run_id: int,
    numeric_cols: list[str] | None = None,
    stats_table: str = STATS_TABLE,
) -> None:
    """Append this run's metrics to the history table. A history directory
    left by a previous session (on disk but absent from this session's
    in-memory catalog — the nightly-job-restart case) is re-registered, not
    clobbered: monitoring history must survive session boundaries."""
    spark = df.sparkSession
    _ensure_registered(spark, stats_table)
    stats = collect_stats(df, table, run_id, numeric_cols)
    stats.write.mode("append").format("parquet").saveAsTable(stats_table)


def _ensure_registered(spark: SparkSession, name: str) -> None:
    if spark.catalog.tableExists(name):
        return
    try:
        jvm = spark._jvm
        warehouse = spark.conf.get("spark.sql.warehouse.dir")
        path = jvm.org.apache.hadoop.fs.Path(warehouse, name.lower())
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        if fs.exists(path):
            spark.catalog.createTable(name, path=str(path), source="parquet")
    except Exception:
        pass  # best effort; saveAsTable surfaces the real error if any


def detect_anomalies(
    spark: SparkSession,
    table: str,
    z_threshold: float = 3.0,
    min_history: int = 3,
    stats_table: str = STATS_TABLE,
) -> DataFrame:
    """Flag (run_id, metric) points that deviate more than ``z_threshold``
    sample standard deviations from the mean of all PRIOR runs of the same
    metric. Each run is judged only against its past — a genuine regime
    change flags once, then becomes the new baseline as history accrues.

    Returns (run_id, metric, value, hist_mean, hist_std, z) for flagged
    points; metrics with fewer than ``min_history`` prior runs never flag
    (cold start). A metric whose history is perfectly CONSTANT flags on any
    change at all (z reported as null) — a null fraction that has been 0.0
    for every run and jumps is the most common real break, and a z-score
    can't see it (zero variance).
    """
    hist = spark.table(stats_table).where(F.col("table") == table)
    w = (
        Window.partitionBy("metric")
        .orderBy("run_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = (
        hist.withColumn("hist_mean", F.avg("value").over(w))
        .withColumn("hist_std", F.stddev_samp("value").over(w))
        .withColumn("n_hist", F.count("value").over(w))
    )
    z = F.abs(F.col("value") - F.col("hist_mean")) / F.col("hist_std")
    varying = (F.col("hist_std") > 0) & (z > z_threshold)
    constant_break = (F.col("hist_std") == 0) & (
        F.col("value") != F.col("hist_mean")
    )
    return (
        scored.where(
            (F.col("n_hist") >= min_history)
            & F.col("hist_std").isNotNull()
            & (varying | constant_break)
        )
        .select(
            "run_id",
            "metric",
            "value",
            "hist_mean",
            "hist_std",
            F.when(F.col("hist_std") > 0, z).alias("z"),
        )
    )


def profile_frame(
    df: DataFrame,
    columns: list[str] | None = None,
    exact: bool = True,
) -> DataFrame:
    """Schema-generic column profile: one output row per column with
    ``(col_name, n_null, n_distinct)`` — the dbt-docs/profiling surface
    (which columns are keys, which are sparse) computed in ONE pass.

    ``exact=True`` uses ``count(DISTINCT ...)`` — Catalyst plans the
    multi-distinct aggregation with a single scan plus an Expand (rows are
    multiplied by the column count before the hash agg). That is the right
    trade for profiling runs at reference scale; at 100 TB flip
    ``exact=False`` to ``approx_count_distinct`` (HyperLogLog++ partials,
    no Expand, mergeable) — profiling tolerates ~2% cardinality error.

    The wide single-row aggregate is reshaped to long form with ``stack``
    (a projection of the 1-row frame — no second scan, no shuffle).
    """
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, c in enumerate(cols):
        aggs.append(F.count(F.col(c)).alias(f"__nn_{i}"))
        distinct = (
            F.countDistinct(F.col(c))
            if exact
            else F.approx_count_distinct(F.col(c))
        )
        aggs.append(distinct.alias(f"__nd_{i}"))
    wide = df.agg(*aggs)
    parts = ", ".join(
        f"'{c}', __n - __nn_{i}, __nd_{i}" for i, c in enumerate(cols)
    )
    stacked = wide.selectExpr(
        f"stack({len(cols)}, {parts}) AS (col_name, n_null, n_distinct)"
    )
    return stacked.select(
        "col_name",
        F.col("n_null").cast("bigint").alias("n_null"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


def psi_drift(
    current: DataFrame,
    baseline: DataFrame,
    column: str,
    n_buckets: int = 10,
    epsilon: float = 1e-4,
) -> float:
    """Population Stability Index between a column's distribution in
    ``current`` vs ``baseline`` — the standard drift score for feature and
    score distributions (rule of thumb: <0.1 stable, 0.1–0.25 shifting,
    >0.25 drifted), complementing :func:`detect_anomalies`'s scalar-metric
    z-scores with a full-distribution check.

    Numeric columns are bucketed on the BASELINE's equi-probable quantile
    cuts (``approxQuantile`` — B-1 doubles to the driver, never data) so
    the expected share per bucket is ~1/B; string columns bucket by value.
    Both sides then contribute ONE map-side-combined count aggregation;
    the PSI fold runs over ≤ B+1 collected bucket rows. Empty buckets are
    floored at ``epsilon`` (the conventional guard — PSI's log blows up on
    zero shares).
    """
    import math

    dtype = dict(current.dtypes)[column]
    if dtype in ("string", "boolean"):
        bucket = F.col(column).cast("string")
        cur_b = current.select(bucket.alias("__b"))
        base_b = baseline.select(bucket.alias("__b"))
    else:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(set(baseline.stat.approxQuantile(column, probs, 0.001)))
        expr = F.lit(0)
        for c in cuts:
            expr = expr + F.when(F.col(column) > F.lit(c), 1).otherwise(0)
        cur_b = current.select(expr.alias("__b"))
        base_b = baseline.select(expr.alias("__b"))

    def shares(df):
        rows = df.groupBy("__b").agg(F.count(F.lit(1)).alias("n")).collect()
        total = sum(r["n"] for r in rows) or 1
        # index access: Row.__b attribute lookup rejects dunder names
        return {r["__b"]: r["n"] / total for r in rows}

    cur, base = shares(cur_b), shares(base_b)
    psi = 0.0
    for b in set(cur) | set(base):
        a = max(cur.get(b, 0.0), epsilon)
        e = max(base.get(b, 0.0), epsilon)
        psi += (a - e) * math.log(a / e)
    return psi


def table_diff(
    a: DataFrame,
    b: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two relations on a key (the data-diff /
    reconciliation tool shape: validate a migration, audit a CDC apply,
    compare yesterday's snapshot to today's rebuild). One full-outer join
    on the key — a single key-shuffle of each side, no collect — emitting
    per key: ``diff_status`` ('equal' | 'changed' | 'only_a' | 'only_b')
    and ``changed_cols`` (comma-joined names of differing columns, '' when
    none). Column comparison is NULL-SAFE (NULL == NULL counts equal;
    NULL vs value counts changed)."""
    cols = compare_cols or [
        c for c in a.columns if c in b.columns and c not in keys
    ]
    qcols = [F.col(f"`{c}`") for c in cols]
    left = a.select(*keys, *qcols, F.lit(1).alias("__in_a")).alias("__a")
    right = b.select(*keys, *qcols, F.lit(1).alias("__in_b")).alias("__b")
    joined = left.join(right, on=keys, how="full_outer")
    per_col = [
        # backtick-quote: a column literally named 'payload.amount' must
        # resolve as one field, not parse as a nested reference
        F.when(
            ~F.col(f"__a.`{c}`").eqNullSafe(F.col(f"__b.`{c}`")), F.lit(c)
        )
        for c in cols
    ]
    changed_cols = F.concat_ws(
        ",", F.filter(F.array(*per_col), lambda x: x.isNotNull())
    )
    status = (
        F.when(F.col("__in_b").isNull(), F.lit("only_a"))
        .when(F.col("__in_a").isNull(), F.lit("only_b"))
        .when(changed_cols == "", F.lit("equal"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        *keys,
        status.alias("diff_status"),
        F.when(status == "changed", changed_cols)
        .otherwise(F.lit(""))
        .alias("changed_cols"),
    )


def table_diff_summary(
    diff: DataFrame, compare_cols: list[str]
) -> DataFrame:
    """Long-form reconciliation report over a :func:`table_diff` result:
    one row per status ('equal'/'changed'/'only_a'/'only_b') plus one
    ``col:<name>`` row per compared column counting rows where THAT column
    differs — one aggregation over the diff frame, bytes out."""
    aggs = [
        F.sum(F.when(F.col("diff_status") == s, 1).otherwise(0))
        .cast("bigint")
        .alias(s)
        for s in ("equal", "changed", "only_a", "only_b")
    ] + [
        F.sum(
            F.when(
                F.array_contains(F.split("changed_cols", ","), c), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias(f"col:{c}")
        for c in compare_cols
    ]
    wide = diff.agg(*aggs)
    names = [f.name for f in wide.schema.fields]
    stack = ", ".join(f"'{n}', `{n}`" for n in names)
    return (
        wide.select(
            F.expr(f"stack({len(names)}, {stack}) AS (metric, n)")
        ).orderBy("metric")
    )
