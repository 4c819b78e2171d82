"""Benchmark harness: runs the headline suite queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:
``{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query runs four times: one discarded warm-up (JVM codegen + parquet
footer reads), then three timed runs of which the MINIMUM is reported — on
a shared box the min is the stable steady-state estimate (observed
run-to-run spread of the sum was 7.5-10 s from scheduler noise alone, and
round 4 measured intermittent hypervisor CPU steal on this host; a third
timed run hardens the per-query min against a steal burst landing on one
of two). Results are materialized via ``df.write.format('noop')`` so
the full plan executes without collecting to the driver.

r11 measurement fixes (methodology, not speed — documented in
OPTIMIZATION_r11.md with numbers under BOTH methodologies):

* **Steal-aware artifact**: host steal arrives in minutes-scale bursts
  (r10's artifact recorded 17.36 s at 87.6 CPU-s steal vs 14.85 s at 2.8
  on the same tree). The suite now re-runs (up to ``BENCH_MAX_ATTEMPTS``)
  while the measured steal of the attempt exceeds ``QUIET_STEAL_CPU_S``,
  and the printed artifact merges attempts PER QUERY (min across
  attempts — r12, matching the documented per-query-min methodology);
  per-attempt steal goes to stderr. The stdout JSON schema is unchanged.
* **Session cache cleared before every timed run**: operators that
  ``persist()`` an intermediate (MinHash signatures) leave it in the
  session's CacheManager, and a later run's identical plan substitutes
  the cached relation — so timed runs 2-3 (and every run after the
  warm-up) were measuring a pipeline whose signature stage never ran.
  ``clearCache()`` before each timed run makes every timed run compute
  from the parquet inputs; the persist itself (one materialization, many
  consumers within the run) is still timed, as it should be.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_etl_with_dbt_spark.session import get_spark
from data_etl_with_dbt_spark.suite import QUERIES


def run_query(spark, name, sf_dir):
    df = QUERIES[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()


def _steal_jiffies() -> int | None:
    """Hypervisor steal time from /proc/stat — the box shows minutes-scale
    steal bursts that swing identical runs 2x (BENCH_NOTES round 5), so
    every bench run samples steal around itself and reports it to STDERR
    (the stdout JSON line is the driver's; its schema must not change)."""
    try:
        with open("/proc/stat") as f:
            return int(f.readline().split()[8])
    except (OSError, IndexError, ValueError):
        return None


# A burst-free window on this host measures ~0-3 CPU-s of steal across one
# suite attempt; 15 is the contamination threshold the r10 verdict set
# (artifact-vs-quiet divergence became material above it).
QUIET_STEAL_CPU_S = 15.0
# clamp: <=0 would run nothing and crash on best_timings=None (r12 ADVICE)
BENCH_MAX_ATTEMPTS = max(
    1, int(os.environ.get("SPARK_GRAFT_BENCH_ATTEMPTS", "3"))
)


def run_suite(spark, bench_queries, sf_dir) -> dict[str, float]:
    """One full suite attempt: per query, one warm-up + min of 3 timed runs.
    The session cache is cleared before every timed run so persisted
    intermediates (MinHash signatures) are recomputed inside the timing."""
    timings: dict[str, float] = {}
    for name in bench_queries:
        spark.sparkContext.setJobDescription(f"bench: {name}")
        run_query(spark, name, sf_dir)  # warm-up: codegen + file listing
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            run_query(spark, name, sf_dir)
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        spark.sparkContext.setJobDescription(None)
    return timings


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = [name for name, q in sorted(QUERIES.items()) if q.bench]
    best_timings: dict[str, float] | None = None
    for attempt in range(1, BENCH_MAX_ATTEMPTS + 1):
        steal0 = _steal_jiffies()
        timings = run_suite(spark, bench_queries, sf_dir)
        steal1 = _steal_jiffies()
        steal = (
            round((steal1 - steal0) / 100.0, 1)  # USER_HZ=100: CPU-seconds
            if steal0 is not None and steal1 is not None
            else None
        )
        total = round(sum(timings.values()), 4)
        print(
            f"bench attempt={attempt} total={total} steal_cpu_s={steal}",
            file=sys.stderr,
        )
        # merge attempts PER QUERY (r12 ADVICE): keeping one attempt
        # wholesale preserved steal-contaminated numbers for queries
        # another attempt measured cleaner — the documented methodology
        # is the per-query min ACROSS runs, which min-of-mins restores
        if best_timings is None:
            best_timings = timings
        else:
            best_timings = {
                q: min(best_timings[q], timings[q]) for q in timings
            }
        if steal is not None and steal < QUIET_STEAL_CPU_S:
            break  # quiet window: this attempt is trustworthy

    timings = best_timings
    # tolerate non-"sf<N>" fixture dirs (e.g. a perturbed copy): the one
    # JSON output line must never be lost to a basename parse AFTER the
    # whole benchmark already ran
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = None
    print(
        json.dumps(
            {
                "metric": "suite_headline_total",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
