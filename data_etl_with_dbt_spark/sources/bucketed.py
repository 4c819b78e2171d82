"""Hive-style bucketed tables: pre-shuffled, co-located storage for the
joins and aggregations a 100 TB warehouse runs every day.

Why this exists: a shuffle on a fact-fact join is the single most expensive
stage at scale. Writing both tables bucketed by the join key (same column
semantics, same bucket count) lets Spark's SortMergeJoin read bucket i of
each side into the same task — ``Exchange hashpartitioning`` disappears from
the plan entirely, verified in ``tests/test_bucketed.py``. Point lookups on
the bucket key additionally prune to one bucket per scan
(``SelectedBucketsCount: 1 out of N``).

Mechanics worth knowing (all pinned by the tests):

* Bucketing requires ``saveAsTable`` — a catalog entry carries the bucket
  spec; plain ``save()`` would lose it. Passing ``path`` creates an
  EXTERNAL bucketed table (data survives ``DROP TABLE``).
* Spark's bucket hash is ``Murmur3Hash(col) pmod n`` — the same function
  its shuffle uses, which is exactly why the exchange can be elided; it is
  NOT Hive's hash, so Hive/Trino would mis-read these buckets (Spark-only
  interop, documented limitation).
* Both join sides must have the same bucket count (or a divisor — Spark
  coalesces bucketed scans when ``spark.sql.bucketing.coalesceBucketsInJoin
  .enabled`` is on) and the join keys must be the bucket columns.
* ``sortBy`` on the bucket key removes the per-task Sort before the merge
  join as well, when one file per bucket is read.
* ``spark.sql.sources.bucketing.autoBucketedScan.enabled`` (default true)
  turns bucketed reads OFF for plans with no join/agg to gain from them —
  which also forfeits bucket PRUNING on point lookups. Pin it false for
  lookup-heavy workloads (``SelectedBucketsCount`` then shows in explain).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int = 16,
    sort_cols: str | Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a bucketed (optionally bucket-sorted) catalog table.

    ``n_buckets`` sizes the parallelism of every future bucket-aligned join
    and agg on this table — at 100 TB pick it like you'd pick shuffle
    partitions for the table's joins (hundreds to thousands), not like a
    file count; each task writes its own file per bucket it touches, so
    repartition by the bucket columns first to get one file per bucket."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    # one file per bucket: co-partition the write with the bucket spec so a
    # bucket's rows land in a single task (otherwise every task emits a file
    # for every bucket it sees — the small-file explosion).
    writer = (
        df.repartition(n_buckets, *bucket_cols)
        .write.format(fmt)
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols is not None:
        if isinstance(sort_cols, str):
            sort_cols = [sort_cols]
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucket_spec(spark: SparkSession, table: str) -> dict | None:
    """Return {'n_buckets': int, 'bucket_cols': [...], 'sort_cols': [...]}
    for a bucketed table, or None if the table isn't bucketed."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r.col_name: (r.data_type or "") for r in rows}
    if "Num Buckets" not in info:
        return None
    strip = lambda s: [c.strip(" `") for c in s.strip("[]").split(",") if c.strip(" `")]
    return {
        "n_buckets": int(info["Num Buckets"]),
        "bucket_cols": strip(info.get("Bucket Columns", "")),
        "sort_cols": strip(info.get("Sort Columns", "")),
    }


def aligned_for_join(
    spark: SparkSession,
    left: str,
    right: str,
    left_on: Sequence[str],
    right_on: Sequence[str] | None = None,
) -> bool:
    """True when ``left JOIN right ON left_on = right_on`` can elide both
    exchanges: each side bucketed on exactly its join keys (names differ per
    side — o_custkey vs c_custkey is aligned) with equal bucket counts. A
    False means the join will shuffle (still correct, just not free)."""
    ls, rs = bucket_spec(spark, left), bucket_spec(spark, right)
    return (
        ls is not None
        and rs is not None
        and ls["n_buckets"] == rs["n_buckets"]
        and ls["bucket_cols"] == list(left_on)
        and rs["bucket_cols"] == list(right_on if right_on is not None else left_on)
    )
