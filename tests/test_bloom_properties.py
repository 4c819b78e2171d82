"""Property-style tests for the DataFrame-native Bloom filter: across
randomized key universes and sizings, membership NEVER false-negatives
(the filter's contract), the bitmap stays within its row bound, and
measured FPR stays in the same order as the design point."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from data_etl_with_dbt_spark.operators.sketch import (
    bloom_build,
    bloom_parameters,
    bloom_probe,
)


def test_randomized_no_false_negatives(spark):
    rng = random.Random(17)
    for trial in range(4):
        n = rng.randint(50, 2000)
        fpp = rng.choice([0.01, 0.05, 0.2])
        m, k = bloom_parameters(n, fpp)
        offset = rng.randrange(10_000)
        members = spark.range(offset, offset + n).select(
            F.md5(F.col("id").cast("string")).alias("key")
        )
        bloom = bloom_build(members, "key", m, k)
        assert bloom.count() <= (m + 63) // 64, (trial, n, fpp)
        probed = bloom_probe(members, "key", bloom, m, k)
        misses = probed.where(~F.col("might_contain")).count()
        assert misses == 0, f"trial {trial}: {misses} false negatives (n={n}, fpp={fpp})"


def test_randomized_fpr_order_of_magnitude(spark):
    rng = random.Random(23)
    n = 1500
    fpp = 0.01
    m, k = bloom_parameters(n, fpp)
    offset = rng.randrange(1_000_000)
    members = spark.range(offset, offset + n).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    bloom = bloom_build(members, "key", m, k)
    others = spark.range(offset + n, offset + 4 * n).select(
        F.md5(F.col("id").cast("string")).alias("key")
    )
    fp = bloom_probe(others, "key", bloom, m, k).where("might_contain").count()
    assert fp / (3 * n) <= 5 * fpp, f"FPR {fp / (3 * n):.4f} vs design {fpp}"
