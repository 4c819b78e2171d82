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


def test_null_keys_probe_false_and_survive_decontamination(spark):
    """A NULL key can't be a member of the reference set: the probe must say
    might_contain=false (not NULL), and decontamination must KEEP the row —
    an equi-join verdict would leave it NULL and where(~NULL) drops it."""
    from data_etl_with_dbt_spark.operators.sketch import bloom_decontaminate

    ref = spark.createDataFrame([("bad-1",), ("bad-2",)], "k string")
    docs = spark.createDataFrame(
        [("bad-1",), ("clean-1",), (None,), (None,)], "k string"
    )
    m, k = bloom_parameters(16, 0.01)
    probed = bloom_probe(docs, "k", bloom_build(ref, "k", m, k), m, k)
    by_key = {}
    for r in probed.collect():
        by_key.setdefault(r["k"], []).append(r["might_contain"])
    assert by_key[None] == [False, False]  # firm false, never NULL
    assert by_key["bad-1"] == [True]
    kept = {r["k"] for r in
            bloom_decontaminate(docs, ref, "k", "k", 16).collect()}
    assert None in kept and "clean-1" in kept and "bad-1" not in kept
