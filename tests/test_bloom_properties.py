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


# ---------------------------------------------------------------------------
# CMS / HLL / Morton-key randomized properties (same style: the contract,
# not one example).
# ---------------------------------------------------------------------------

def test_cms_randomized_never_undercounts(spark):
    import random

    from data_etl_with_dbt_spark.operators.sketch import cms_build, cms_estimate

    rng = random.Random(31)
    for trial in range(3):
        universe = rng.randint(20, 200)
        rows = [
            (f"k{rng.randint(0, universe)}",) for _ in range(rng.randint(200, 2000))
        ]
        df = spark.createDataFrame(rows, "token string")
        width = rng.choice([64, 256, 1024])
        cms = cms_build(df, "token", depth=4, width=width)
        exact = {
            r.token: r.c
            for r in df.groupBy("token").agg(F.count("*").alias("c")).collect()
        }
        est = {
            r.token: r.est_count
            for r in cms_estimate(
                cms, df.distinct(), "token", depth=4, width=width
            ).collect()
        }
        for tok, c in exact.items():
            assert est[tok] >= c, (trial, tok, width)


def test_hll_randomized_error_within_bound(spark):
    import random

    from data_etl_with_dbt_spark.operators.sketch import hll_build, hll_estimate

    rng = random.Random(37)
    for trial in range(3):
        n = rng.randint(100, 20000)
        offset = rng.randrange(1_000_000)
        df = spark.range(offset, offset + n).select(
            F.md5(F.col("id").cast("string")).alias("k")
        )
        est = hll_estimate(hll_build(df, "k", p=12), p=12)
        # 3 sigma at p=12 is ~5%; leave headroom for small-n granularity
        assert abs(est - n) / n < 0.08, (trial, n, est)


def test_morton_key_randomized_round_trip(spark):
    """Interleave is a bijection: deinterleaving the Spark-computed key
    recovers both rank codes exactly, for random 16-bit inputs."""
    import random

    from data_etl_with_dbt_spark.operators.layout import interleave_bits

    rng = random.Random(41)
    rows = [(rng.randrange(1 << 16), rng.randrange(1 << 16)) for _ in range(500)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 16).alias("z")).collect()
    for r in got:
        a = sum(((r.z >> (2 * i)) & 1) << i for i in range(16))
        b = sum(((r.z >> (2 * i + 1)) & 1) << i for i in range(16))
        assert (a, b) == (r.a, r.b)


def test_cms_join_size_never_undercounts_and_bounded(spark):
    """AMS inner-product join-size estimate from two CMS cell relations:
    >= the true equi-join size always, and within e/width * |A|*|B| of it
    (randomized keys; both properties of the min-of-row-sums estimator)."""
    import random

    from pyspark.sql import functions as F

    from data_etl_with_dbt_spark.operators.sketch import cms_build, cms_join_size

    rng = random.Random(11)
    width, depth = 1024, 4
    for trial in range(3):
        a_keys = [f"k{rng.randrange(60)}" for _ in range(400)]
        b_keys = [f"k{rng.randrange(80)}" for _ in range(300)]
        a = spark.createDataFrame([(k,) for k in a_keys], "k string")
        b = spark.createDataFrame([(k,) for k in b_keys], "k string")
        true_size = a.join(b, "k").count()
        [row] = cms_join_size(
            cms_build(a, "k", depth=depth, width=width),
            cms_build(b, "k", depth=depth, width=width),
            depth=depth,
        ).collect()
        assert row.est_join_size >= true_size, (trial, row.est_join_size, true_size)
        slack = 2.7182818 / width * len(a_keys) * len(b_keys)
        assert row.est_join_size <= true_size + 3 * slack, (
            trial, row.est_join_size, true_size, slack,
        )


def test_cms_join_size_disjoint_is_zero(spark):
    from data_etl_with_dbt_spark.operators.sketch import cms_build, cms_join_size

    a = spark.createDataFrame([(f"a{i}",) for i in range(50)], "k string")
    b = spark.createDataFrame([(f"b{i}",) for i in range(50)], "k string")
    [row] = cms_join_size(
        cms_build(a, "k", depth=4, width=4096),
        cms_build(b, "k", depth=4, width=4096),
    ).collect()
    # wide sketch, tiny key sets: no colliding cells at all
    assert row.est_join_size == 0
