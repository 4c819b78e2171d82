"""Distributed probabilistic-membership sketches (Bloom filter).

Why this exists: `dedup.benchmark_contamination` broadcasts the EXACT
benchmark gram set — the right call when the reference set is KB–MB. But
membership tests against a *large* reference relation (a historical corpus
of billions of fingerprints, a blocklist of URLs, last month's dedup keys)
can't broadcast exactly. A Bloom filter at ~10 bits/key gives 1% false
positives with a bitmap ~1000× smaller than the key set.

Spark-first design — the bitmap is a DATAFRAME, not a driver object:

* **build**: each key explodes to its k hash positions (`xxhash64(i, key)
  mod m` — k cheap JVM hashes, no Python); positions group into 64-bit
  words via `bit_or` aggregation. The result is one row per *set* word
  (sparse: ≤ m/64 rows), map-side combined before the one tiny shuffle.
* **probe**: corpus keys explode to the same k positions and join the word
  table (broadcast — the bitmap is m/64 rows regardless of key count);
  a key "might be contained" iff ALL k probed bits are set. No driver
  collect, no UDF, no per-row Python anywhere.

Spark's own runtime bloom-join injection (`spark.sql.optimizer.runtime.
bloomFilter.enabled`, on by default) covers the *optimizer's* use of blooms
inside shuffle joins; this operator is the *user-level* surface the
pipeline composes (e.g. decontaminate a crawl against billions of
benchmark fingerprints).

Guarantee: NO false negatives (every inserted key probes true — asserted
in tests); false-positive rate ≈ (1 - e^(-k·n/m))^k.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from data_etl_with_dbt_spark.materialize import materialize


def bloom_parameters(expected_keys: int, fpp: float = 0.01) -> tuple[int, int]:
    """Optimal (num_bits, num_hashes) for a target false-positive rate:
    m = -n·ln(p)/ln(2)², k = (m/n)·ln(2) — the standard sizing formulas."""
    n = max(1, expected_keys)
    m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
    k = max(1, int(round(m / n * math.log(2))))
    return m, k


def _positions(key, num_bits: int, num_hashes: int):
    """k bit positions for a key: pmod(xxhash64(i, key), m) per hash index.
    Seeding via the extra hashed column keeps it one JVM xxhash64 call."""
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def bloom_build(
    keys: DataFrame,
    key_col: str,
    num_bits: int,
    num_hashes: int,
) -> DataFrame:
    """Build the bitmap word table ``(word_index: long, bits: long)`` from a
    key relation. Output is sparse (only set words appear) and bounded by
    ceil(num_bits/64) rows however many keys go in; the bit_or aggregation
    is map-side combined so the only shuffle carries ≤ that many rows."""
    pos = (
        keys.select(F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"))
    )
    return (
        pos.select(
            F.expr("pos DIV 64").alias("word_index"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
        )
        .groupBy("word_index")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    num_bits: int,
    num_hashes: int,
    result_col: str = "might_contain",
) -> DataFrame:
    """Probe: adds ``result_col`` (boolean) to ``df`` — true iff every one
    of the key's k bits is set (possible member; false = definitely not).

    Plan: distinct keys explode to k probe rows, broadcast-join the word
    table (bitmap rows ≤ m/64 — broadcastable at any corpus size), check
    ``bits & mask``, and a key is a candidate iff its min bit-test is true;
    the verdict semi-joins back onto the full rows by key. Probing work is
    k rows per DISTINCT key, not per input row."""
    keys = df.select(key_col).distinct()
    probes = keys.select(
        F.col(key_col),
        F.explode(_positions(F.col(key_col), num_bits, num_hashes)).alias("pos"),
    ).select(
        key_col,
        F.expr("pos DIV 64").alias("word_index"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("mask"),
    )
    tested = probes.join(F.broadcast(bloom), "word_index", "left").select(
        key_col,
        (F.col("bits").isNotNull() & (F.col("bits").bitwiseAND(F.col("mask")) != 0)).alias(
            "__bit_set"
        ),
    )
    verdicts = tested.groupBy(key_col).agg(F.min("__bit_set").alias(result_col))
    # NULL-keyed rows produce no probe row AND can't equi-join back, so the
    # left join leaves their verdict NULL; a NULL key is definitely not a
    # member of the reference set, so the verdict is firmly false — without
    # this, bloom_decontaminate's where(~might_contain) would silently drop
    # every NULL-keyed row.
    return df.join(verdicts, key_col, "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(False))
    )


def bloom_decontaminate(
    docs: DataFrame,
    reference_keys: DataFrame,
    doc_key_col: str,
    ref_key_col: str,
    expected_keys: int,
    fpp: float = 0.01,
) -> DataFrame:
    """Membership filter against a large reference relation: keep only rows
    whose key DEFINITELY does not appear in the reference (bloom "no" is
    exact; bloom "maybe" drops the row — for decontamination a false
    positive only costs a clean doc, never leaks a contaminated one).

    The two key columns must share one Spark type: ``xxhash64`` hashes
    TYPED values, so a BIGINT reference probed with the same keys as
    STRING would silently never match — a false NEGATIVE, the one failure
    the operator promises can't happen. Raise instead (round-5 review)."""
    doc_t = docs.schema[doc_key_col].dataType
    ref_t = reference_keys.schema[ref_key_col].dataType
    if doc_t != ref_t:
        raise ValueError(
            f"bloom_decontaminate: {doc_key_col} is {doc_t.simpleString()} "
            f"but {ref_key_col} is {ref_t.simpleString()} — xxhash64 hashes "
            "typed values, so mismatched types silently produce false "
            "negatives; cast both sides to one type first"
        )
    m, k = bloom_parameters(expected_keys, fpp)
    bloom = bloom_build(reference_keys, ref_key_col, m, k)
    probed = bloom_probe(docs, doc_key_col, bloom, m, k)
    return probed.where(~F.col("might_contain")).drop("might_contain")


# ---------------------------------------------------------------------------
# Count-min sketch — frequency estimation in sublinear space, completing the
# sketch trio (Bloom: membership, HLL: cardinality, CMS: frequency).
# ---------------------------------------------------------------------------

def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a count-min sketch (Cormode & Muthukrishnan 2005) as a
    DATAFRAME of ``(r, pos, cnt)`` cells — same design stance as
    :func:`bloom_build`: the sketch is a relation, not a driver object, so
    it merges by union+re-aggregation, persists as a table, and rolls up
    across shards/days without touching raw data again.

    Each key contributes its weight to one cell per row ``r``:
    ``pos = xxhash64(r, key) mod width`` — ``depth`` cheap JVM hashes, no
    Python. The build is one map-side-combined aggregation; the result has
    at most ``depth * width`` rows (sketch-sized — KBs), REGARDLESS of
    input cardinality. Guarantee: estimates never undercount, and
    overcount ≤ e·N/width with probability 1 - e^-depth (property-tested).

    Why not Spark's built-in ``count_min_sketch`` aggregate (a binary
    blob)? The cell relation composes with the engine: broadcast-joinable
    for estimation, mergeable with ``cms_merge``, inspectable with SQL.
    """
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    # NULL keys are excluded (the hll_build/kmv_build convention): xxhash64
    # skips a null field, so every NULL key would collide into ONE cell per
    # row and fabricate a phantom heavy-hitter inflating its collisions
    rows = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("__k"), w.alias("__w")
    )
    cells = rows.select(
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
        "__k",
        "__w",
    ).select(
        "r",
        F.pmod(F.xxhash64(F.col("r"), F.col("__k")), F.lit(width)).alias("pos"),
        "__w",
    )
    return cells.groupBy("r", "pos").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    cms: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 4096,
    result_col: str = "est_count",
) -> DataFrame:
    """Point-estimate frequencies for ``keys``: probe each key's ``depth``
    cells (broadcast join — the sketch is sketch-sized) and take the MIN
    over rows; absent cells count 0. The input key relation is returned
    with ``result_col`` appended."""
    probes = keys.select(F.col(key_col)).distinct().select(
        key_col,
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("r"),
    ).select(
        key_col,
        "r",
        F.pmod(F.xxhash64(F.col("r"), F.col(key_col)), F.lit(width)).alias("pos"),
    )
    probed = probes.join(F.broadcast(cms), ["r", "pos"], "left").select(
        key_col, F.coalesce(F.col("cnt"), F.lit(0).cast("long")).alias("__c")
    )
    est = probed.groupBy(key_col).agg(F.min("__c").alias(result_col))
    # NULL keys can't equi-join their estimate row; they were never counted
    # by the build either, so 0 — not NULL — is their frequency (the
    # bloom_probe null-coalescing convention)
    return keys.join(est, key_col, "left").withColumn(
        result_col, F.coalesce(F.col(result_col), F.lit(0).cast("long"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width): cell-wise sum.
    CMS is a linear sketch, so merge-then-estimate equals
    build-on-the-union exactly (asserted in tests) — the property that
    makes per-shard/per-day sketch rollups sound."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "pos").agg(F.sum("cnt").alias("cnt"))


# ---------------------------------------------------------------------------
# HyperLogLog as a register RELATION — mergeable cardinality, rounding out
# the sketch family (Bloom: membership, CMS: frequency, HLL: cardinality).
# Spark's approx_count_distinct answers one query; this surface persists
# the registers so cardinalities roll up across shards/days by MAX-merge
# without re-reading data.
# ---------------------------------------------------------------------------

def hll_build(df: DataFrame, key_col: str, p: int = 12) -> DataFrame:
    """HyperLogLog registers (Flajolet et al. 2007) as a DataFrame of
    ``(bucket, rho)`` rows: bucket = low ``p`` bits of ``xxhash64(key)``,
    rho = the register draw from the remaining 64-p bits, MAX-aggregated
    per bucket. At most ``2^p`` rows regardless of input size; absent
    buckets mean register 0.

    rho uses the TRAILING-zero count (+1) rather than the textbook
    leading-zero count: for uniform hash bits both are Geometric(1/2), so
    the estimator is untouched, and trailing zeros compute in pure integer
    ops — ``bit_count((w & -w) - 1)`` — where a leading-zero count needs
    either a float log2 (whose boundary rounding would corrupt registers)
    or a per-row binary string. Measured 6× faster on a 1e7-token build."""
    h = F.xxhash64(F.col(key_col))
    bucket = h.bitwiseAND(F.lit((1 << p) - 1))
    w = F.shiftrightunsigned(h, p)  # 64-p significant bits
    rho = F.when(w == 0, F.lit(64 - p + 1)).otherwise(
        F.bit_count(w.bitwiseAND(-w) - F.lit(1)) + F.lit(1)
    )
    return (
        df.where(F.col(key_col).isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(*registers: DataFrame) -> DataFrame:
    """Merge register tables built with the same ``p``: per-bucket MAX.
    Exactly equals building on the unioned input (asserted in tests) —
    the property that makes per-shard cardinality rollups sound."""
    out = registers[0]
    for r in registers[1:]:
        out = out.unionByName(r)
    return out.groupBy("bucket").agg(F.max("rho").alias("rho"))


def hll_estimate(registers: DataFrame, p: int = 12) -> float:
    """Cardinality estimate from a register table, with the standard
    small-range correction (linear counting while empty buckets remain).
    The aggregation runs in the engine; the driver reads ONE row."""
    import math

    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    row = registers.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("s"),
        F.count(F.lit(1)).alias("present"),
        F.sum(F.when(F.col("rho") == 0, 1).otherwise(0)).alias("z_present"),
    ).collect()[0]
    present = row.present or 0
    s = (row.s or 0.0) + (m - present) * 1.0  # absent buckets: 2^-0 = 1
    zeros = (row.z_present or 0) + (m - present)
    est = alpha * m * m / s
    if est <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return est


# ---------------------------------------------------------------------------
# KMV / theta sketch: mergeable distinct counting WITH set algebra.
# ---------------------------------------------------------------------------

_KMV_BITS = 60  # 15 hex chars of md5 -> positive BIGINT in Spark AND DuckDB
_KMV_SCALE = float(1 << _KMV_BITS)


def kmv_hash(key) -> "F.Column":
    """60-bit uniform hash both engines can spell identically: the first 15
    hex chars of ``md5(cast(key as string))`` parsed as an integer. Spark:
    ``conv(substring(md5(x),1,15),16,10)``; DuckDB:
    ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``. 60 bits keeps the value
    positive in a signed BIGINT, and the int→double conversion + division
    by 2^60 are IEEE-correctly-rounded in both engines — so every estimate
    derived from these hashes is bit-identical cross-engine (the property
    that makes this the ONE sketch family with a hash-matched SQL oracle)."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def kmv_build(
    df: DataFrame,
    key_col: str,
    k: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """K-Minimum-Values sketch (Bar-Yossef et al. 2002; the theta-sketch
    family): per group, the ``k`` smallest DISTINCT hash values of the key.
    Output is a relation ``(group..., h)`` with ≤ k rows per group —
    sketch-sized state that persists as a table, merges with
    :func:`kmv_merge`, estimates with :func:`kmv_estimate`, and — unlike
    HLL — supports INTERSECTION estimates (:func:`kmv_intersect_estimate`),
    because the retained hashes are a uniform sample of the key space.

    Build cost is one distinct-shuffle over ``(group, hash)`` (the same
    exchange an exact COUNT(DISTINCT) pays once); after that, rollups and
    set algebra run on k-row relations and never rescan the fact table."""
    groups = list(group_cols or [])
    hashed = df.where(F.col(key_col).isNotNull()).select(
        *groups, kmv_hash(F.col(key_col)).alias("h")
    )
    if not groups:
        # the UNGROUPED sketch must not use an empty-partition window —
        # that moves EVERY distinct hash to one task (round-5 review);
        # global smallest-k is exactly TakeOrderedAndProject
        return hashed.distinct().orderBy("h").limit(k)
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("h")
    return (
        hashed.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_merge(
    *sketches: DataFrame, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Union sketches built with the same hash and re-keep the k smallest
    per group. Equals building on the unioned input (asserted in tests) —
    per-shard/per-day distinct rollups without re-reading shards."""
    groups = list(group_cols or [])
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    from pyspark.sql import Window

    w = Window.partitionBy(*[F.col(g) for g in groups]).orderBy("h")
    return (
        out.distinct()
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_estimate(
    sketch: DataFrame, k: int = 64, group_cols: list[str] | None = None
) -> DataFrame:
    """Distinct-count estimate per group: exact row count while the group
    holds < k hashes (the sketch IS the distinct set), else the unbiased
    KMV estimator ``(k-1) / u_k`` where ``u_k`` is the k-th smallest hash
    normalized to (0,1]. One IEEE division of deterministic values —
    bit-identical cross-engine."""
    groups = list(group_cols or [])
    agg = sketch.groupBy(*groups).agg(
        F.count(F.lit(1)).alias("__n"), F.max("h").alias("__kth")
    )
    est = F.when(F.col("__n") < k, F.col("__n").cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.col("__kth").cast("double") / F.lit(_KMV_SCALE))
    )
    return agg.select(*groups, est.alias("approx_distinct"))


def kmv_intersect_estimate(
    a: DataFrame, b: DataFrame, k: int = 64
) -> DataFrame:
    """Theta-sketch intersection of two UNGROUPED sketches: with
    θ = min(θ_a, θ_b) (each side's k-th smallest normalized hash, or 1 when
    the side is exact), every retained hash below θ is a uniform sample of
    the key space at rate θ — so ``|A∩B hashes < θ| / θ`` estimates the
    true intersection cardinality (Dasgupta et al., the DataSketches theta
    framework). Returns one row ``(approx_intersection: double)``.

    All inputs are k-row relations; the join is sketch-sized. HLL cannot
    answer this (inclusion–exclusion explodes the error); KMV is the
    standard answer."""
    def theta(s: DataFrame) -> DataFrame:
        return s.agg(
            F.when(
                F.count(F.lit(1)) < k, F.lit(1.0)
            )
            .otherwise(F.max("h").cast("double") / F.lit(_KMV_SCALE))
            .alias("theta")
        )

    th = (
        theta(a)
        .crossJoin(theta(b).withColumnRenamed("theta", "theta_b"))
        .select(F.least("theta", "theta_b").alias("theta"))
    )
    th = th.transform(materialize)  # two consumers; no cross-consumer CSE
    common = a.select("h").intersect(b.select("h"))
    cnt = (
        common.crossJoin(F.broadcast(th))
        .where(F.col("h").cast("double") / F.lit(_KMV_SCALE) < F.col("theta"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("__c"))  # 1 row even when empty
    )
    return cnt.crossJoin(F.broadcast(th)).select(
        (F.col("__c").cast("double") / F.col("theta")).alias(
            "approx_intersection"
        )
    )


# ---------------------------------------------------------------------------
# Hash-sample quantile estimation: the mergeable, ORACLE-EXACT quantile
# path. percentile_approx's internal sketch is engine-private; a
# deterministic md5-rate sample is a "sketch" both engines can reproduce
# bit-for-bit, and per-shard samples merge by plain UNION.
# ---------------------------------------------------------------------------

def hash_sample(df: DataFrame, key_col: str, rate: float) -> DataFrame:
    """Deterministic Bernoulli(rate) sample: keep rows whose 60-bit md5
    hash of ``key_col`` falls below ``floor(rate·2^60)`` — the stratified-
    sample convention, promoted to an operator. No RNG state, identical
    membership on every engine/run/partitioning; the oracle spells the
    same integer comparison (``CAST('0x'||substr(md5(k),1,15) AS BIGINT)
    < threshold``). Per-shard samples of the same key space UNION into the
    global sample — the property that makes downstream estimates
    (quantiles below, means, counts/rate) mergeable without coordination."""
    threshold = int(rate * (1 << _KMV_BITS))
    return df.where(kmv_hash(F.col(key_col)) < F.lit(threshold))


def sampled_quantiles(
    df: DataFrame,
    key_col: str,
    value_col: str,
    probs: list[float],
    rate: float,
    group_cols: list[str] | None = None,
    include_exact: bool = True,
) -> DataFrame:
    """Per-group discrete quantiles estimated from a deterministic
    ``hash_sample``: rank error is O(1/√(rate·n)) with high probability
    (classic sample-quantile bound), and — unlike a global sort — the cost
    is a sample-sized sort-agg per group. percentile_disc returns actual
    data values, so the output is oracle-exact, not approximately-close.

    ``include_exact=True`` (the error-measurement harness and the suite's
    oracle query) ALSO computes the full-data exact percentile per prob —
    which pays the per-group full sort the sample exists to avoid; a
    production pipeline at 100 TB passes ``include_exact=False`` so only
    the sample sorts (round-5 review made the exact side optional).

    One scan either way: the sample mask is a CASE projection, never a
    second read."""
    groups = list(group_cols or [])
    threshold = int(rate * (1 << _KMV_BITS))
    masked = df.select(
        *groups,
        F.col(value_col).alias("__v"),
        F.when(
            kmv_hash(F.col(key_col)) < F.lit(threshold), F.col(value_col)
        ).alias("__sv"),
    )
    aggs = [
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count("__sv").cast("bigint").alias("sample_n"),
    ]
    for p in probs:
        tag = f"p{int(round(p * 100)):02d}"
        if include_exact:
            aggs.append(
                F.expr(f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY __v)")
                .cast("decimal(38,6)")
                .cast("double")
                .alias(tag)
            )
        aggs.append(
            F.expr(f"percentile_disc({p!r}) WITHIN GROUP (ORDER BY __sv)")
            .cast("decimal(38,6)")
            .cast("double")
            .alias(f"{tag}_sampled")
        )
    return masked.groupBy(*groups).agg(*aggs)


def cms_join_size(a: DataFrame, b: DataFrame, depth: int | None = None) -> DataFrame:
    """Equi-join SIZE estimate from two count-min sketches built with
    identical (depth, width) over the two sides' join keys: the AMS-style
    inner product ``min over rows r of Σ_pos a[r,pos]·b[r,pos]``
    (Cormode & Muthukrishnan 2005 §4.2). Never UNDER-estimates — hash
    collisions only add cross terms — and over-estimates by ≤ ε·|A|·|B|
    with ε = e/width (property-tested).

    Why it matters at 100 TB: |A ⋈ B| = Σ_k n_a(k)·n_b(k) computed exactly
    needs both key histograms — a full shuffle of each side — while the
    sketches are KB-sized cell relations that may already exist from
    frequency monitoring. Join-size BEFORE the join is how a planner (or a
    pipeline guardrail) decides broadcast vs shuffle vs abort-and-salt.
    The whole estimate is one sketch-sized join: cells match on (r, pos),
    products sum per row, MIN over the ``depth`` row sums. Returns one row
    ``(est_join_size: bigint)``.

    ``depth`` defaults to DERIVING the row spine from the sketches' own
    ``r`` values: a caller-supplied depth LARGER than the build depth
    would add an all-empty row whose inner product 0 forces the estimate
    to 0 — an under-estimate, the one direction the sketch promises never
    to err (round-5 review). Pass ``depth`` only to deliberately restrict
    the vote to the first rows of deeper sketches."""
    prod = (
        a.alias("a")
        .join(b.alias("b"), ["r", "pos"])
        .select("r", (F.col("a.cnt") * F.col("b.cnt")).alias("__p"))
        .groupBy("r")
        .agg(F.sum("__p").alias("__rowsum"))
    )
    # every one of the depth rows must vote: a row with NO matching cells
    # has inner product 0 (absent cells are zero counts) and must pull the
    # min to 0 — joining only matched cells would silently drop it.
    if depth is not None:
        spine = a.sparkSession.range(depth).select(
            F.col("id").cast("int").alias("r")
        )
    else:
        spine = a.select("r").unionByName(b.select("r")).distinct()
    voted = spine.join(prod, "r", "left").select(
        F.coalesce(F.col("__rowsum"), F.lit(0)).alias("__rowsum")
    )
    return voted.groupBy().agg(
        F.min("__rowsum").cast("bigint").alias("est_join_size")
    )
