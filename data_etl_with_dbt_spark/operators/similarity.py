"""Similarity search over embedding columns (``array<float>``).

Baseline: brute-force cosine top-k with pure JVM array expressions
(``zip_with`` + ``aggregate`` — sequential fold, deterministic bit-for-bit).
Scale path: LSH-bucketed search via random-hyperplane signatures — candidates
share a signature bucket, so the pair space shrinks from |q|x|n| to bucket
collisions; recall is tunable with multi-probe (hamming-1 neighbors).

At real scale you'd add an IVF variant (k-means coarse quantizer trained via
``pyspark.ml.clustering.KMeans``, probe nearest cells); the bucketed-LSH
implementation below has the same plan shape (broadcast centroids/planes,
bucket join, within-bucket top-k) so swapping the quantizer is local.
"""

from __future__ import annotations

import math
import random

import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T
from data_etl_with_dbt_spark.materialize import materialize
from data_etl_with_dbt_spark.sources.io import driver_rows_df


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic order → reproducible fp)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    ``queries`` (small: a handful of probe vectors) is broadcast; the corpus
    is scanned once — the classic embarrassingly-parallel exact-ANN baseline.
    Output: (query_id, vec_id, cosine) — k rows per query, ties broken by id.

    Norms are factored OUT of the per-pair expression (r11): the inlined
    ``cosine_similarity`` fold evaluated dot(a,a) per (row x query) pair and
    dot(b,b) per corpus row — 3 interpreted 64-element folds per pair where
    1 suffices. Each norm is now computed once (corpus norm per row, query
    norm per probe) and the pair stage folds only dot(a,b). The emitted
    double is bit-identical: the same three fold values combine in the same
    ``dot / (norm_a * norm_b)`` order, just factored into earlier projections.
    """
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = (
        corpus.select(F.col(id_col), F.col(vec_col))
        .withColumn("__cnorm", norm(F.col(vec_col)))
        .crossJoin(F.broadcast(q))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                dot(F.col(vec_col), F.col("__qvec"))
                / (F.col("__cnorm") * F.col("__qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Arrow-vectorized exact top-k: numpy matmul per partition via
    ``mapInPandas``, followed by a global top-k merge.

    This is the *scale* form of :func:`brute_force_topk`: the JVM
    ``aggregate`` fold is sequential per row (bit-exact, oracle-friendly);
    BLAS matmul does the same work orders of magnitude faster per batch and
    is the right hot path when the corpus is billions of vectors. Each
    partition emits only its local top-k per query (k rows, not |partition|),
    so the merge shuffles k x partitions x queries rows.

    Float note: BLAS accumulates in a different order than a sequential
    fold — results agree to ~1e-12 relative, not bit-for-bit.
    """
    import numpy as np
    import pandas as pd

    q_rows = queries.select(query_id_col, vec_col).collect()  # few probe vectors
    q_ids = [r[0] for r in q_rows]
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(q_mat, axis=1, keepdims=True)
    q_norm = q_mat / np.where(qn == 0, 1.0, qn)  # zero-norm probe: all-zero row

    # id types derive from the inputs (the exact_cosine_pairs convention) —
    # hardcoded LongType broke string/int ids that the JVM path accepts
    out_schema = T.StructType(
        [
            T.StructField(query_id_col, queries.schema[query_id_col].dataType),
            T.StructField(id_col, corpus.schema[id_col].dataType),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            # zero-norm corpus vectors score 0, never NaN: Spark sorts NaN
            # ABOVE every double, so one NaN row would displace a real
            # neighbor in the global window (the JVM path's 0/0 gives NULL,
            # which sorts last — 0.0 keeps the two exact paths aligned for
            # every nonzero neighbor)
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            mat = mat / np.where(norms == 0, 1.0, norms)
            sims = mat @ q_norm.T  # (batch, n_queries)
            ids = pdf[id_col].to_numpy()
            frames = []
            for qi, qid in enumerate(q_ids):
                col = sims[:, qi]
                top = np.argsort(-col, kind="stable")[:k]
                frames.append(
                    pd.DataFrame(
                        {query_id_col: qid, id_col: ids[top], "cosine": col[top]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    local_topk = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        local_topk.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _random_planes(dim: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def signature_expr(vec_col: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane signature: bit i = sign(vec . plane_i). Planes are
    literal arrays (broadcast in the plan), fold stays JVM-side."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec_col, plane) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    multiprobe: bool = True,
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH buckets + within-bucket exact
    cosine. ``multiprobe`` also probes all Hamming-1 buckets, trading compute
    for recall. Same output shape as :func:`brute_force_topk` (approximate)."""
    planes = _random_planes(dim, n_planes, seed)
    c = corpus.select(
        F.col(id_col),
        F.col(vec_col),
        # norm once per corpus row, not once per (row x probe) pair — the
        # factored cosine is bit-identical (same fold values, same
        # dot/(na*nb) combination order; see brute_force_topk)
        norm(F.col(vec_col)).alias("__cnorm"),
        signature_expr(F.col(vec_col), planes).alias("__bucket"),
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qnorm"),
        signature_expr(F.col(vec_col), planes).alias("__qsig"),
    )
    if multiprobe:
        probes = F.array_union(
            F.array(F.col("__qsig")),
            F.array(
                *[F.col("__qsig").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)]
            ),
        )
        q = q.select(
            query_id_col, "__qvec", "__qnorm", F.explode(probes).alias("__bucket")
        )
    else:
        q = q.select(
            query_id_col, "__qvec", "__qnorm", F.col("__qsig").alias("__bucket")
        )

    scored = c.join(F.broadcast(q), "__bucket").select(
        F.col(query_id_col),
        F.col(id_col),
        (
            dot(F.col(vec_col), F.col("__qvec"))
            / (F.col("__cnorm") * F.col("__qnorm"))
        ).alias("cosine"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def _band_buckets_arrow(planes, n_planes: int, n_bands: int):
    """Arrow-batched banded LSH signatures: ONE (batch x dim) @ (dim x P)
    matmul per Arrow batch, signs bit-packed into ``n_bands`` bucket longs.
    The JVM spelling (:func:`signature_expr`) evaluates P interpreted
    ``aggregate`` folds per row — at P=64 planes that is the dominant cost
    of the whole LSH pipeline (HOFs have no codegen); the matmul is ~100x.
    Sign agrees with the fold except when a dot lands within float noise
    of 0 (measure-zero for Gaussian planes) — use on the approximate
    (rows-only) paths, keep ``signature_expr`` where a test pins bit-exact
    bucket ids."""
    import numpy as np

    pl = np.asarray(planes, dtype=np.float64)  # (P, dim)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def buckets(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series([], dtype="object")
        X = np.stack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (X @ pl.T) > 0  # (n, P)
        weights = 1 << np.arange(n_planes, dtype=np.int64)
        per_band = [
            bits[:, b * n_planes : (b + 1) * n_planes] @ weights
            for b in range(n_bands)
        ]
        out = np.stack(per_band, axis=1)  # (n, n_bands)
        return pd.Series(list(out))

    return buckets


def _pairwise_cosine_arrow() -> Column:
    """Arrow-batched pairwise cosine: one BLAS pass per batch instead of an
    interpreted fold per pair. ~100x faster than the JVM ``aggregate`` fold
    when the candidate set is large; agrees with it to ~1e-12 relative (BLAS
    accumulation order differs), so use it where no bit-exact oracle applies."""
    import numpy as np

    @F.pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series([], dtype="float64")
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1)
        return pd.Series(np.where(den == 0, 0.0, num / den))

    return cos


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    threshold: float = 0.95,
    n_planes: int = 8,
    seed: int = 42,
    n_bands: int = 1,
    verify: str = "jvm",
    sig: str = "arrow",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: LSH-bucket candidates, exact
    cosine verify — the embedding analog of MinHash near-dup dedup.

    ``n_bands`` > 1 turns the single signature into banded LSH (MinHash-style
    OR-of-ANDs): ``n_bands`` independent ``n_planes``-bit signatures, a pair
    is a candidate if it collides in ANY band, candidates are deduped before
    the exact verify. Random-hyperplane collision probability per plane is
    ``1 - acos(cos θ)/π``, so a single wide signature only has usable recall
    near cosine 1.0; low thresholds (the semantic-dedup regime, e.g. 0.35 →
    p≈0.61/plane) need many short bands: b=16, r=4 gives recall ≈0.92 at
    0.35 while the candidate space stays bucket-bounded, never all-pairs.

    Shuffle discipline: candidates are deduped as bare ``(id_a, id_b)`` pairs
    — the wide vectors never ride the band-collision shuffle (a pair that
    collides in j bands would drag 2j copies of both arrays through the
    exchange). Vectors are joined back once per surviving pair, with norms
    computed once per corpus row, not once per pair.

    ``verify``: ``"jvm"`` scores pairs with the deterministic sequential fold
    (bit-exact, oracle-friendly); ``"arrow"`` scores each batch with one BLAS
    pass (:func:`_pairwise_cosine_arrow`) — the scale path when candidates
    number in the millions.

    ``sig``: ``"arrow"`` (default) computes all band signatures with one
    matmul per Arrow batch (:func:`_band_buckets_arrow`); ``"jvm"`` keeps
    the interpreted per-plane fold (:func:`signature_expr`) — only useful
    where bit-exact bucket ids must match a JVM-derived fixture. At
    P = n_planes x n_bands planes the JVM spelling evaluates P interpreted
    folds per row and was the measured bottleneck of the banded pipeline.
    """
    if verify not in ("jvm", "arrow"):
        raise ValueError(f"verify must be 'jvm' or 'arrow', got {verify!r}")
    if sig not in ("jvm", "arrow"):
        raise ValueError(f"sig must be 'jvm' or 'arrow', got {sig!r}")
    planes = _random_planes(dim, n_planes * n_bands, seed)
    if sig == "arrow":
        buckets = _band_buckets_arrow(planes, n_planes, n_bands)
        c = corpus.select(
            F.col(id_col),
            F.posexplode(buckets(F.col(vec_col))).alias("band", "bucket"),
        )
    else:
        band_sigs = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    signature_expr(
                        F.col(vec_col), planes[b * n_planes : (b + 1) * n_planes]
                    ).alias("bucket"),
                )
                for b in range(n_bands)
            ]
        )
        c = corpus.select(
            F.col(id_col), F.explode(band_sigs).alias("__bb")
        ).select(id_col, "__bb.band", "__bb.bucket")
    # both band-join sides reference the bucket relation — without the
    # checkpoint the signature stage (one matmul per Arrow batch, or
    # n_planes x n_bands interpreted folds on the JVM path) ran TWICE
    # over the corpus (r11; no cross-consumer CSE). Bucket rows are
    # (id, band, bucket) — corpus x n_bands longs, cheap to pin.
    c = c.transform(materialize)
    candidates = (
        c.alias("x")
        .join(
            c.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("id_a"),
            F.col(f"y.{id_col}").alias("id_b"),
        )
        # A pair colliding in several bands must be verified once, not per band.
        .dropDuplicates(["id_a", "id_b"])
    )
    if verify == "arrow":
        va = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va"))
        vb = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb"))
        cos = _pairwise_cosine_arrow()(F.col("__va"), F.col("__vb"))
    else:
        va = corpus.select(
            F.col(id_col).alias("id_a"),
            F.col(vec_col).alias("__va"),
            norm(F.col(vec_col)).alias("__na"),
        )
        vb = corpus.select(
            F.col(id_col).alias("id_b"),
            F.col(vec_col).alias("__vb"),
            norm(F.col(vec_col)).alias("__nb"),
        )
        cos = dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))
    return (
        candidates.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("cosine", cos)
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
):
    """IVF coarse quantizer: KMeans over the corpus embeddings; returns
    (model, corpus-with-__cell). At production scale you'd train on a sample
    and persist the assigned table partitioned by cell — probing then reads
    only the probed cells' files (partition pruning on __cell)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn(
        "__vec", array_to_vector(F.col(vec_col).cast("array<double>"))
    )
    model = KMeans(
        k=n_cells, seed=seed, featuresCol="__vec", predictionCol="__cell"
    ).fit(feat)
    # strip the training summary: it pins the training DataFrame + session
    # inside the model, which breaks RDD-serializing ops once any
    # df.observe has run (the ml/quality.train_quality_classifier trap)
    jobj = getattr(model, "_java_obj", None)
    if jobj is not None and getattr(model, "hasSummary", False):
        try:
            jobj.setSummary(corpus.sparkSession._jvm.scala.Option.empty())
        except Exception:
            pass  # summary retention is cosmetic; never fail the fit
    assigned = model.transform(feat).drop("__vec")
    return model, assigned


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to KMeans cells, probe each
    query's ``n_probe`` nearest cells, exact cosine within the probed cells
    only. Same plan shape as :func:`lsh_bucketed_topk` (broadcast probes,
    bucket join, per-query top-k) with a *learned* quantizer — scan cost
    drops to ~n_probe/n_cells of the corpus, recall governed by n_probe."""
    import numpy as np

    spark = corpus.sparkSession
    model, assigned = ivf_index(corpus, id_col, vec_col, n_cells, seed)
    centroids = np.asarray([c for c in model.clusterCenters()])

    q_rows = queries.select(query_id_col, vec_col).collect()  # few probes
    probe_rows = []
    for r in q_rows:
        qv = np.asarray(r[1], dtype=np.float64)
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cell in np.argsort(d, kind="stable")[:n_probe]:
            probe_rows.append((r[0], list(r[1]), int(cell)))
    # one slice: the list is driver-local metadata feeding a broadcast
    # build — default parallelize slices pay one Python-worker round trip
    # each at collect time (sources.io.driver_rows_df, r12)
    probes = driver_rows_df(
        spark,
        probe_rows,
        T.StructType(
            [
                # id type derives from the queries frame — a hardcoded
                # 'long' broke string/int ids the JVM paths accept
                T.StructField(query_id_col, queries.schema[query_id_col].dataType),
                T.StructField("__qvec", T.ArrayType(T.FloatType())),
                T.StructField("__cell", T.IntegerType()),
            ]
        ),
    )

    # norms factored out of the per-pair expression (bit-identical — see
    # brute_force_topk): query norm once per probe row via the same JVM
    # fold (numpy's pairwise summation would NOT be bit-identical),
    # corpus norm once per assigned row
    probes = probes.withColumn("__qnorm", norm(F.col("__qvec")))
    scored = (
        assigned.withColumn("__cnorm", norm(F.col(vec_col)))
        .join(F.broadcast(probes), "__cell")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            (
                dot(F.col(vec_col), F.col("__qvec"))
                / (F.col("__cnorm") * F.col("__qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def pq_train(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    seed: int = 42,
    train_limit: int = 4096,
    max_iter: int = 10,
):
    """Train a product quantizer (Jégou et al. 2011): split the D-dim space
    into ``m`` contiguous sub-blocks and run KMeans(``k``) independently in
    each — the codebooks compress each vector to ``m`` small codes
    (m=8, k=16 → 8 nibbles for a 64-dim float vector, 64× smaller).

    Returns the codebooks as a nested Python list ``[m][k][d_sub]`` —
    driver-side MODEL state (m·k·d_sub floats, KBs), the legitimate
    exception to no-driver-data, exactly like :func:`ivf_index`'s
    centroids. Training cost: the sub-block slicing is a projection; the m
    KMeans fits each scan the (persisted) sliced frame. At 100 TB you fit
    on a sample (KMeans converges on ~1e5 rows per block) and encode the
    full corpus with the frozen codebooks."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m != 0:
        raise ValueError(
            f"embedding dim {dim} is not divisible by m={m} sub-blocks — "
            "the trailing dims would be silently excluded from codebooks, "
            "codes, AND query distance tables (recall loss with no error); "
            "pick m dividing the dim or pad the vectors"
        )
    d_sub = dim // m
    if train_limit:
        # codebooks converge on a bounded sample — training cost must not
        # grow with the corpus (limit, not sample(): deterministic and one
        # early-terminating scan)
        corpus = corpus.limit(train_limit)
    sliced = corpus.select(
        *[
            array_to_vector(
                F.slice(F.col(vec_col), i * d_sub + 1, d_sub).cast("array<double>")
            ).alias(f"__b{i}")
            for i in range(m)
        ]
    ).persist()
    sliced.count()
    def fit_block(i: int):
        model = KMeans(
            k=k, seed=seed + i, maxIter=max_iter,
            featuresCol=f"__b{i}", predictionCol="__c",
        ).fit(sliced)
        return [[float(x) for x in c] for c in model.clusterCenters()]

    # the m fits are independent jobs over the same cached frame — submit
    # them concurrently (Spark's scheduler interleaves them); on the tiny
    # per-iteration jobs KMeans runs, wall time is per-job overhead, and
    # sequential fits would pay it m times over
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(m, 8)) as pool:
        codebooks = list(pool.map(fit_block, range(m)))
    sliced.unpersist()
    return codebooks


def _codebook_df(spark, codebooks) -> DataFrame:
    rows = [
        (b, c, centroid)
        for b, book in enumerate(codebooks)
        for c, centroid in enumerate(book)
    ]
    # one slice — broadcast-side metadata (see ivf_topk's probes)
    return driver_rows_df(spark, rows, "block int, code int, centroid array<double>")


def pq_encode(
    corpus: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode each vector as ``m`` codes: per block, the nearest codebook
    centroid by squared L2. Plan: explode each vector into its m sub-blocks
    (projection), broadcast-join the m·k codebook rows, score each
    (block, code) candidate with one fold over the d_sub-wide arrays
    (zip_with + aggregate — JVM, no Python), then ``min_by`` per
    (vector, block). Returns ``(id, block, code)`` — the compressed
    representation downstream ADC scans read INSTEAD of the float vectors."""
    spark = corpus.sparkSession
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    blocks = corpus.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("block"),
                        F.slice(F.col(vec_col), i * d_sub + 1, d_sub)
                        .cast("array<double>")
                        .alias("sub"),
                    )
                    for i in range(m)
                ]
            )
        ).alias("s"),
    ).select(id_col, F.col("s.block").alias("block"), F.col("s.sub").alias("sub"))
    cand = blocks.join(F.broadcast(_codebook_df(spark, codebooks)), "block")
    d2 = F.aggregate(
        F.zip_with(F.col("sub"), F.col("centroid"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = cand.select(id_col, "block", "code", d2.alias("__d2"))
    return scored.groupBy(id_col, "block").agg(
        F.min_by(F.col("code"), F.struct(F.col("__d2"), F.col("code"))).alias("code")
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """PQ approximate top-k by asymmetric distance computation (ADC): for
    each query, precompute the m·k table of squared distances from the
    query's sub-blocks to every codebook centroid (driver numpy — the
    queries are the FEW side, as in :func:`ivf_topk`); the corpus side then
    never touches floats — its (id, block, code) rows broadcast-join the
    distance-table rows and one hash aggregation sums m partials per
    (query, vector). Approximate distance = Σ_b table[b][code_b].

    Scale: the scan reads m small-int codes per vector (the 64×-compressed
    table), the join is broadcast (q·m·k rows), the agg is map-side
    combined, top-k is a bounded window — no stage materializes floats for
    the corpus. Recall is governed by (m, k); tests assert it beats random
    and self-hits rank at the top."""
    import numpy as np

    spark = corpus.sparkSession
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    books = [np.asarray(b, dtype=np.float64) for b in codebooks]

    q_rows = queries.select(query_id_col, vec_col).collect()  # few probes
    table_rows = []
    for r in q_rows:
        qv = np.asarray(r[1], dtype=np.float64)
        for b in range(m):
            sub = qv[b * d_sub : (b + 1) * d_sub]
            d2 = ((books[b] - sub) ** 2).sum(axis=1)
            for c, dist in enumerate(d2):
                table_rows.append((r[0], b, int(c), float(dist)))
    # one slice — broadcast-side metadata (see ivf_topk's probes)
    tables = driver_rows_df(
        spark,
        table_rows,
        T.StructType(
            [
                # id type derives from the queries frame (ivf_topk pattern)
                T.StructField(query_id_col, queries.schema[query_id_col].dataType),
                T.StructField("block", T.IntegerType()),
                T.StructField("code", T.IntegerType()),
                T.StructField("partial", T.DoubleType()),
            ]
        ),
    )

    codes = pq_encode(corpus, codebooks, id_col, vec_col)
    scored = (
        codes.join(F.broadcast(tables), ["block", "code"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("partial").alias("approx_d2"))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.asc("approx_d2"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def quantize_int8(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of an embedding column: scale =
    max|v| / 127, q_i = round(v_i / scale) — the standard embedding-storage
    compression (4x smaller than float32 before encoding; parquet
    dictionary/RLE then bites much harder on 255 distinct values).

    Emits exploded (id, dim_idx, qval, scale) rows so downstream ops (and the
    cross-engine check) see scalars, not arrays. Determinism: max|v| is exact
    (abs/max never round), the scale division and q = floor(x + 0.5) are
    single IEEE ops on identical bits in any engine. All-zero vectors get
    qval=0 rather than 0/0 NaNs.

    Scale shape: pure per-row narrow ops — no shuffle, no UDF; whole-stage
    codegen keeps the explode + arithmetic in one pass over the scan.
    """
    scale = (
        F.array_max(F.transform(F.col(vec_col), lambda v: F.abs(v))).cast("double")
        / F.lit(127.0)
    )
    ex = df.select(
        F.col(id_col), scale.alias("scale"), F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    qval = F.when(F.col("scale") == 0, F.lit(0)).otherwise(
        F.floor(F.col("v").cast("double") / F.col("scale") + F.lit(0.5))
    )
    return ex.select(
        F.col(id_col),
        (F.col("pos") + 1).cast("bigint").alias("dim_idx"),
        qval.cast("bigint").alias("qval"),
        F.col("scale"),
    )


def exact_cosine_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_blocks: int = 16,
) -> DataFrame:
    """All pairs with cosine >= threshold, computed EXACTLY, as blocked
    matrix products: vectors hash into ``n_blocks`` blocks, every unordered
    block pair becomes one ``applyInPandas`` group, and each group scores
    its (n/nb) x (n/nb) tile with a single float64 numpy matmul. Returns
    (id_a, id_b, cosine) with ``id_a < id_b``.

    This is the O(n^2) exact baseline for semantic dedup — correct at any
    threshold, quadratic in corpus size. The scale paths that bound the
    candidate set are :func:`embedding_near_dup_pairs` (LSH buckets) and
    :func:`ivf_topk` (learned coarse quantizer); run THIS one per-shard or
    on a sampled slice to measure their recall.

    Scale posture: the earlier spelling (ordered-id self-join + one
    interpreted ``aggregate`` fold per pair) evaluated n^2/2 higher-order
    expressions — 32 s for n=2000, d=64 on local[32]; the tile form is the
    standard exact all-pairs layout (every distributed matmul does this):
    each row replicates ``n_blocks`` times (shuffle volume n*nb vectors),
    per-task memory is two (n/nb) x d float64 tiles plus the boolean hits
    of one tile, and the nb*(nb+1)/2 tasks are embarrassingly parallel.
    Pick ``n_blocks`` so a tile fits comfortably in executor memory
    (nb ~ n*d*8 / 64MB); the DENSE similarity tile is materialized per
    task, so the quadratic cost never leaves the task boundary.

    Float note: numpy sums the dot in its own (pairwise/SIMD) order, not
    the sequential fold — same class of last-ulp divergence as any other
    engine's vectorized dot (DuckDB's ``list_dot_product`` included). The
    thresholded OUTPUT is stable unless a pair sits within float noise of
    the threshold, which calibrated thresholds (suite: 0.35 vs a 0.51
    fixture max) keep far away.
    """
    id_type = corpus.schema[id_col].dataType.simpleString()
    nb = max(1, int(n_blocks))
    tagged = corpus.select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nb)).alias("__b"),
    )
    replicated = tagged.select(
        "__id",
        "__v",
        "__b",
        F.explode(F.sequence(F.lit(0), F.lit(nb - 1))).alias("__o"),
    ).select(
        "__id",
        "__v",
        "__b",
        F.least("__b", "__o").alias("__ba"),
        F.greatest("__b", "__o").alias("__bb"),
    )

    def score_tile(pdf):
        # worker helpers stay INSIDE the closure: cloudpickle serializes
        # them by value, so executors never import this repo
        import numpy as np
        import pandas as pd

        ids = pdf["__id"].to_numpy()
        X = np.asarray(
            [np.asarray(v, dtype=np.float64) for v in pdf["__v"]]
        )
        norms = np.sqrt(np.einsum("ij,ij->i", X, X))
        ba, bb = int(pdf["__ba"].iat[0]), int(pdf["__bb"].iat[0])
        if ba == bb:
            sim = (X @ X.T) / np.outer(norms, norms)
            iu, ju = np.triu_indices(len(ids), k=1)
            keep = sim[iu, ju] >= threshold
            left, right = ids[iu[keep]], ids[ju[keep]]
            cos = sim[iu[keep], ju[keep]]
        else:
            in_a = (pdf["__b"] == ba).to_numpy()
            A, B = X[in_a], X[~in_a]
            ia, jb = ids[in_a], ids[~in_a]
            sim = (A @ B.T) / np.outer(norms[in_a], norms[~in_a])
            ii, jj = np.nonzero(sim >= threshold)
            left, right, cos = ia[ii], jb[jj], sim[ii, jj]
        lo = np.where(left < right, left, right)
        hi = np.where(left < right, right, left)
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cosine": cos})

    return replicated.groupBy("__ba", "__bb").applyInPandas(
        score_tile,
        schema=f"id_a {id_type}, id_b {id_type}, cosine double",
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str,
    top_k: int = 20,
) -> DataFrame:
    """Embedding sanity pass: squared L2 distance of every vector to its
    label-group centroid, top-k most distant flagged — the cheap corrupt/
    mislabeled-embedding detector that runs before any ANN index build.

    Plan: posexplode to (id, label, dim, x) — D×N rows, embarrassingly
    parallel; per-(label, dim) centroid via map-side-combined avg (D×labels
    rows, checkpointed then broadcast back); per-vector distance
    re-aggregates on the id. Two shuffles total, both map-side combined;
    the centroid table is KB-scale at any corpus size. The exploded
    relation is scanned twice (once per aggregation granularity) — the
    deliberate trade: a windowed single-scan formulation would shuffle the
    FULL D×N relation instead of two map-side-combined partials, which is
    far worse at corpus scale. Checkpointing the centroid table keeps the
    second pass from re-running the centroid agg inside the broadcast
    build (no cross-consumer CSE in Catalyst).

    Cross-engine determinism: centroids are DECIMAL(38,6)-quantized
    averages (davg rule); each per-dim squared deviation is cast to
    DECIMAL(28,12) per-row and SUMMED EXACTLY — so the distance, and
    therefore the outlier ranking, is bit-identical across engines; the
    top-k order has the id tie-break.
    """
    pos = df.select(
        F.col(id_col),
        F.col(label_col),
        F.posexplode(vec_col).alias("dim", "x"),
    ).withColumn("x", F.col("x").cast("double"))
    cent = pos.groupBy(label_col, "dim").agg(
        F.avg("x").cast("decimal(38,6)").cast("double").alias("c")
    ).transform(materialize)
    dev = pos.join(F.broadcast(cent), [label_col, "dim"])
    dist = dev.groupBy(id_col, label_col).agg(
        F.sum(
            ((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).cast(
                "decimal(28,12)"
            )
        )
        .cast("double")
        .alias("dist2")
    )
    return dist.orderBy(F.col("dist2").desc(), F.col(id_col)).limit(top_k)


def whitening_stats(
    df: DataFrame, label_col: str, vec_col: str, eps: float = 1e-6
) -> DataFrame:
    """Per-label ZCA whitening parameters via ``groupBy().applyInPandas`` —
    the batch-Pandas counterpart to the engine's streaming
    ``applyInPandasWithState``: each label group arrives as ONE Arrow batch,
    numpy fits mean + whitening matrix ``W = V diag(1/sqrt(λ+eps)) V^T``,
    and one row per label returns. Whitening decorrelates embedding dims so
    cosine/L2 behave isotropically — the standard pre-ANN normalization.

    Scale note: per-group state is O(d²), independent of group row count,
    but each group's ROWS must fit one executor's Arrow batch stream —
    right for per-label/per-shard fits (the intended use), wrong for a
    single global fit over 100 TB; fit that from a sampled slice or by
    merging per-shard moment matrices (sum, sum-outer) instead.
    """
    import numpy as np
    import pandas as pd

    out_schema = (
        f"{label_col} long, n bigint, mean array<double>, "
        "whiten array<array<double>>, top_eig double"
    )

    def fit(pdf: "pd.DataFrame") -> "pd.DataFrame":
        X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        mu = X.mean(axis=0)
        Xc = X - mu
        cov = (Xc.T @ Xc) / max(1, len(X) - 1)
        w, V = np.linalg.eigh(cov)
        W = (V * (1.0 / np.sqrt(w + eps))) @ V.T
        return pd.DataFrame(
            {
                label_col: [int(pdf[label_col].iloc[0])],
                "n": [len(X)],
                "mean": [mu.tolist()],
                "whiten": [[row.tolist() for row in W]],
                "top_eig": [float(w[-1])],
            }
        )

    return df.groupBy(label_col).applyInPandas(fit, schema=out_schema)


def apply_whitening(
    df: DataFrame,
    stats: DataFrame,
    id_col: str,
    label_col: str,
    vec_col: str,
) -> DataFrame:
    """Whiten vectors with previously-fitted per-label parameters: the
    (tiny: labels × d²) stats table collects to a broadcast dict and a
    ``mapInPandas`` pass applies ``(x - mean) @ W`` with one BLAS matmul
    per Arrow batch — vectors never shuffle, Python sees Arrow batches
    only. Output schema matches the input with ``vec_col`` replaced."""
    import numpy as np
    import pandas as pd

    params = {
        r[label_col]: (
            np.array(r["mean"], dtype=np.float64),
            np.array(r["whiten"], dtype=np.float64),
        )
        for r in stats.collect()
    }
    bc = df.sparkSession.sparkContext.broadcast(params)
    schema = df.schema[id_col].simpleString().split(":")[1]
    out_schema = (
        f"{id_col} {schema}, {label_col} long, {vec_col} array<double>"
    )

    def transform(batches):
        for pdf in batches:
            outs = []
            for lbl, grp in pdf.groupby(label_col):
                mu, W = bc.value[lbl]
                X = np.stack(grp[vec_col].to_numpy()).astype(np.float64)
                Y = (X - mu) @ W
                outs.append(
                    pd.DataFrame(
                        {
                            id_col: grp[id_col].to_numpy(),
                            label_col: lbl,
                            vec_col: [row.tolist() for row in Y],
                        }
                    )
                )
            yield pd.concat(outs, ignore_index=True)

    return df.select(id_col, label_col, vec_col).mapInPandas(
        transform, schema=out_schema
    )


# ---------------------------------------------------------------------------
# PCA: global linear dimensionality reduction via merged per-partition
# moment matrices — the scale path whitening_stats' docstring prescribes
# for a single GLOBAL fit (its applyInPandas form needs each group's rows
# in one task; a global group at 100 TB can't do that).
# ---------------------------------------------------------------------------

def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 4
) -> dict:
    """Fit a k-component PCA with ONE distributed pass: every partition
    reduces its Arrow batches to the sufficient statistics
    ``(n, Σx, ΣxxT)`` — one BLAS ``X.T @ X`` per batch, d²+d floats per
    partition regardless of row count — and the driver sums the partials,
    forms the covariance ``(ΣxxT - n·μμT)/(n-1)``, and eigendecomposes the
    tiny d×d matrix. Exactly the merge-per-shard-moments design that scales:
    the shuffle carries #partitions rows, never vectors.

    Returns driver-side MODEL state (the pq_train/ivf_index convention):
    ``{"mean": [d], "components": [k][d] (orthonormal, descending
    eigenvalue), "explained_variance": [k], "n": int}``.

    Determinism note: float partial sums merge in partition order, so the
    fit is reproducible for a fixed partitioning but not oracle-exact —
    the suite entry is rows-only; numpy agreement is asserted in pytest.
    """
    import numpy as np
    import pandas as pd

    def moments(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += len(X)
            s = X.sum(axis=0) if s is None else s + X.sum(axis=0)
            ss = X.T @ X if ss is None else ss + X.T @ X
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.ravel().tolist()]}
            )

    part = df.select(vec_col).mapInPandas(
        moments, schema="n bigint, s array<double>, ss array<double>"
    )
    rows = part.collect()  # one row per non-empty partition — driver-sized
    import numpy as np

    n = sum(r.n for r in rows)
    s = np.sum([np.array(r.s) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum([np.array(r.ss).reshape(d, d) for r in rows], axis=0)
    mu = s / n
    cov = (ss - n * np.outer(mu, mu)) / max(1, n - 1)
    w, V = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = V[:, order].T  # (k, d)
    # sign convention: largest-|loading| coordinate positive (eigh's sign is
    # arbitrary; pinning it makes fits reproducible run-to-run)
    for i in range(comps.shape[0]):
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return {
        "mean": mu.tolist(),
        "components": comps.tolist(),
        "explained_variance": [float(w[o]) for o in order],
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project vectors onto the fitted components: broadcast the (k×d)
    matrix, one BLAS ``(X-μ) @ C.T`` per Arrow batch via ``mapInPandas`` —
    vectors never shuffle (the apply_whitening pattern). Output:
    ``(id_col, out_col: array<double>[k])``."""
    import numpy as np
    import pandas as pd

    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(
        (
            np.array(model["mean"], dtype=np.float64),
            np.array(model["components"], dtype=np.float64),
        )
    )
    id_type = dict(df.dtypes)[id_col]

    def transform(batches):
        mu, C = bc.value
        for pdf in batches:
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            Y = (X - mu) @ C.T
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), out_col: [r.tolist() for r in Y]}
            )

    return df.select(id_col, vec_col).mapInPandas(
        transform, schema=f"{id_col} {id_type}, {out_col} array<double>"
    )


def pq_topk_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 10,
    shortlist: int = 100,
) -> DataFrame:
    """PQ search with exact re-ranking — the standard two-stage recipe
    (Jégou et al.; every production IVF-PQ system): the compressed ADC
    scan produces a ``shortlist`` of candidates per query (cheap, reads
    only code rows), then ONLY those shortlist×queries rows join back to
    their full vectors for exact cosine and the true top-k ordering.

    Why it matters: quantization error costs PQ both recall and RANK
    quality; re-ranking restores exact ordering among survivors, so recall
    of the composite is the shortlist's recall (tunable via ``shortlist``,
    typically 5-10× k) while float reads drop from |corpus| to
    |queries|·shortlist. Output matches :func:`brute_force_topk`'s schema
    ``(query_id, vec_id, cosine)``."""
    cands = pq_topk(
        corpus, queries, codebooks, id_col, vec_col, query_id_col, k=shortlist
    ).select(query_id_col, id_col)
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("__qvec"),
        norm(F.col(vec_col)).alias("__qnorm"),
    )
    scored = (
        cands.join(corpus.select(id_col, vec_col), id_col)
        .join(F.broadcast(q), query_id_col)
        .select(
            query_id_col,
            id_col,
            # norms factored out of the per-pair fold (bit-identical —
            # see brute_force_topk); corpus norm lands AFTER the
            # shortlist join so only survivor rows pay it
            (
                dot(F.col(vec_col), F.col("__qvec"))
                / (norm(F.col(vec_col)) * F.col("__qnorm"))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("cosine"), F.asc(id_col))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ann_recall_report(
    approx: DataFrame,
    exact: DataFrame,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """Recall@k of any ANN result against the exact baseline, per query
    plus an ALL row — the measurement harness every approximate index
    needs before its parameters are trusted (the in-repo tests assert
    per-method floors; this is the same check as a user-facing operator).
    Both inputs are (query, id) relations; recall = |approx ∩ exact| /
    |exact| per query. Join work ∝ result sizes, never the corpus."""
    hits = (
        exact.select(query_id_col, id_col)
        .join(approx.select(query_id_col, id_col), [query_id_col, id_col], "left_semi")
        .groupBy(query_id_col)
        .agg(F.count(F.lit(1)).alias("__hits"))
    )
    base = exact.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("__n"))
    per = (
        base.join(hits, query_id_col, "left")
        .select(
            F.col(query_id_col).cast("string").alias(query_id_col),
            (
                F.coalesce(F.col("__hits"), F.lit(0)).cast("double")
                / F.col("__n").cast("double")
            ).alias("recall"),
        )
    )
    per = per.transform(materialize)  # two consumers below
    overall = per.agg(
        F.lit("ALL").alias(query_id_col), F.avg("recall").alias("recall")
    )
    return per.unionByName(overall).orderBy(query_id_col)


def semantic_contamination(
    train: DataFrame,
    bench: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """Embedding-space test-set DECONTAMINATION — the semantic twin of
    ``dedup.benchmark_contamination`` (n-gram overlap catches verbatim
    leakage; this catches paraphrased/near-duplicate leakage the token
    route misses): flag every TRAIN vector whose cosine against ANY
    benchmark vector reaches ``threshold``. Returns ``(id,
    n_bench_hits, contaminated)`` — integers/booleans only, so the
    output is engine-stable under a calibrated threshold (the
    exact_cosine_pairs float note applies: keep the threshold away from
    the corpus's cosine noise floor).

    Scale posture: benchmark sets are BENCHMARK-sized (10^3-10^5 rows) —
    the bench matrix collects to the driver (same accepted class as
    vocab/codebook collects), row-normalizes once, and broadcasts into
    ONE Arrow ``mapInPandas`` pass computing ``X_norm @ B_norm.T`` per
    batch: no shuffle, no pair materialization, corpus touched once.
    Zero-norm vectors on either side contribute cosine 0 (never NaN)."""
    import numpy as np
    import pandas as pd

    b_rows = bench.select(vec_col).collect()
    B = np.asarray([list(r[0]) for r in b_rows], dtype=np.float64)
    if B.size:
        bn = np.linalg.norm(B, axis=1, keepdims=True)
        bn[bn == 0.0] = 1.0  # zero vectors: cosine 0 via zero dot
        B = B / bn
    thr = float(threshold)
    id_type = train.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, n_bench_hits bigint, contaminated boolean"

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0 or B.size == 0:
                hits = np.zeros(len(pdf), dtype=np.int64)
            else:
                X = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                xn = np.linalg.norm(X, axis=1, keepdims=True)
                xn[xn == 0.0] = 1.0
                S = (X / xn) @ B.T
                hits = (S >= thr).sum(axis=1).astype(np.int64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bench_hits": hits,
                    "contaminated": hits > 0,
                }
            )

    return train.select(id_col, vec_col).mapInPandas(run, schema)
