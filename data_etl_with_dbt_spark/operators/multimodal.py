"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract stages as Arrow-batched pandas
transforms over ``mapInPandas``.

The container has no image/audio codecs, so the decode step is STUBBED: the
default decoder raises ``NotImplementedError`` and tests inject a
deterministic fake. The Spark-side plumbing — schema, partition-preserving
``mapInPandas``, Arrow batch shape — is real and is what matters at scale:
each batch is a pandas DataFrame of (id, bytes, meta), features come back as
typed columns, and nothing ever collects to the driver.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)


def to_media_table(df: DataFrame, id_col: str, payload_col: str, mime: str, source_col: str) -> DataFrame:
    """Wrap an arbitrary payload column as the engine's media shape:
    (media_id, content binary, meta struct). For real media you'd read the
    bytes via ``spark.read.format('binaryFile')``; the shape is identical."""
    content = F.encode(F.col(payload_col).cast("string"), "utf-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.octet_length(content).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def default_decoder(content: bytes, mime: str):
    """Placeholder for a real codec (PIL/librosa/av). Not available in this
    environment — inject a fake via ``decoder=`` in tests."""
    raise NotImplementedError(
        "media decoding requires codec libraries not present in this container; "
        "pass an explicit decoder"
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("head_hex", T.StringType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def extract_media_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    batch_hint: int | None = None,
) -> DataFrame:
    """Decode + featurize media via ``mapInPandas`` (Arrow batches, one
    Python worker per partition — the only sanctioned Python hot path).

    With no decoder, emits byte-level features only (n_bytes, head_hex) and a
    NULL feature vector — the plumbing runs end-to-end without codecs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(len).astype("int64"),
                    "head_hex": content.map(lambda b: bytes(b[:8]).hex()),
                }
            )
            if decoder is not None:
                mimes = pdf["meta"].map(lambda m: m["mime"])
                out["feature"] = [
                    decoder(bytes(c), m) for c, m in zip(content, mimes)
                ]
            else:
                out["feature"] = None
            yield out

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample_stub(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emits (media_id, frame_no) rows for the
    frames a real decoder would extract, using n_bytes as a stand-in for the
    frame count. Shows the explode shape (one media row → many frame rows)
    that a real sampler would produce."""
    n_frames = (F.col("meta.n_bytes") / F.lit(every_n)).cast("int")
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_no"),
    )
