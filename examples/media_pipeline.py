"""Multimodal corpus pipeline end to end — binary files on disk through
the engine's codec + dedup + transform operators, all dependency-free:

    1. synthesize a mixed media directory (PNG / JPEG / progressive JPEG /
       GIF / MJPEG AVI / WAV files, with planted near-duplicate images)
    2. ``read_binary_files`` → ``media_from_binary_files`` (mime sniffed
       from extension, path-hash ids)
    3. ``extract_media_features`` (Arrow-batched mapInPandas decode:
       image stats, audio stats) — the quality/triage table
    4. ``image_dhash`` + ``image_near_dup_pairs`` — perceptual dedup
       finds the planted near-duplicates ACROSS formats (a JPEG re-encode
       of a PNG hashes within the hamming budget)
    5. ``sample_media_frames`` — real video/animation frame sampling
       (every Nth MJPEG/GIF frame → PNG rows)
    6. ``resize_media`` — thumbnail export re-encoded as JPEG

Run:  python examples/media_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from data_etl_with_dbt_spark import get_spark
from data_etl_with_dbt_spark.operators import (
    encode_gif,
    encode_jpeg,
    encode_png,
    extract_media_features,
    image_dhash,
    image_near_dup_pairs,
    media_from_binary_files,
    resize_media,
)
from data_etl_with_dbt_spark.operators.multimodal import (
    default_decoder,
    encode_wav,
)
from data_etl_with_dbt_spark.sources.io import read_binary_files


def synthesize(media_dir: str) -> int:
    """A small mixed-format corpus with planted image near-duplicates."""
    os.makedirs(media_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    yy, xx = np.mgrid[0:64, 0:64]
    base = np.stack(
        [np.clip(yy * 4, 0, 255), np.clip(xx * 4, 0, 255),
         np.clip(128 + yy - xx, 0, 255)], axis=-1,
    ).astype(np.uint8)
    # the same picture in three formats (+1 brightness-nudged near-dup)
    open(os.path.join(media_dir, "scene.png"), "wb").write(encode_png(base))
    open(os.path.join(media_dir, "scene.jpg"), "wb").write(
        encode_jpeg(base, 90)
    )
    open(os.path.join(media_dir, "scene_prog.jpg"), "wb").write(
        encode_jpeg(base, 90, progressive=True, subsampling="420")
    )
    nudged = np.clip(base.astype(np.int16) + 6, 0, 255).astype(np.uint8)
    open(os.path.join(media_dir, "scene_bright.png"), "wb").write(
        encode_png(nudged)
    )
    # an unrelated image and an animated GIF
    noise = rng.integers(0, 256, (64, 64, 3), np.uint8)
    open(os.path.join(media_dir, "noise.png"), "wb").write(encode_png(noise))
    # quantize to <=256 colors for the fixture encoder (drop low bits)
    g1 = (base[::4, ::4] & 0xC0).astype(np.uint8)
    g2 = g1.copy()
    g2[:4] = [255, 255, 255]
    open(os.path.join(media_dir, "anim.gif"), "wb").write(
        encode_gif([g1, g2], delays_cs=[10, 10])
    )
    # a short MJPEG AVI (the JPEG codec as a video codec)
    from data_etl_with_dbt_spark.operators import encode_avi_mjpeg

    clips = [np.roll(base, s_, axis=1) for s_ in (0, 8, 16, 24)]
    open(os.path.join(media_dir, "clip.avi"), "wb").write(
        encode_avi_mjpeg(clips, fps=4)
    )
    # one second of audio
    t = np.arange(8000) / 8000.0
    tone = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    open(os.path.join(media_dir, "tone.wav"), "wb").write(
        encode_wav(tone[:, None], 8000)
    )
    return len(os.listdir(media_dir))


def main(workdir: str) -> None:
    media_dir = os.path.join(workdir, "media")
    n_files = synthesize(media_dir)
    spark = get_spark("media_pipeline")
    try:
        media = media_from_binary_files(read_binary_files(spark, media_dir))
        print(f"ingested {media.count()}/{n_files} files")

        feats = extract_media_features(media, decoder=default_decoder)
        triage = feats.join(media.select("media_id", "meta.mime"), "media_id")
        triage.select("mime", "n_bytes", "feature").show(truncate=60)

        hashes = image_dhash(media)
        pairs = image_near_dup_pairs(media, max_hamming=10)
        n_pairs = pairs.count()
        print(f"dhash rows: {hashes.count()}  near-dup pairs: {n_pairs}")
        assert n_pairs >= 3, "planted cross-format near-dups not found"

        from data_etl_with_dbt_spark.operators.multimodal import (
            sample_media_frames,
        )

        frames = sample_media_frames(media, every_n=2)
        n_sampled = frames.count()
        print(f"video/animation frames sampled: {n_sampled}")
        assert n_sampled >= 3  # AVI frames 0,2 + GIF frames 0

        thumbs = resize_media(media, 16, 16, output_format="jpg")
        # resize_media is row-preserving (undecodable rows pass through
        # raw), so count() alone can't detect a codec regression: assert
        # on rows that actually BECAME jpeg thumbnails
        n_jpeg = thumbs.where(thumbs.meta.mime == "image/jpeg").count()
        print(f"thumbnails re-encoded as JPEG: {n_jpeg} of {thumbs.count()}")
        assert n_jpeg >= 4  # every decodable image got a thumbnail

        # audio triage without a codec: frame-header walk -> per-media VBR
        # bitrate histogram + exact duration (synthetic MP3s here; real
        # corpora point this at audio/mpeg rows of the media table)
        from pyspark.sql import functions as F

        from data_etl_with_dbt_spark.operators.multimodal import (
            mp3_frame_table,
            synth_mp3_media,
        )

        mp3s = synth_mp3_media(
            spark.range(4).select(
                F.col("id").alias("doc_id"), F.lit("crawl").alias("source")
            )
        )
        mp3_frames = mp3_frame_table(mp3s)
        histo = mp3_frames.groupBy("media_id", "bitrate_kbps").count()
        durations = mp3_frames.groupBy("media_id").agg(
            (F.count(F.lit(1)) * 1152 / 44100).alias("seconds")
        )
        print(
            f"mp3 walk: {mp3_frames.count()} frames, "
            f"{histo.count()} (media, bitrate) histogram rows, "
            f"{durations.count()} durations"
        )
        assert durations.count() == 4
        print("media pipeline OK")
    finally:
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/media_pipeline_wd")
