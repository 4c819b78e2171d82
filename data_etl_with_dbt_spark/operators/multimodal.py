"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract stages as Arrow-batched pandas
transforms over ``mapInPandas``.

Dependency-free codecs and parsers, no libraries: BMP/PPM raster decode,
PNG decode (stdlib zlib inflate + unfilter; depths 1-16, Adam7
interlace), JPEG decode (huffman + vectorized IDCT,
``operators/jpeg.py``), and full GIF frame decode (LZW, interlace,
disposal/transparency composition, ``operators/gif.py``) for images,
WAV decode for audio (PCM 8/16, IEEE float, G.711 A/mu-law, IMA + MS
ADPCM), MJPEG AVI video FRAME decode (``decode_avi_mjpeg`` +
``sample_media_frames``), ISO-BMFF box-walk metadata for MP4
(``parse_mp4_meta``) and frame-header metadata for MP3
(``parse_mp3_meta``), byte stats for text. The JPEG codec covers
baseline AND progressive (SOF2), any chroma subsampling, restart
markers, MJPEG's omitted-DHT convention. Only H.26x/MP3-family sample
decode and arithmetic/lossless JPEG still raise
``NotImplementedError`` — those genuinely need codec libraries absent
from this container; callers inject a decoder. The
Spark-side plumbing — schema, partition-preserving ``mapInPandas``, Arrow
batch shape — is identical either way: each batch is a pandas DataFrame
of (id, bytes, meta), features come back as typed columns, and nothing
ever collects to the driver.
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Crawl-triage catch set for "skip, not fail" decode paths: the codecs
# raise ValueError/NotImplementedError for STRUCTURED failures, but bytes
# torn mid-stream can surface as IndexError/struct.error/zlib.error/
# EOFError/OverflowError before any codec-level validation runs (e.g. a
# GIF truncated inside a sub-block walk indexes past EOF). Corrupt media
# are data in a crawl corpus — one bad payload must never kill the task.
_DECODE_ERRORS = (
    ValueError,
    NotImplementedError,
    IndexError,
    KeyError,
    struct.error,
    zlib.error,
    EOFError,
    OverflowError,
)

# Module-level so worker closures reference these as multimodal globals:
# this module ships by VALUE (_ship_codecs_by_value) and so do functions
# whose defining module is registered — a lazy in-function
# `import data_etl_with_dbt_spark...` would instead re-import by NAME on
# the executor and die with ModuleNotFoundError (repo not on worker
# sys.path; pinned by test_jpeg_media_through_arrow_feature_extraction).
from data_etl_with_dbt_spark.operators.gif import decode_gif, encode_gif
from data_etl_with_dbt_spark.operators.jpeg import decode_jpeg, encode_jpeg


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


def _ship_codecs_by_value() -> None:
    """Register this module AND the jpeg/gif codec modules for cloudpickle
    by-VALUE serialization. Worker closures here call module-level codec
    helpers (decode_png/_decode_image/... and, lazily, operators.jpeg);
    by-reference pickling would make executors import the package, which
    fails whenever the repo isn't on the worker's sys.path (no pip
    install). Shipping both modules by value keeps every closure
    self-contained wherever the session was launched from."""
    import sys

    from pyspark.cloudpickle import register_pickle_by_value

    from data_etl_with_dbt_spark.operators import gif as _gif_mod
    from data_etl_with_dbt_spark.operators import jpeg as _jpeg_mod

    register_pickle_by_value(sys.modules[__name__])
    register_pickle_by_value(_jpeg_mod)
    register_pickle_by_value(_gif_mod)


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


_EXT_MIME = {
    "bmp": "image/bmp",
    "ppm": "image/x-portable-pixmap",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "wav": "audio/wav",
    "mp3": "audio/mpeg",
    "mp4": "video/mp4",
    "txt": "text/plain",
    "md": "text/markdown",
    "html": "text/html",
}


def media_from_binary_files(files: DataFrame) -> DataFrame:
    """Bridge a ``binaryFile`` scan (``sources.io.read_binary_files``:
    path/modificationTime/length/content) to the engine's media shape —
    ``media_id`` is the path hash, mime inferred from the file extension
    (octet-stream when unknown), source keeps the full path for lineage.
    Pure Catalyst projection; the bytes column passes through untouched."""
    ext = F.lower(F.element_at(F.split(F.col("path"), r"\."), -1))
    mime_map = F.create_map(
        *[F.lit(x) for kv in sorted(_EXT_MIME.items()) for x in kv]
    )
    return files.select(
        F.xxhash64(F.col("path")).alias("media_id"),
        F.col("content"),
        F.struct(
            F.coalesce(mime_map[ext], F.lit("application/octet-stream")).alias("mime"),
            F.col("length").cast("long").alias("n_bytes"),
            F.col("path").alias("source"),
        ).alias("meta"),
    )


def decode_bmp(content: bytes):
    """Dependency-free BMP decode (numpy): uncompressed 24-bpp Windows BMP
    (BITMAPFILEHEADER + BITMAPINFOHEADER), 4-byte-padded bottom-up or
    top-down rows, BGR storage. Returns an (H, W, 3) uint8 RGB array."""
    import numpy as np

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload (missing 'BM' magic)")
    pixel_offset = int.from_bytes(content[10:14], "little")
    width = int.from_bytes(content[18:22], "little", signed=True)
    height = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bpp BMP supported (bpp={bpp}, compression={compression})")
    bottom_up = height > 0
    h, w = abs(height), width
    stride = (w * 3 + 3) // 4 * 4
    data = np.frombuffer(content, np.uint8, count=stride * h, offset=pixel_offset)
    bgr = data.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return rgb[::-1] if bottom_up else rgb


def encode_bmp(rgb) -> bytes:
    """Inverse of :func:`decode_bmp` (24-bpp bottom-up): test round-trips and
    deterministic media fixtures without codec libraries."""
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, stride), np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    pixels = rows.tobytes()
    info = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(pixels).to_bytes(4, "little") + (2835).to_bytes(4, "little") * 2
        + (0).to_bytes(4, "little") * 2
    )
    header = b"BM" + (14 + 40 + len(pixels)).to_bytes(4, "little") + b"\0\0\0\0" + (54).to_bytes(4, "little")
    return header + info + pixels


def decode_ppm(content: bytes):
    """Dependency-free binary PPM (P6, maxval ≤ 255) decode with
    whitespace/comment-tolerant header parsing. Returns (H, W, 3) uint8."""
    import numpy as np

    if content[:2] != b"P6":
        raise ValueError("not a binary PPM payload (missing 'P6' magic)")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment runs to end of line
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    data = np.frombuffer(content, np.uint8, count=w * h * 3, offset=pos)
    return data.reshape(h, w, 3)


def encode_ppm(rgb) -> bytes:
    import numpy as np

    arr = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def _png_unfilter(np, raw, h, stride, bpp, offset=0):
    """Undo PNG scanline filtering for ``h`` rows of ``stride`` bytes
    starting at ``offset`` in the decompressed stream (each row is
    prefixed by its filter-type byte). Returns (rows ndarray, next
    offset). All five filters (None/Sub/Up/Average/Paeth)."""
    if len(raw) < offset + h * (1 + stride):
        raise ValueError("PNG IDAT truncated")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)  # row above row 0 is implicit zeros
    for y in range(h):
        base = offset + y * (1 + stride)
        ft = raw[base]
        cur = np.frombuffer(raw, np.uint8, stride, base + 1).copy()
        if ft == 0:  # None
            pass
        elif ft == 2:  # Up — vectorized, uint8 addition wraps mod 256
            cur += prev
        elif ft in (1, 3, 4):  # Sub/Average/Paeth are sequential in x
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if ft == 1:
                    pred = a
                elif ft == 3:
                    pred = (a + int(prev[x])) >> 1
                else:
                    b, c = int(prev[x]), int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if pa <= pb and pa <= pc else b if pb <= pc else c
                cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out[y] = cur
        prev = cur
    return out, offset + h * (1 + stride)


def _png_rows_to_samples(np, rows, w, channels, depth):
    """Filtered-row bytes → (rows, w, channels) uint8 samples for one
    (sub-)image: 16-bit takes the high byte (the standard 8-bit
    reduction), sub-8-bit depths unpack MSB-first and scale gray to
    full range (palette indices pass through)."""
    n = rows.shape[0]
    if depth == 8:
        return rows[:, : w * channels].reshape(n, w, channels)
    if depth == 16:
        return rows.reshape(n, -1, 2)[:, : w * channels, 0].reshape(
            n, w, channels
        )
    # depths 1/2/4: single-channel only (gray or palette index)
    bits = np.unpackbits(rows, axis=1)
    per = depth
    samples = np.zeros((n, w), np.uint8)
    for b in range(per):
        samples = (samples << 1) | bits[:, b::per][:, :w]
    return samples.reshape(n, w, 1)


#: Adam7 pass geometry: (row0, col0, row_step, col_step)
_ADAM7 = [
    (0, 0, 8, 8), (0, 4, 8, 8), (4, 0, 8, 4), (0, 2, 4, 4),
    (2, 0, 4, 2), (0, 1, 2, 2), (1, 0, 2, 1),
]


def decode_png(content: bytes):
    """Dependency-free PNG decode (stdlib zlib + numpy): gray / RGB /
    gray+alpha / RGBA / palette (PLTE, optional tRNS transparency) at
    depths 1/2/4/8/16 (16-bit reduces to 8 via the high byte; sub-8-bit
    gray scales to full range), Adam7 interlaced or not, all five
    scanline filters (None/Sub/Up/Average/Paeth). Returns an (H, W, C)
    uint8 array — palette images expand to RGB (or RGBA when tRNS is
    present)."""
    import zlib

    import numpy as np

    if content[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG payload (missing signature)")
    pos, ihdr, idat, plte, trns = len(_PNG_SIG), None, [], None, None
    while pos + 8 <= len(content):
        size = int.from_bytes(content[pos : pos + 4], "big")
        ctype = content[pos + 4 : pos + 8]
        if ctype == b"IHDR":
            ihdr = content[pos + 8 : pos + 8 + size]
        elif ctype == b"IDAT":
            idat.append(content[pos + 8 : pos + 8 + size])
        elif ctype == b"PLTE":
            plte = content[pos + 8 : pos + 8 + size]
        elif ctype == b"tRNS":
            trns = content[pos + 8 : pos + 8 + size]
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT chunk")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    bit_depth, color_type, interlace = ihdr[8], ihdr[9], ihdr[12]
    if color_type == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE chunk")
        channels = 1  # one palette index per pixel on the wire
    else:
        channels = _PNG_CHANNELS.get(color_type)
    if (
        channels is None
        or interlace not in (0, 1)
        or bit_depth not in (1, 2, 4, 8, 16)
        or (bit_depth < 8 and channels != 1)
    ):
        raise NotImplementedError(
            f"unsupported PNG layout (depth={bit_depth}, "
            f"color_type={color_type}, interlace={interlace})"
        )
    raw = zlib.decompress(b"".join(idat))

    def stride_of(width):
        if bit_depth >= 8:
            return width * channels * (bit_depth // 8)
        return -(-width * bit_depth // 8)

    bpp = max(1, channels * (bit_depth // 8))
    img = np.zeros((h, w, channels), np.uint8)
    if interlace == 0:
        rows, _ = _png_unfilter(np, raw, h, stride_of(w), bpp)
        img = _png_rows_to_samples(np, rows, w, channels, bit_depth)
    else:  # Adam7: seven independently-filtered sub-images, scattered
        offset = 0
        for r0, c0, rs, cs in _ADAM7:
            pw = -(-(w - c0) // cs) if w > c0 else 0
            ph = -(-(h - r0) // rs) if h > r0 else 0
            if pw == 0 or ph == 0:
                continue
            rows, offset = _png_unfilter(
                np, raw, ph, stride_of(pw), bpp, offset
            )
            sub = _png_rows_to_samples(np, rows, pw, channels, bit_depth)
            img[r0::rs, c0::cs] = sub
    if color_type == 0 and bit_depth < 8:  # scale gray to full range
        img = (img.astype(np.uint16) * (255 // ((1 << bit_depth) - 1))).astype(
            np.uint8
        )
    if color_type == 3:
        palette = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = img.reshape(h, w)
        rgb = palette[idx]  # (H, W, 3) gather
        if trns is not None:
            alpha_lut = np.full(palette.shape[0], 255, np.uint8)
            alpha_lut[: len(trns)] = np.frombuffer(trns, np.uint8)
            return np.dstack([rgb, alpha_lut[idx]])
        return rgb
    return img


def encode_png(img, interlace: bool = False) -> bytes:
    """Inverse of :func:`decode_png` (filter 0 scanlines, one zlib stream):
    deterministic image fixtures without codec libraries. ``img`` is
    (H, W) or (H, W, C) uint8 with C in {1, 2, 3, 4}.
    ``interlace=True`` writes the seven Adam7 sub-images (pass extraction
    is just strided slicing) — fixtures for the interlaced decode path."""
    import zlib

    import numpy as np

    arr = np.asarray(img, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, int(interlace)])
    )
    if interlace:
        scanlines = b"".join(
            b"".join(b"\x00" + row.tobytes() for row in arr[r0::rs, c0::cs])
            for r0, c0, rs, cs in _ADAM7
            if arr[r0::rs, c0::cs].size
        )
    else:
        scanlines = b"".join(
            b"\x00" + arr[y].tobytes() for y in range(h)
        )

    def chunk(ctype: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
        return len(body).to_bytes(4, "big") + ctype + body + crc.to_bytes(4, "big")

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines, 6))
        + chunk(b"IEND", b"")
    )


def _to_rgb3(arr):
    """Normalize a decoded (H, W, C) image to 3 RGB channels for
    ``image_features``: gray repeats, alpha drops."""
    import numpy as np

    if arr.shape[2] == 3:
        return arr
    if arr.shape[2] == 4:
        return arr[:, :, :3]
    return np.repeat(arr[:, :, :1], 3, axis=2)




def _mulaw_table(np):
    """G.711 mu-law byte -> linear int16 expansion LUT (256 entries)."""
    u = ~np.arange(256, dtype=np.int32) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_table(np):
    """G.711 A-law byte -> linear int16 expansion LUT (256 entries)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    mag = np.where(
        exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << (exp - 1)
    )
    # G.711 A-law: the (xored) sign bit SET means POSITIVE
    return np.where(sign, mag, -mag).astype(np.int16)


#: IMA ADPCM step-size + index-adjust tables (public spec constants)
_IMA_STEPS = [
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
]
_IMA_INDEX_ADJ = [-1, -1, -1, -1, 2, 4, 6, 8]


def _ima_adpcm_decode(np, data: bytes, n_channels: int, block_align: int):
    """IMA ADPCM block decode: each block carries a 4-byte per-channel
    header (int16 predictor + step index) then interleaved 4-byte
    per-channel nibble groups (8 samples each). Sequential per block by
    construction (each nibble updates predictor + index); blocks are
    independent, so a warehouse-scale decoder parallelizes on blocks —
    here files are small enough to run straight."""
    out = [[] for _ in range(n_channels)]
    for start in range(0, len(data) - block_align + 1, block_align):
        block = data[start : start + block_align]
        preds, idxs = [], []
        for c in range(n_channels):
            p = int.from_bytes(block[c * 4 : c * 4 + 2], "little", signed=True)
            i = min(88, block[c * 4 + 2])
            preds.append(p)
            idxs.append(i)
            out[c].append(p)
        body = block[4 * n_channels :]
        # nibble groups: 4 bytes per channel, channels interleaved
        for g in range(0, len(body), 4 * n_channels):
            for c in range(n_channels):
                for byte in block[4 * n_channels + g + 4 * c :][:4]:
                    for nib in (byte & 0x0F, byte >> 4):
                        step = _IMA_STEPS[idxs[c]]
                        diff = step >> 3
                        if nib & 1:
                            diff += step >> 2
                        if nib & 2:
                            diff += step >> 1
                        if nib & 4:
                            diff += step
                        if nib & 8:
                            preds[c] -= diff
                        else:
                            preds[c] += diff
                        preds[c] = max(-32768, min(32767, preds[c]))
                        idxs[c] = max(
                            0, min(88, idxs[c] + _IMA_INDEX_ADJ[nib & 7])
                        )
                        out[c].append(preds[c])
    n = min(len(ch) for ch in out)
    return np.stack(
        [np.array(ch[:n], np.int16) for ch in out], axis=1
    )


#: MS ADPCM predefined predictor coefficient pairs and adaption table
_MS_COEFS = [(256, 0), (512, -256), (0, 0), (192, 64), (240, 0), (460, -208), (392, -232)]
_MS_ADAPT = [230, 230, 230, 230, 307, 409, 512, 614, 768, 614, 512, 409, 307, 230, 230, 230]


def _ms_adpcm_decode(np, data: bytes, n_channels: int, block_align: int):
    """MS ADPCM block decode: per block per channel, a header carrying the
    predictor index, initial delta, and the two previous samples; then
    4-bit nibbles (high nibble first; channels interleaved per nibble in
    stereo). Same scale posture as IMA: blocks independent, nibbles
    sequential within a block."""
    out = [[] for _ in range(n_channels)]
    for start in range(0, len(data) - block_align + 1, block_align):
        block = data[start : start + block_align]
        preds = [min(block[c], 6) for c in range(n_channels)]
        o = n_channels
        deltas, s1, s2 = [], [], []
        for c in range(n_channels):
            deltas.append(int.from_bytes(block[o + 2 * c : o + 2 * c + 2], "little", signed=True))
        o += 2 * n_channels
        for c in range(n_channels):
            s1.append(int.from_bytes(block[o + 2 * c : o + 2 * c + 2], "little", signed=True))
        o += 2 * n_channels
        for c in range(n_channels):
            s2.append(int.from_bytes(block[o + 2 * c : o + 2 * c + 2], "little", signed=True))
        o += 2 * n_channels
        for c in range(n_channels):
            out[c] += [s2[c], s1[c]]
        chan = 0
        for byte in block[o:]:
            for nib in (byte >> 4, byte & 0x0F):
                c = chan % n_channels
                chan += 1
                c1, c2 = _MS_COEFS[preds[c]]
                pred = (s1[c] * c1 + s2[c] * c2) >> 8
                signed = nib - 16 if nib & 8 else nib
                sample = max(-32768, min(32767, pred + signed * deltas[c]))
                s2[c], s1[c] = s1[c], sample
                deltas[c] = max(16, (_MS_ADAPT[nib] * deltas[c]) >> 8)
                out[c].append(sample)
    n = min(len(ch) for ch in out)
    return np.stack([np.array(ch[:n], np.int16) for ch in out], axis=1)


def decode_wav(content: bytes):
    """Dependency-free WAV decode (numpy): RIFF/WAVE chunk walk. Formats:
    PCM 16-bit and 8-bit (format 1), IEEE float 32/64 (3), A-law (6) and
    mu-law (7) via G.711 expansion LUTs, and IMA (0x11) + MS (2) ADPCM
    block decode — the telephony / legacy-archive encodings a scraped
    audio corpus actually contains.
    Returns ``(samples, sample_rate)`` with samples shaped (n_frames,
    n_channels) int16. Chunks are length-prefixed and word-aligned, so
    unknown chunks (LIST, fact, cue) skip cleanly."""
    import numpy as np

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a WAV payload (missing RIFF/WAVE magic)")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    n_channels = int.from_bytes(fmt[2:4], "little")
    sample_rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format == 1 and bits == 16:
        frames = np.frombuffer(data, "<i2", count=len(data) // 2)
        return frames.reshape(-1, n_channels), sample_rate
    if audio_format == 1 and bits == 8:  # unsigned 8-bit PCM
        frames = (
            np.frombuffer(data, np.uint8).astype(np.int16) - 128
        ) << 8
        return frames.reshape(-1, n_channels), sample_rate
    if audio_format in (6, 7):  # A-law / mu-law (G.711), 8 bits/sample
        lut = _alaw_table(np) if audio_format == 6 else _mulaw_table(np)
        frames = lut[np.frombuffer(data, np.uint8)]
        return frames.reshape(-1, n_channels), sample_rate
    if audio_format == 0x11:  # IMA ADPCM, 4 bits/sample, block-based
        frames = _ima_adpcm_decode(np, data, n_channels, block_align)
        return frames, sample_rate
    if audio_format == 2:  # MS ADPCM, 4 bits/sample, block-based
        frames = _ms_adpcm_decode(np, data, n_channels, block_align)
        return frames, sample_rate
    if audio_format == 3 and bits in (32, 64):  # IEEE float, [-1, 1]
        dt = "<f4" if bits == 32 else "<f8"
        f = np.frombuffer(data, dt, count=len(data) // (bits // 8))
        frames = np.clip(
            np.round(f * 32767.0), -32768, 32767
        ).astype(np.int16)
        return frames.reshape(-1, n_channels), sample_rate
    raise NotImplementedError(
        f"unsupported WAV encoding (format={audio_format}, bits={bits}); "
        "PCM 8/16-bit, IEEE float 32/64, A-law, mu-law, IMA ADPCM, and "
        "MS ADPCM decode built-in"
    )


def encode_wav(samples, sample_rate: int) -> bytes:
    """Inverse of :func:`decode_wav` (16-bit PCM): deterministic audio
    fixtures without codec libraries. ``samples`` is (n_frames, n_channels)
    int16 (a 1-D array is treated as mono)."""
    import numpy as np

    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n_channels = arr.shape[1]
    data = arr.tobytes()
    byte_rate = sample_rate * n_channels * 2
    fmt = (
        (1).to_bytes(2, "little") + n_channels.to_bytes(2, "little")
        + sample_rate.to_bytes(4, "little") + byte_rate.to_bytes(4, "little")
        + (n_channels * 2).to_bytes(2, "little") + (16).to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def audio_features(samples, sample_rate: int) -> list[float]:
    """Fixed-shape audio stats: [n_frames, n_channels, sample_rate,
    duration_s, rms, peak, zero_crossing_rate] over the channel-mean signal.
    All aggregates are exact int64 sums; the derived doubles are one IEEE
    division (plus one exactly-rounded sqrt), so they're deterministic."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.int64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n, c = arr.shape
    if n == 0:
        return [0.0, float(c), float(sample_rate), 0.0, 0.0, 0.0, 0.0]
    mono_scaled = arr.sum(axis=1)  # c * mean signal, exact ints
    rms = float(int((mono_scaled**2).sum())) ** 0.5 / (c * float(n) ** 0.5)
    peak = float(int(np.abs(arr).max()))
    signs = mono_scaled > 0
    zcr = float(int((signs[1:] != signs[:-1]).sum())) / n
    return [float(n), float(c), float(sample_rate), n / float(sample_rate), rms, peak, zcr]


def image_features(rgb) -> list[float]:
    """Fixed-shape image stats: [width, height, channels, mean_r, mean_g,
    mean_b, mean_gray]. Integer pixel sums are exact, so the derived doubles
    are deterministic across runs and engines."""
    h, w, c = rgb.shape
    n = float(h * w)
    sums = rgb.astype("int64").sum(axis=(0, 1))
    means = [float(s) / n for s in sums]
    return [float(w), float(h), float(c), *means, sum(means) / 3.0]


def text_byte_features(content: bytes) -> list[float]:
    """Byte stats for text media: [n_bytes, mean_byte, printable_ratio].
    Exact integer sums → deterministic doubles (the SQL oracle mirrors the
    same sum/ratio arithmetic over ASCII code points)."""
    import numpy as np

    n = len(content)
    if n == 0:
        return [0.0, 0.0, 0.0]
    arr = np.frombuffer(content, np.uint8)
    printable = int(((arr >= 32) & (arr <= 126)).sum())
    return [float(n), float(int(arr.sum(dtype="int64"))) / n, float(printable) / n]


def default_decoder(content: bytes, mime: str):
    """Real dependency-free codecs: baseline + progressive JPEG (huffman
    + IDCT, operators/jpeg.py), PNG at depths 1-16 interlaced or not
    (stdlib zlib inflate + unfilter), uncompressed 24-bpp BMP, and binary
    PPM → image stats; 16-bit PCM WAV → audio stats; ``text/*`` media →
    byte stats. Formats needing external libraries (MP3/video sample
    decode, arithmetic-coded JPEG) still raise — inject a decoder for
    those."""
    content = bytes(content)
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return image_features(_to_rgb3(decode_png(content)))
    if content[:2] == b"\xff\xd8":
        return image_features(_to_rgb3(decode_jpeg(content)))
    if content[:2] == b"BM":
        return image_features(decode_bmp(content))
    if content[:2] == b"P6":
        return image_features(decode_ppm(content))
    if content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        return audio_features(*decode_wav(content))
    if content[:4] == b"RIFF" and content[8:12] == b"AVI ":
        m = parse_avi_meta(content)
        return [
            float(m["width"] * m["height"]),
            float(m["n_frames"]),
            m["duration_seconds"],
        ]
    if content[4:8] == b"ftyp":
        m = parse_mp4_meta(content)
        return [
            float(m["duration_seconds"] or 0.0),
            float(m["timescale"] or 0),
            float(m["n_tracks"]),
        ]
    if content[:3] == b"ID3" or (
        len(content) >= 2 and content[0] == 0xFF and (content[1] & 0xE0) == 0xE0
    ):
        m = parse_mp3_meta(content)
        return [
            m["est_duration_seconds"],
            float(m["sample_rate"]),
            float(m["bitrate_kbps"]),
        ]
    if content[:3] == b"GIF":
        m = parse_gif_meta(content)
        return [
            float(m["width"] * m["height"]),
            float(m["n_frames"]),
            m["animation_seconds"],
        ]
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        m = parse_webp_meta(content)
        return [
            float(m["width"] * m["height"]),
            float(m["has_alpha"]),
            float(m["is_animated"]),
        ]
    if content[:4] in (b"II\x2a\x00", b"MM\x00\x2a"):
        m = parse_tiff_meta(content)
        return [
            float(m["width"] * m["height"]),
            float(m["n_pages"]),
            float(m["compression"]),
        ]
    if content[:4] == b"fLaC":
        m = parse_flac_meta(content)
        return [
            m["duration_seconds"],
            float(m["sample_rate"]),
            float(m["channels"]),
        ]
    if mime.startswith("text/"):
        return text_byte_features(content)
    raise NotImplementedError(
        f"no built-in codec for mime={mime!r}; compressed audio/video "
        "SAMPLE decode needs libraries not present in this container "
        "(container METADATA for MP4/MP3 is parsed above; baseline and "
        "progressive JPEG decode) — pass an explicit decoder"
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
    if decoder is not None and getattr(decoder, "__module__", None) == __name__:
        # Module-level decoders pickle by reference; executor Python workers
        # can't import this package unless the driver's cwd happens to be the
        # repo root. Ship the whole module by value so the closure is
        # self-contained wherever the session was launched from.
        _ship_codecs_by_value()

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
    """Video frame-sampling PLUMBING shape (one media row → many frame
    rows) using n_bytes as a stand-in frame count — kept for codecs the
    container can't decode (H.26x MP4). For MJPEG AVI and animated GIF use
    :func:`sample_media_frames`, which decodes REAL frames."""
    n_frames = (F.col("meta.n_bytes") / F.lit(every_n)).cast("int")
    # zero-frame media must contribute zero rows: explode drops the NULL
    # branch, while sequence(0, greatest(n-1, 0)) would emit a phantom
    # frame 0 for every file smaller than every_n bytes
    frame_seq = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1))
    return media.select(
        "media_id",
        F.explode(frame_seq).alias("frame_no"),
    )


def resize_image(rgb, out_h: int, out_w: int):
    """Dependency-free nearest-neighbor resize of an (H, W, 3) uint8 array —
    pure numpy index striding, deterministic (pixel-center sampling, the
    classic NN formula), no interpolation libraries needed."""
    import numpy as np

    h, w = rgb.shape[0], rgb.shape[1]
    rows = np.clip(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), 0, h - 1)
    cols = np.clip(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), 0, w - 1)
    return rgb[rows[:, None], cols[None, :]]


def _decode_image(content: bytes):
    """Magic-sniffed image decode to (H, W, 3) uint8 RGB, or None when the
    payload is not one of the built-in image formats."""
    content = bytes(content)
    if content[: len(_PNG_SIG)] == _PNG_SIG:
        return _to_rgb3(decode_png(content))
    if content[:2] == b"BM":
        return decode_bmp(content)
    if content[:2] == b"P6":
        return decode_ppm(content)
    if content[:2] == b"\xff\xd8":
        return _to_rgb3(decode_jpeg(content))
    if content[:3] == b"GIF":
        return decode_gif(content, max_frames=1)[0][0]
    return None


def _encode_jpeg_rgb(rgb) -> bytes:
    return encode_jpeg(rgb, quality=90)


_IMAGE_ENCODERS = {
    "bmp": ("image/bmp", encode_bmp),
    "ppm": ("image/x-portable-pixmap", encode_ppm),
    "png": ("image/png", encode_png),
    "jpg": ("image/jpeg", _encode_jpeg_rgb),
}


def resize_media(
    media: DataFrame,
    height: int,
    width: int,
    output_format: str = "bmp",
) -> DataFrame:
    """Distributed image resize over the media table: decode each image
    payload (built-in BMP/PPM/PNG codecs), nearest-neighbor resize to
    ``height x width``, re-encode in ``output_format``, and emit the SAME
    media shape (media_id, content, meta) so resize stages compose with
    every other media operator. Non-image rows (audio, text, unknown
    formats) pass through byte-identical — a pipeline can run one resize
    over a mixed-modality table.

    Same execution posture as :func:`extract_media_features`: Arrow-batched
    ``mapInPandas``, partition-preserving, nothing collects to the driver.
    The decode→numpy→encode round trip is per-row Python by necessity
    (codec work), batched by Arrow so the per-row overhead is amortized.
    """
    if output_format not in _IMAGE_ENCODERS:
        raise ValueError(
            f"output_format must be one of {sorted(_IMAGE_ENCODERS)}, got "
            f"{output_format!r}"
        )
    _ship_codecs_by_value()
    out_mime, encode = _IMAGE_ENCODERS[output_format]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                try:
                    rgb = _decode_image(bytes(content))
                except _DECODE_ERRORS:
                    rgb = None  # undecodable image passes through raw
                if rgb is None:
                    contents.append(bytes(content))
                    metas.append(meta)
                else:
                    payload = encode(resize_image(rgb, height, width))
                    metas.append(
                        {
                            "mime": out_mime,
                            "n_bytes": len(payload),
                            "source": meta["source"],
                        }
                    )
                    contents.append(payload)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "content": contents,
                    "meta": metas,
                }
            )

    return media.mapInPandas(run, MEDIA_SCHEMA)


def decode_avi_mjpeg(
    content: bytes, max_frames: int | None = None, every_n: int = 1
):
    """Decode an MJPEG AVI to ``(frames, fps)`` — REAL video sample decode,
    dependency-free: RIFF/AVI list walk to the ``movi`` payload, each
    ``##dc``/``##db`` chunk of the first video stream is a standalone JPEG
    (MJPEG may omit DHT; the JPEG decoder assumes Annex-K tables then, per
    the MJPEG convention). Frames return as (H, W, 3) uint8; ``fps`` from
    the main header's microseconds-per-frame. Other codecs inside AVI
    raise ``NotImplementedError`` (fourcc reported).

    ``every_n`` decodes only every Nth video chunk (frame j of the result
    is source frame ``j * every_n``) and ``max_frames`` caps the DECODED
    count — because MJPEG frames are independent, skipped chunks cost one
    8-byte header read each, so per-file decode work is
    O(sampled frames + chunk count), never O(total frames). An hour-long
    AVI sampled at every_n=100/max_frames=10 decodes 10 JPEGs.
    """
    data = bytes(content)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    fps = 0.0
    compression = None
    frames = []
    # AVI stream numbers are strh order in hdrl; movi chunk ids carry that
    # two-digit number (##dc/##db). Track the FIRST vids stream's number and
    # decode only its chunks — a second video stream or an interleaved
    # audio/data stream must not contribute frames.
    n_strh = 0
    video_stream = None
    n_seen = 0  # video chunks encountered (sampled or skipped)

    def walk(pos, end):
        nonlocal fps, compression, n_strh, video_stream, n_seen
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body_start = pos + 8
            if cid == b"LIST":
                walk(body_start + 4, body_start + size)
            elif cid == b"avih":
                usec = int.from_bytes(data[body_start : body_start + 4], "little")
                fps = 1e6 / usec if usec else 0.0
            elif cid == b"strh":
                if (
                    data[body_start : body_start + 4] == b"vids"
                    and video_stream is None
                ):
                    video_stream = n_strh
                    compression = data[body_start + 4 : body_start + 8]
                n_strh += 1
            elif (
                cid[2:4] in (b"dc", b"db")
                and cid[:2].isdigit()
                and video_stream is not None
                and int(cid[:2]) == video_stream
            ):
                if size == 0:
                    # dropped-frame placeholder (real capture AVIs emit
                    # 0-byte ##dc chunks): a full decode appends nothing
                    # for it, so it must not count toward n_seen either —
                    # sampled output stays exactly full[::every_n]
                    pos = body_start + size + (size & 1)
                    continue
                sampled = n_seen % every_n == 0 and (
                    max_frames is None or len(frames) < max_frames
                )
                n_seen += 1
                if not sampled:
                    pos = body_start + size + (size & 1)
                    continue
                chunk = data[body_start : body_start + size]
                if chunk[:2] == b"\xff\xd8":
                    # decode_jpeg is the module-level global (ships by
                    # value with this module — a lazy import here dies on
                    # executors, see _ship_codecs_by_value)
                    frames.append(_to_rgb3(decode_jpeg(chunk)))
                elif chunk:
                    four = (compression or b"????").decode("ascii", "replace")
                    raise NotImplementedError(
                        f"AVI stream is not MJPEG (fourcc {four!r}) — inject "
                        "a codec library for compressed video"
                    )
            pos = body_start + size + (size & 1)  # chunks are word-aligned

    walk(12, len(data))
    if not frames:
        raise ValueError("AVI contains no decodable MJPEG frames")
    return frames, fps


def encode_avi_mjpeg(frames, fps: float = 10.0, quality: int = 85) -> bytes:
    """Minimal MJPEG AVI writer (fixture generator): one video stream,
    each frame an ``encode_jpeg`` payload in a ``00dc`` chunk."""
    import numpy as np

    frames = [np.asarray(f, np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    payloads = [encode_jpeg(f, quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + len(body).to_bytes(4, "little") + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    usec = int(1e6 / fps)
    avih = (
        usec.to_bytes(4, "little") + (0).to_bytes(4, "little") * 2
        + (0x10).to_bytes(4, "little")  # AVIF_HASINDEX off, flags minimal
        + len(frames).to_bytes(4, "little") + (0).to_bytes(4, "little")
        + (1).to_bytes(4, "little") + (0).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    strh = (
        b"vids" + b"MJPG" + (0).to_bytes(4, "little") * 3
        + (1).to_bytes(4, "little") + int(fps).to_bytes(4, "little")
        + (0).to_bytes(4, "little") + len(frames).to_bytes(4, "little")
        + (0).to_bytes(4, "little") * 4
    )
    strf = (
        (40).to_bytes(4, "little") + w.to_bytes(4, "little")
        + h.to_bytes(4, "little") + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + b"MJPG"
        + (w * h * 3).to_bytes(4, "little") + (0).to_bytes(4, "little") * 4
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", p) for p in payloads))
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + len(riff_body).to_bytes(4, "little") + riff_body


def parse_avi_meta(content: bytes) -> dict:
    """Header-only AVI metadata (cheap — no frame decode): width, height,
    fps, total frames, video fourcc, duration."""
    data = bytes(content)
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload (missing RIFF/AVI magic)")
    out = {"width": 0, "height": 0, "fps": 0.0, "n_frames": 0,
           "fourcc": None, "duration_seconds": 0.0}

    def walk(pos, end):
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            size = int.from_bytes(data[pos + 4 : pos + 8], "little")
            body = pos + 8
            if cid == b"LIST":
                kind = data[body : body + 4]
                if kind == b"movi":  # payload — stop, headers precede it
                    return
                walk(body + 4, body + size)
            elif cid == b"avih":
                usec = int.from_bytes(data[body : body + 4], "little")
                out["fps"] = 1e6 / usec if usec else 0.0
                out["n_frames"] = int.from_bytes(data[body + 16 : body + 20], "little")
                out["width"] = int.from_bytes(data[body + 32 : body + 36], "little")
                out["height"] = int.from_bytes(data[body + 36 : body + 40], "little")
            elif cid == b"strh" and data[body : body + 4] == b"vids":
                out["fourcc"] = data[body + 4 : body + 8].decode("ascii", "replace")
            pos = body + size + (size & 1)

    walk(12, len(data))
    if out["fps"]:
        out["duration_seconds"] = out["n_frames"] / out["fps"]
    return out


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("t_seconds", T.DoubleType()),
        T.StructField("frame_png", T.BinaryType()),
    ]
)


def sample_media_frames(
    media: DataFrame, every_n: int = 10, max_frames: int | None = None
) -> DataFrame:
    """REAL video/animation frame sampling — the operator
    :func:`frame_sample_stub` stood in for: decode every ``every_n``-th
    frame of MJPEG AVI and animated GIF payloads to rows
    ``(media_id, frame_idx, t_seconds, frame_png)``, the frame re-encoded
    as PNG (lossless, self-describing) for downstream image operators
    (dHash dedup, feature extraction, resize).

    Scale posture: Arrow-batched ``mapInPandas`` — bytes never leave the
    executors, one media row explodes to its sampled frames, and
    ``every_n``/``max_frames`` bound per-file DECODE work, not just row
    count: MJPEG AVI frames are independent, so skipped chunks are never
    JPEG-decoded (one header read each — a pathological hour-long AVI
    decodes ``max_frames`` JPEGs, not 10^5); GIF frames compose onto the
    canvas sequentially (disposal/transparency depend on prior frames),
    so decode runs only up to the LAST sampled index and stops. Non-video
    payloads and non-MJPEG AVIs yield no rows (skip, not fail — corpus
    triage wants the decodable subset)."""
    _ship_codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gif_cap = (
            (max_frames - 1) * every_n + 1 if max_frames is not None else None
        )
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "t_seconds": [], "frame_png": []}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                blob = bytes(content)
                try:
                    if blob[:4] == b"RIFF" and blob[8:12] == b"AVI ":
                        # sampling pushed into the chunk walk: only every
                        # every_n-th chunk is JPEG-decoded
                        frames, fps = decode_avi_mjpeg(
                            blob, max_frames=max_frames, every_n=every_n
                        )
                        dt = (1.0 / fps) if fps else 0.0
                        for j, frame in enumerate(frames):
                            i = j * every_n
                            out["media_id"].append(mid)
                            out["frame_idx"].append(i)
                            out["t_seconds"].append(i * dt)
                            out["frame_png"].append(encode_png(frame))
                        continue
                    if blob[:3] == b"GIF":
                        frames, delays = decode_gif(blob, max_frames=gif_cap)
                    else:
                        continue
                except _DECODE_ERRORS:
                    continue
                t = 0.0
                kept = 0
                for i, frame in enumerate(frames):
                    t_i, t = t, t + delays[i] / 100.0
                    if i % every_n:
                        continue
                    if max_frames is not None and kept >= max_frames:
                        break
                    kept += 1
                    out["media_id"].append(mid)
                    out["frame_idx"].append(i)
                    out["t_seconds"].append(t_i)
                    out["frame_png"].append(encode_png(frame))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, FRAME_SCHEMA)


def parse_mp4_meta(content: bytes) -> dict:
    """Dependency-free MP4/ISO-BMFF metadata: walk the top-level box
    structure (size + fourcc), read ``ftyp``'s major brand and ``moov/
    mvhd``'s timescale + duration (version 0 and 1 layouts), count
    ``trak`` boxes. This is what real pipelines extract WITHOUT a codec —
    frame decode still needs libraries and still raises."""
    import struct

    content = bytes(content)

    def walk(buf, offset, end):
        while offset + 8 <= end:
            size, = struct.unpack(">I", buf[offset : offset + 4])
            ctype = buf[offset + 4 : offset + 8]
            body_off = offset + 8
            if size == 1:  # 64-bit largesize
                size, = struct.unpack(">Q", buf[offset + 8 : offset + 16])
                body_off = offset + 16
            if size == 0:
                size = end - offset
            yield ctype, body_off, offset + size
            offset += size

    meta = {"major_brand": None, "timescale": None, "duration_seconds": None, "n_tracks": 0}
    for ctype, body, box_end in walk(content, 0, len(content)):
        if ctype == b"ftyp":
            meta["major_brand"] = content[body : body + 4].decode("ascii", "replace")
        elif ctype == b"moov":
            for sub, sbody, send in walk(content, body, box_end):
                if sub == b"mvhd":
                    version = content[sbody]
                    if version == 1:
                        ts, = struct.unpack(">I", content[sbody + 20 : sbody + 24])
                        dur, = struct.unpack(">Q", content[sbody + 24 : sbody + 32])
                    else:
                        ts, = struct.unpack(">I", content[sbody + 12 : sbody + 16])
                        dur, = struct.unpack(">I", content[sbody + 16 : sbody + 20])
                    meta["timescale"] = ts
                    meta["duration_seconds"] = dur / ts if ts else None
                elif sub == b"trak":
                    meta["n_tracks"] += 1
    if meta["timescale"] is None:
        raise ValueError("no moov/mvhd box: not an MP4 movie or truncated")
    return meta


_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_MP3_RATES = [44100, 48000, 32000]


def parse_mp3_meta(content: bytes) -> dict:
    """Dependency-free MP3 stream metadata: skip an ID3v2 tag (syncsafe
    size), find the first frame sync, parse the header's bitrate/sample
    rate (MPEG-1 Layer III tables), and estimate duration from the audio
    byte count at that bitrate (exact for CBR, the common case). Sample
    DECODE still needs a codec and still raises."""
    content = bytes(content)
    off = 0
    if content[:3] == b"ID3":
        sz = (
            (content[6] << 21) | (content[7] << 14) | (content[8] << 7) | content[9]
        )
        off = 10 + sz
    while off + 4 <= len(content):
        if content[off] == 0xFF and (content[off + 1] & 0xE0) == 0xE0:
            hdr = content[off : off + 4]
            version = (hdr[1] >> 3) & 0x3  # 3 = MPEG-1
            layer = (hdr[1] >> 1) & 0x3  # 1 = Layer III
            if version == 3 and layer == 1:
                bitrate = _MP3_BITRATES[(hdr[2] >> 4) & 0xF]
                rate_idx = (hdr[2] >> 2) & 0x3
                if bitrate and rate_idx < 3:
                    sample_rate = _MP3_RATES[rate_idx]
                    # VBR: a Xing/Info tag in the first frame's side-info
                    # region carries the EXACT frame count — duration =
                    # frames * 1152 / rate, where the CBR byte estimate can
                    # be arbitrarily wrong. Offset: 4-byte header + 32/17
                    # bytes of Layer III side info (stereo/mono, MPEG-1).
                    mono = ((hdr[3] >> 6) & 0x3) == 3
                    xing_off = off + 4 + (17 if mono else 32)
                    tag = content[xing_off : xing_off + 4]
                    if tag in (b"Xing", b"Info"):
                        flags = int.from_bytes(
                            content[xing_off + 4 : xing_off + 8], "big"
                        )
                        if flags & 0x1:  # frame count present
                            frames = int.from_bytes(
                                content[xing_off + 8 : xing_off + 12], "big"
                            )
                            return {
                                "bitrate_kbps": bitrate,  # first-frame rate
                                "sample_rate": sample_rate,
                                "est_duration_seconds": frames
                                * 1152
                                / sample_rate,
                            }
                    audio_bytes = len(content) - off
                    return {
                        "bitrate_kbps": bitrate,
                        "sample_rate": sample_rate,
                        "est_duration_seconds": audio_bytes * 8 / (bitrate * 1000),
                    }
        off += 1
    raise ValueError("no MPEG-1 Layer III frame sync found")


def walk_mp3_frames(content: bytes) -> list[dict]:
    """Frame-header WALK of an MPEG-1 Layer III stream: hop frame to frame
    by each header's declared length (``144000·kbps/rate + padding``) —
    per-frame bitrate/rate/size with EXACT duration accounting for VBR
    streams that carry no Xing tag (where :func:`parse_mp3_meta`'s CBR
    byte estimate is wrong by construction). Headers only — sample decode
    still needs a codec library. Stops at EOF, an invalid header, or a
    non-MPEG-1-Layer-III frame (truncated tails are data, not errors)."""
    content = bytes(content)
    off = 0
    if content[:3] == b"ID3":
        if len(content) < 10:
            return []  # truncated mid-ID3-header: data, not an error
        sz = (
            (content[6] << 21) | (content[7] << 14) | (content[8] << 7) | content[9]
        )
        off = 10 + sz
    while off + 4 <= len(content):
        if content[off] == 0xFF and (content[off + 1] & 0xE0) == 0xE0:
            break
        off += 1
    frames: list[dict] = []
    while off + 4 <= len(content):
        hdr = content[off : off + 4]
        if not (hdr[0] == 0xFF and (hdr[1] & 0xE0) == 0xE0):
            break
        version = (hdr[1] >> 3) & 0x3
        layer = (hdr[1] >> 1) & 0x3
        br_idx = (hdr[2] >> 4) & 0xF
        rate_idx = (hdr[2] >> 2) & 0x3
        padding = (hdr[2] >> 1) & 0x1
        if version != 3 or layer != 1 or br_idx in (0, 15) or rate_idx == 3:
            break
        bitrate = _MP3_BITRATES[br_idx]
        rate = _MP3_RATES[rate_idx]
        flen = 144000 * bitrate // rate + padding
        if off + flen > len(content):
            break  # header present but body truncated: not a whole frame
        frames.append(
            {
                "frame_no": len(frames),
                "bitrate_kbps": bitrate,
                "sample_rate": rate,
                "frame_bytes": flen,
            }
        )
        off += flen
    return frames


def encode_mp3_headers(bitrates_kbps: list[int], sample_rate: int = 44100) -> bytes:
    """Synthesize a VBR MPEG-1 Layer III stream whose frame HEADERS are
    valid (one frame per requested bitrate, zero-filled payloads — no
    audible samples, headers only): the deterministic fixture generator
    for :func:`walk_mp3_frames`, exactly like ``encode_wav`` backs the WAV
    decode path. Zero payload bytes can never alias a frame sync."""
    rate_idx = _MP3_RATES.index(sample_rate)
    out = bytearray()
    for kbps in bitrates_kbps:
        br_idx = _MP3_BITRATES.index(kbps)
        flen = 144000 * kbps // sample_rate
        hdr = bytes([0xFF, 0xFB, (br_idx << 4) | (rate_idx << 2), 0x00])
        out += hdr + b"\x00" * (flen - 4)
    return bytes(out)


MP3_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("bitrate_kbps", T.LongType()),
        T.StructField("sample_rate", T.LongType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def mp3_frame_table(media: DataFrame) -> DataFrame:
    """Explode each ``audio/mpeg`` payload into its frame-header walk:
    ``(media_id, frame_no, bitrate_kbps, sample_rate, frame_bytes)`` —
    the relation a VBR bitrate histogram / exact-duration rollup
    aggregates. Arrow-batched ``mapInPandas``; bytes stay executor-side;
    per-file work is one pass over frame HEADERS (O(frames), no decode).
    Non-MP3 payloads yield no rows (corpus triage keeps the walkable
    subset)."""
    _ship_codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [],
                "frame_no": [],
                "bitrate_kbps": [],
                "sample_rate": [],
                "frame_bytes": [],
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    frames = walk_mp3_frames(bytes(content))
                except (ValueError, IndexError):
                    continue
                for fr in frames:
                    out["media_id"].append(mid)
                    out["frame_no"].append(fr["frame_no"])
                    out["bitrate_kbps"].append(fr["bitrate_kbps"])
                    out["sample_rate"].append(fr["sample_rate"])
                    out["frame_bytes"].append(fr["frame_bytes"])
            yield pd.DataFrame(out)

    return media.mapInPandas(run, MP3_FRAME_SCHEMA)


def synth_mp3_media(
    df: DataFrame, id_col: str = "doc_id", source_col: str = "source"
) -> DataFrame:
    """Deterministic synthetic MP3 corpus with KNOWN frame structure (the
    fixtures carry no audio bytes — the :func:`synth_audio_media`
    convention): row ``i`` gets ``50 + (i % 37)`` frames at 44.1 kHz,
    even frames at bitrate index ``1 + (i % 14)`` and odd frames at
    ``1 + ((i * 7) % 14)`` of the MPEG-1 Layer III table — arithmetic a
    SQL oracle reproduces exactly, so the frame walk is hash-checkable
    cross-engine."""
    _ship_codecs_by_value()

    def render(i: int) -> bytes:
        i = int(i)
        n = 50 + (i % 37)
        b1 = _MP3_BITRATES[1 + (i % 14)]
        b2 = _MP3_BITRATES[1 + ((i * 7) % 14)]
        return encode_mp3_headers([b1 if j % 2 == 0 else b2 for j in range(n)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "content": payloads,
                    "meta": [
                        {"mime": "audio/mpeg", "n_bytes": len(p), "source": s}
                        for p, s in zip(payloads, pdf[source_col])
                    ],
                }
            )

    return df.select(id_col, source_col).mapInPandas(run, MEDIA_SCHEMA)


FRAME_TIME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_no", T.LongType()),
        T.StructField("t_seconds", T.DoubleType()),
    ]
)


def sample_frame_times(media: DataFrame, fps: float = 1.0) -> DataFrame:
    """Video frame-sample PLAN from real container metadata: parse each
    MP4's ``moov/mvhd`` duration (:func:`parse_mp4_meta` — no codec
    needed), then emit one row per sample instant at ``fps`` —
    ``(media_id, frame_no, t_seconds)``. This is the seek table a frame
    EXTRACTOR consumes; pixel decode is the only step left to a codec
    library. Non-MP4 rows are skipped.

    Arrow-batched ``mapInPandas`` for the parse (bytes stay executor-
    side), output rows explode per sample — the one-media-row-to-many-
    frame-rows shape downstream samplers expect. Replaces the byte-count
    heuristic of the earlier stub wherever real MP4 payloads exist."""
    _ship_codecs_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, frames, times = [], [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                raw = bytes(content)
                if raw[4:8] != b"ftyp":
                    continue
                try:
                    dur = parse_mp4_meta(raw)["duration_seconds"] or 0.0
                except _DECODE_ERRORS:
                    continue  # torn boxes / moov-less fragment: skip

                n = int(dur * fps)
                for i in range(n):
                    ids.append(media_id)
                    frames.append(i)
                    times.append(i / fps)
            yield pd.DataFrame(
                {"media_id": ids, "frame_no": frames, "t_seconds": times}
            )

    return media.mapInPandas(run, FRAME_TIME_SCHEMA)


def parse_gif_meta(content: bytes) -> dict:
    """Dependency-free GIF container metadata: header version, logical
    screen dimensions, global-palette size, frame count, and total
    animation delay — by WALKING the block structure (extensions and LZW
    data ride in length-prefixed sub-blocks, so skipping needs no
    decompression). Frame DECODE needs an LZW implementation and raises
    through :func:`default_decoder` like the other compressed formats."""
    content = bytes(content)
    if content[:3] != b"GIF" or content[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a header)")
    version = content[3:6].decode()
    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    packed = content[10]
    gct_size = (2 ** ((packed & 0x7) + 1)) if packed & 0x80 else 0
    pos = 13 + 3 * gct_size  # header + LSD + global color table

    def skip_subblocks(p: int) -> int:
        while p < len(content) and content[p] != 0:
            p += 1 + content[p]
        return p + 1  # past the 0 terminator

    frames, delay_cs = 0, 0
    while pos < len(content):
        marker = content[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension: label + sub-blocks
            label = content[pos + 1]
            if label == 0xF9 and content[pos + 2] >= 4:  # graphic control
                delay_cs += int.from_bytes(content[pos + 4 : pos + 6], "little")
            pos = skip_subblocks(pos + 2)
        elif marker == 0x2C:  # image descriptor
            frames += 1
            lpacked = content[pos + 9]
            lct_size = (2 ** ((lpacked & 0x7) + 1)) if lpacked & 0x80 else 0
            pos += 10 + 3 * lct_size + 1  # descriptor + local table + LZW min code size
            pos = skip_subblocks(pos)
        else:
            raise ValueError(f"unknown GIF block marker 0x{marker:02x} at {pos}")
    return {
        "version": version,
        "width": w,
        "height": h,
        "global_palette_size": gct_size,
        "n_frames": frames,
        "animation_seconds": delay_cs / 100.0,
    }


def parse_webp_meta(content: bytes) -> dict:
    """Dependency-free WebP metadata: RIFF container, then the first
    VP8 (lossy key-frame header), VP8L (lossless signature word), or VP8X
    (extended canvas) chunk → ``{width, height, format, has_alpha,
    is_animated}``. Pixel decode needs libwebp and raises through
    :func:`default_decoder` like the other compressed formats."""
    content = bytes(content)
    if content[:4] != b"RIFF" or content[8:12] != b"WEBP":
        raise ValueError("not a WebP payload (missing RIFF/WEBP magic)")
    pos = 12
    while pos + 8 <= len(content):
        fourcc = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        body = content[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8 " and len(body) >= 10:
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("VP8 chunk missing key-frame start code")
            w = int.from_bytes(body[6:8], "little") & 0x3FFF
            h = int.from_bytes(body[8:10], "little") & 0x3FFF
            return {
                "width": w, "height": h, "format": "VP8",
                "has_alpha": False, "is_animated": False,
            }
        if fourcc == b"VP8L" and len(body) >= 5:
            if body[0] != 0x2F:
                raise ValueError("VP8L chunk missing signature byte")
            bits = int.from_bytes(body[1:5], "little")
            return {
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
                "format": "VP8L",
                "has_alpha": bool((bits >> 28) & 1),
                "is_animated": False,
            }
        if fourcc == b"VP8X" and len(body) >= 10:
            flags = body[0]
            return {
                "width": int.from_bytes(body[4:7], "little") + 1,
                "height": int.from_bytes(body[7:10], "little") + 1,
                "format": "VP8X",
                "has_alpha": bool(flags & 0x10),
                "is_animated": bool(flags & 0x02),
            }
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    raise ValueError("WebP container has no VP8/VP8L/VP8X chunk")


def encode_webp_headers(
    width: int,
    height: int,
    fmt: str = "VP8L",
    has_alpha: bool = False,
    is_animated: bool = False,
) -> bytes:
    """Header-only WebP fixture writer (zero payload bits — the metadata
    walk never reads them), the :func:`encode_mp3_headers` convention."""
    if fmt == "VP8":
        body = b"\x00\x00\x00" + b"\x9d\x01\x2a"
        body += (width & 0x3FFF).to_bytes(2, "little")
        body += (height & 0x3FFF).to_bytes(2, "little")
        fourcc = b"VP8 "
    elif fmt == "VP8L":
        bits = (width - 1) | ((height - 1) << 14) | (int(has_alpha) << 28)
        body = b"\x2f" + bits.to_bytes(4, "little")
        fourcc = b"VP8L"
    elif fmt == "VP8X":
        flags = (0x10 if has_alpha else 0) | (0x02 if is_animated else 0)
        body = bytes([flags, 0, 0, 0])
        body += (width - 1).to_bytes(3, "little")
        body += (height - 1).to_bytes(3, "little")
        fourcc = b"VP8X"
    else:
        raise ValueError(f"unknown WebP chunk kind {fmt!r}")
    chunk = fourcc + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def parse_tiff_meta(content: bytes) -> dict:
    """Dependency-free TIFF metadata: endianness magic, IFD chain walk →
    first page's ``{width, height}``, ``n_pages``, ``compression`` code,
    and ``endian``. Strip decode needs a codec matrix and raises through
    :func:`default_decoder`. Inline values only read SHORT/LONG types —
    exactly what the baseline tags use."""
    content = bytes(content)
    if content[:4] == b"II\x2a\x00":
        bo = "little"
    elif content[:4] == b"MM\x00\x2a":
        bo = "big"
    else:
        raise ValueError("not a TIFF payload (missing II*/MM* magic)")

    def u(b: bytes) -> int:
        return int.from_bytes(b, bo)

    off = u(content[4:8])
    width = height = None
    compression = 1
    n_pages = 0
    seen = set()
    while off and off + 2 <= len(content) and off not in seen:
        seen.add(off)  # cycle guard: corrupt files can self-link
        n = u(content[off : off + 2])
        n_pages += 1
        for i in range(n):
            e = off + 2 + 12 * i
            if e + 12 > len(content):
                break
            tag = u(content[e : e + 2])
            typ = u(content[e + 2 : e + 4])
            if tag in (256, 257, 259) and typ in (3, 4):
                # SHORT values sit left-justified in the 4-byte slot
                # (first two bytes under EITHER endianness, per TIFF 6.0)
                val = u(content[e + 8 : (e + 10 if typ == 3 else e + 12)])
                if n_pages == 1:
                    if tag == 256:
                        width = val
                    elif tag == 257:
                        height = val
                    else:
                        compression = val
        next_off_at = off + 2 + 12 * n
        if next_off_at + 4 > len(content):
            break
        off = u(content[next_off_at : next_off_at + 4])
    if width is None or height is None:
        raise ValueError("TIFF IFD carries no ImageWidth/ImageLength")
    return {
        "width": width,
        "height": height,
        "n_pages": n_pages,
        "compression": compression,
        "endian": bo,
    }


def encode_tiff_headers(
    pages: list[tuple[int, int]], endian: str = "little", compression: int = 1
) -> bytes:
    """Header-only TIFF fixture writer: one IFD per (width, height) page,
    SHORT-typed baseline tags, chained next-IFD offsets."""
    bo = endian
    magic = b"II\x2a\x00" if bo == "little" else b"MM\x00\x2a"

    def u(v: int, n: int) -> bytes:
        return int(v).to_bytes(n, bo)

    def entry(tag: int, val: int) -> bytes:
        # type 3 (SHORT), count 1, value left-justified in the 4-byte slot
        return u(tag, 2) + u(3, 2) + u(1, 4) + u(val, 2) + u(0, 2)

    out = bytearray(magic + u(8, 4))
    pos = 8
    for i, (w, h) in enumerate(pages):
        entries = entry(256, w) + entry(257, h) + entry(259, compression)
        ifd = u(3, 2) + entries
        next_off = pos + 2 + len(entries) + 4 if i + 1 < len(pages) else 0
        ifd += u(next_off, 4)
        out += ifd
        pos += len(ifd)
    return bytes(out)


def parse_flac_meta(content: bytes) -> dict:
    """Dependency-free FLAC metadata: the mandatory STREAMINFO block →
    ``{sample_rate, channels, bits_per_sample, total_samples,
    duration_seconds}`` (duration is EXACT — total samples is in the
    header, unlike MP3's bitrate estimate). Frame decode needs a FLAC
    codec and raises through :func:`default_decoder`."""
    content = bytes(content)
    if content[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (missing fLaC magic)")
    if len(content) < 8 or (content[4] & 0x7F) != 0:
        raise ValueError("FLAC stream does not start with STREAMINFO")
    b = content[8:42]
    if len(b) < 18:
        raise ValueError("FLAC STREAMINFO truncated")
    sample_rate = (b[10] << 12) | (b[11] << 4) | (b[12] >> 4)
    channels = ((b[12] >> 1) & 0x7) + 1
    bits = (((b[12] & 0x1) << 4) | (b[13] >> 4)) + 1
    total = ((b[13] & 0x0F) << 32) | int.from_bytes(b[14:18], "big")
    return {
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bits,
        "total_samples": total,
        "duration_seconds": (total / sample_rate) if sample_rate else 0.0,
    }


def encode_flac_headers(
    sample_rate: int, channels: int, bits_per_sample: int, total_samples: int
) -> bytes:
    """Header-only FLAC fixture writer: magic + one last-flagged
    STREAMINFO block (frame sizes/md5 zeroed — the walk never reads
    them)."""
    b = bytearray(34)
    b[10] = (sample_rate >> 12) & 0xFF
    b[11] = (sample_rate >> 4) & 0xFF
    b[12] = ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | (
        (bits_per_sample - 1) >> 4
    )
    b[13] = (((bits_per_sample - 1) & 0xF) << 4) | ((total_samples >> 32) & 0xF)
    b[14:18] = (total_samples & 0xFFFFFFFF).to_bytes(4, "big")
    return b"fLaC" + bytes([0x80, 0, 0, 34]) + bytes(b)


# ---------------------------------------------------------------------------
# Perceptual image hashing (dHash) + image near-duplicate pairs.
# ---------------------------------------------------------------------------

def gray_luma(rgb):
    """Integer ITU-R 601 luma of an (H, W, 3) uint8 array: exact int64 math
    ((299 R + 587 G + 114 B) // 1000) — deterministic everywhere, no float
    rounding in the hash path."""
    import numpy as np

    arr = rgb.astype(np.int64)
    return (299 * arr[..., 0] + 587 * arr[..., 1] + 114 * arr[..., 2]) // 1000


def dhash64(rgb) -> int:
    """64-bit difference hash (dHash): nearest-neighbor resize to 9x8,
    integer luma, bit (row*8 + col) set iff luma[row][col] < luma[row][col+1].

    Gradient-based, so GLOBALLY brightness-invariant (adding a constant to
    every pixel leaves every comparison unchanged) and robust to small edits:
    near-duplicate images land within a few Hamming bits. Integer-only,
    deterministic across platforms."""
    g = gray_luma(resize_image(rgb, 8, 9))
    bits = (g[:, :-1] < g[:, 1:]).ravel()
    h = 0
    for i, b in enumerate(bits):
        if b:
            h |= 1 << i
    # numpy bool -> Python int; keep within signed int64 for Spark LongType
    return h - (1 << 64) if h >= (1 << 63) else h


def image_dhash(media: DataFrame) -> DataFrame:
    """Per-image perceptual hash over the media table: decode (built-in
    BMP/PPM/PNG codecs), dHash, emit (media_id, dhash long). Non-image rows
    (audio/text/unknown) are dropped — run it over a mixed-modality table.

    Arrow-batched ``mapInPandas``, partition-preserving, nothing collects to
    the driver; the decode+hash is per-row Python by necessity (codec work),
    amortized per batch."""
    _ship_codecs_by_value()

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for media_id, content in zip(pdf["media_id"], pdf["content"]):
                try:
                    rgb = _decode_image(bytes(content))
                except _DECODE_ERRORS:
                    rgb = None  # corrupt/unsupported image: drop the row
                if rgb is not None:
                    ids.append(media_id)
                    hashes.append(dhash64(rgb))
            yield pd.DataFrame({"media_id": ids, "dhash": hashes}).astype(
                {"media_id": "int64", "dhash": "int64"}
            )

    return media.mapInPandas(run, out_schema)


def image_near_dup_pairs(media: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Image near-duplicate pairs: dHash fingerprints, then the pigeonhole
    band-join + exact Hamming verify shared with SimHash
    (:func:`data_etl_with_dbt_spark.operators.dedup.hamming_near_pairs`) —
    one decode pass, candidate work ∝ bucket co-occurrence, never all-pairs.
    The image twin of text MinHash/SimHash dedup."""
    from data_etl_with_dbt_spark.operators.dedup import hamming_near_pairs

    fps = image_dhash(media)
    return hamming_near_pairs(fps, "media_id", "dhash", bits=64, max_hamming=max_hamming)


def audio_spectral_features(samples, sample_rate: int) -> list[float]:
    """Spectral audio stats over the channel-mean signal via numpy rFFT:
    [dominant_freq_hz, spectral_centroid_hz, spectral_rolloff85_hz].
    Deterministic per platform (FFT butterflies are fixed-order); tests
    assert the dominant bin of synthesized sines, not bit patterns."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    n = arr.shape[0]
    if n < 2:
        return [0.0, 0.0, 0.0]
    mono = arr.mean(axis=1)
    mag = np.abs(np.fft.rfft(mono))
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    mag[0] = 0.0  # ignore DC for the dominant bin
    total = mag.sum()
    if total == 0.0:
        return [0.0, 0.0, 0.0]
    dominant = float(freqs[int(mag.argmax())])
    centroid = float((freqs * mag).sum() / total)
    cum = np.cumsum(mag)
    rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    return [dominant, centroid, rolloff]


def synth_image_media(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    group_mod: int = 40,
    size: int = 16,
) -> DataFrame:
    """Deterministic synthetic image corpus with KNOWN near-duplicate ground
    truth: every row whose id shares ``id % group_mod`` gets the same seeded
    base image (``size x size`` RGB from a seed-pinned RNG), perturbed by one
    small single-pixel edit scaled by ``id // group_mod`` — so same-group
    images are near-duplicates by construction and cross-group images are
    independent noise. The fixtures carry no image bytes and the container
    has no codec libraries, so pipeline entries/tests generate images with
    the SAME BMP encoder the decode path reads. Arrow-batched mapInPandas;
    emits the standard media shape."""
    _ship_codecs_by_value()

    def render(i: int) -> bytes:
        import numpy as np

        base = int(i) % group_mod
        variant = int(i) // group_mod
        rng = np.random.RandomState(1234 + base)
        img = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
        if variant:
            r, c = variant % size, (7 * variant) % size
            img[r, c, 1] = np.uint8(min(255, int(img[r, c, 1]) + 2))
        return encode_bmp(img)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "content": payloads,
                    "meta": [
                        {"mime": "image/bmp", "n_bytes": len(p), "source": s}
                        for p, s in zip(payloads, pdf[source_col])
                    ],
                }
            )

    return df.select(id_col, source_col).mapInPandas(run, MEDIA_SCHEMA)


def synth_audio_media(
    df: DataFrame,
    id_col: str = "doc_id",
    source_col: str = "source",
    sample_rate: int = 8000,
    n_samples: int = 2000,
) -> DataFrame:
    """Deterministic synthetic audio corpus with KNOWN spectral ground
    truth: each row gets a pure 16-bit PCM sine at
    ``200 + (id % 20) * 100`` Hz (all below the 4 kHz Nyquist), encoded
    with the SAME WAV writer the decode path reads. The audio twin of
    :func:`synth_image_media` — fixtures carry no audio bytes, so entries
    and tests generate payloads whose dominant frequency is known by
    construction. Arrow-batched mapInPandas; emits the standard media
    shape."""
    _ship_codecs_by_value()

    def render(i: int) -> bytes:
        import numpy as np

        freq = 200.0 + (int(i) % 20) * 100.0
        t = np.arange(n_samples, dtype=np.float64)
        samples = np.rint(
            np.sin(2.0 * np.pi * freq * t / sample_rate) * 20000.0
        ).astype(np.int64)
        return encode_wav(samples, sample_rate)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [render(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "content": payloads,
                    "meta": [
                        {"mime": "audio/wav", "n_bytes": len(p), "source": s}
                        for p, s in zip(payloads, pdf[source_col])
                    ],
                }
            )

    return df.select(id_col, source_col).mapInPandas(run, MEDIA_SCHEMA)


def synth_video_media(
    df: DataFrame,
    id_col: str = "doc_id",
    size: int = 32,
    fps: float = 10.0,
) -> DataFrame:
    """Deterministic synthetic VIDEO corpus with KNOWN frame-count ground
    truth — the video twin of :func:`synth_image_media` (fixtures carry no
    video bytes, so entries/tests generate payloads with the SAME encoders
    the decode path reads): each id renders ``8 + (id % 5) * 4`` frames
    (8..24) with a seeded base and a per-frame moving marker; EVEN ids
    become MJPEG AVIs (noise base — JPEG handles full color), ODD ids
    animated GIFs (a 5-color palette base — GIF fixtures cap at 256
    colors). Frame counts and indices are residue-derivable, which is what
    makes :func:`sample_media_frames` over this corpus oracle-checkable.
    Arrow-batched mapInPandas; emits the standard media shape."""
    _ship_codecs_by_value()

    def render(i: int) -> tuple[bytes, str]:
        import numpy as np

        n_frames = 8 + (int(i) % 5) * 4
        if int(i) % 2 == 0:
            rng = np.random.RandomState(77 + int(i) % 11)
            base = rng.randint(0, 256, (size, size, 3)).astype(np.uint8)
            frames = []
            for f in range(n_frames):
                img = base.copy()
                img[f % size, (3 * f) % size] = (255, 0, 0)
                frames.append(img)
            return encode_avi_mjpeg(frames, fps=fps), "video/avi"
        pal = np.array(
            [(0, 0, 0), (80, 80, 80), (160, 160, 160), (240, 240, 240)],
            np.uint8,
        )
        rr, cc = np.meshgrid(range(size), range(size), indexing="ij")
        base = pal[((rr + cc) + int(i)) % 4]
        frames = []
        for f in range(n_frames):
            img = base.copy()
            img[f % size, (3 * f) % size] = (255, 0, 0)
            frames.append(img)
        return encode_gif(frames, delays_cs=[10] * n_frames), "image/gif"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rendered = [render(i) for i in pdf[id_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "content": [p for p, _ in rendered],
                    "meta": [
                        {"mime": m, "n_bytes": len(p), "source": "synth"}
                        for p, m in rendered
                    ],
                }
            )

    return df.select(id_col).mapInPandas(run, MEDIA_SCHEMA)


def spectral_decoder(content: bytes, mime: str) -> list[float]:
    """Media decoder emitting SPECTRAL features for audio payloads:
    [dominant_freq_hz, spectral_centroid_hz, spectral_rolloff85_hz] via
    :func:`audio_spectral_features`; non-audio payloads yield an empty
    feature vector. Plug into :func:`extract_media_features` for the
    distributed frequency-domain pass."""
    # RIFF alone also matches AVI/WebP containers: require the WAVE form
    # type before handing bytes to the WAV decoder
    is_wav = len(content) >= 12 and content[:4] == b"RIFF" and content[8:12] == b"WAVE"
    if mime == "audio/wav" or is_wav:
        try:
            samples, rate = decode_wav(bytes(content))
        except _DECODE_ERRORS:
            return []  # mislabeled mime or torn payload: triage, not fail
        return audio_spectral_features(samples, rate)
    return []
