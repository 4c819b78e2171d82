"""Dependency-free baseline JPEG codec (stdlib + numpy).

Closes the most common image format in web-scraped training corpora
without PIL/libjpeg (absent from this container): ``decode_jpeg`` handles
baseline/extended-sequential DCT JPEGs (SOF0/SOF1) — 8-bit, grayscale or
YCbCr with any H/V chroma subsampling (4:4:4, 4:2:2, 4:2:0, ...), restart
markers, byte stuffing — returning an (H, W, 3) or (H, W, 1) uint8 array.
``encode_jpeg`` produces baseline 4:4:4 (or grayscale) JPEGs with the
Annex-K tables IJG-quality-scaled — deterministic fixtures for tests and
synthetic media, exactly like ``encode_png``/``encode_bmp``.

Progressive (SOF2), hierarchical, arithmetic-coded, and 12-bit JPEGs
raise ``NotImplementedError`` — a real deployment injects a codec library
for those; the point here is that the COMMON case decodes with zero
dependencies inside the same Arrow-batched ``mapInPandas`` plumbing as
the other codecs (see operators/multimodal.py).

Scale note: entropy decode is sequential per image by construction (DC
prediction + huffman), so the parallel unit is the IMAGE — the media
table partitions by media_id and each Arrow batch decodes independently;
the 8x8 IDCT is a vectorized einsum over all blocks of an image at once.

Reference semantics derived from the public JPEG spec (ITU-T T.81) —
no reference-repo counterpart exists (SURVEY.md §2 multimodal extension).
"""

from __future__ import annotations

# --- zigzag order (T.81 figure 5) -----------------------------------------
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# --- Annex K quantization tables (luma K.1, chroma K.2), natural order via
# zigzag applied at use sites; stored here in ZIGZAG order as in the spec.
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# --- Annex K huffman specs: (bits[1..16], symbols) ------------------------
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix: forward = C @ X @ C.T, inverse =
    C.T @ X @ C (exactly inverse pairs, so codec tests close)."""
    import math

    import numpy as np

    c = np.zeros((8, 8))
    for k in range(8):
        scale = math.sqrt(0.125) if k == 0 else 0.5
        for n in range(8):
            c[k, n] = scale * math.cos(math.pi * (2 * n + 1) * k / 16.0)
    return c


def _build_decode_table(bits, vals):
    """Canonical huffman decode dict: (length, code) -> symbol."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return table


def _build_encode_table(bits, vals):
    """Canonical huffman encode dict: symbol -> (code, length)."""
    table, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 unstuffing;
    RST markers are consumed by the caller (byte-aligned by spec)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.buf <<= 8  # pad with zeros at EOS
                self.nbits += 8
                continue
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7 or nxt == 0xD9:
                    # marker: stop feeding real bits, caller handles it
                    self.buf <<= 8
                    self.nbits += 8
                    continue
                else:
                    self.pos += 2  # tolerate stray fill bytes 0xFF 0xFF
                    continue
            else:
                self.pos += 1
            self.buf = (self.buf << 8) | byte
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.buf >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG huffman code")

    def align_and_sync_rst(self):
        """Byte-align and consume an RSTn marker at a restart boundary."""
        self.buf, self.nbits = 0, 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("expected JPEG RST marker")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def decode_jpeg(content: bytes):
    """Decode a baseline/extended-sequential JPEG to (H, W, C) uint8
    (C=3 RGB for YCbCr/3-component images, C=1 for grayscale)."""
    import numpy as np

    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1  # tolerate padding between segments
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        size = int.from_bytes(data[pos : pos + 2], "big")
        body = data[pos + 2 : pos + size]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit JPEG quant tables")
                qtables[tq] = list(body[i + 1 : i + 65])
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                htables[(tc, th)] = _build_decode_table(bits, vals)
                i += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 extended seq
            precision = body[0]
            if precision != 8:
                raise NotImplementedError(f"{precision}-bit JPEG")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c], body[7 + 3 * c], body[8 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}: progressive/"
                "hierarchical/arithmetic) — inject a codec library"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(
                np, data, pos + size, frame, scan, qtables, htables,
                restart_interval,
            )
        pos += size
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(np, data, pos, frame, scan, qtables, htables, dri):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient block stores (natural order after zigzag)
    planes = {}
    for comp, _, _ in scan:
        planes[comp["id"]] = np.zeros(
            (mcuy * comp["v"] * 8, mcux * comp["h"] * 8), np.float64
        )
    blocks = {comp["id"]: [] for comp, _, _ in scan}  # (by, bx, coef64)
    reader = _BitReader(data, pos)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    inv_zig = ZIGZAG  # coef index k (zigzag) -> natural position
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and n_mcu and n_mcu % dri == 0:
                reader.align_and_sync_rst()
                pred = {cid: 0 for cid in pred}
            n_mcu += 1
            for comp, td, ta in scan:
                dc_tab = htables[(0, td)]
                ac_tab = htables[(1, ta)]
                q = qtables[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        coef = np.zeros(64, np.float64)
                        s = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[comp["id"]] += diff
                        coef[0] = pred[comp["id"]] * q[0]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overrun")
                            coef[inv_zig[k]] = (
                                _extend(reader.read_bits(size), size) * q[k]
                            )
                            k += 1
                        blocks[comp["id"]].append(
                            (my * comp["v"] + by, mx * comp["h"] + bx, coef)
                        )
    # vectorized IDCT over every block of each component at once
    C = _dct_matrix()
    for comp, _, _ in scan:
        cid = comp["id"]
        if not blocks[cid]:
            continue
        coefs = np.stack([b[2] for b in blocks[cid]]).reshape(-1, 8, 8)
        pix = np.einsum("ij,njk,kl->nil", C.T, coefs, C) + 128.0
        pix = np.clip(np.round(pix), 0, 255)
        plane = planes[cid]
        for (by, bx, _), block in zip(blocks[cid], pix):
            plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block
    # upsample to full resolution and crop
    out = []
    for comp, _, _ in scan:
        plane = planes[comp["id"]]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return out[0].astype(np.uint8)[:, :, None]
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int):
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _scale_quant(base, quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * scale + 50) // 100)) for q in base]


def encode_jpeg(img, quality: int = 85, restart_interval: int = 0) -> bytes:
    """Encode (H, W[, C]) uint8 (C in {1, 3}) as a baseline JPEG — 4:4:4
    YCbCr for color, single-component for grayscale, Annex-K huffman
    tables, IJG quality scaling. Deterministic fixture generator and the
    inverse half of the codec round-trip tests.

    ``restart_interval`` > 0 emits a DRI segment and an RSTn marker every
    N MCUs (DC predictors reset, bitstream byte-aligned) — how real
    encoders bound error propagation; here it exists chiefly so the
    DECODER's restart path is exercised by round-trip tests rather than
    only by whatever system sample files happen to use DRI."""
    import numpy as np

    arr = np.asarray(img, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c == 3:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        comps = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    elif c == 1:
        comps = [arr[..., 0]]
    else:
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    C = _dct_matrix()
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    writer = _BitWriter()
    pred = [0] * len(comps)
    # natural-position -> zigzag-index lookup
    zig_of_nat = [0] * 64
    for zi, nat in enumerate(ZIGZAG):
        zig_of_nat[nat] = zi
    planes = []
    for plane in comps:
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = plane[-1:, :]  # edge replicate
        padded[:, w:] = padded[:, w - 1 : w]
        planes.append(padded)
    qt = [qluma] + [qchroma] * (len(comps) - 1)
    n_mcu = 0
    rst = 0
    for by in range(ph // 8):
        for bx in range(pw // 8):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, plane in enumerate(planes):
                tsel = 0 if ci == 0 else 1
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = C @ block @ C.T
                zz = np.zeros(64, np.int64)
                q = qt[ci]
                flat = coef.reshape(64)
                for nat in range(64):
                    zi = zig_of_nat[nat]
                    zz[zi] = int(np.round(flat[nat] / q[zi]))
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                s = int(diff).bit_length() if diff else 0
                code, length = enc_dc[tsel][s]
                writer.write(code, length)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    writer.write(v, s)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, length = enc_ac[tsel][0xF0]
                        writer.write(code, length)
                        run -= 16
                    s = abs(v).bit_length()
                    code, length = enc_ac[tsel][(run << 4) | s]
                    writer.write(code, length)
                    writer.write(v if v > 0 else v + (1 << s) - 1, s)
                    run = 0
                if run:
                    code, length = enc_ac[tsel][0x00]
                    writer.write(code, length)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dht(tc, th, bits, vals) -> bytes:
        return bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)

    ncomp = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, 0x11, tq])
        sos += bytes([ci + 1, (0 if ci == 0 else 1) * 0x11])
    sos += bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qluma))
    if ncomp > 1:
        out += seg(0xDB, bytes([1]) + bytes(qchroma))
    out += seg(0xC0, sof)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    out += seg(0xC4, dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS))
    out += seg(0xC4, dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS))
    if ncomp > 1:
        out += seg(0xC4, dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS))
        out += seg(0xC4, dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS))
    out += seg(0xDA, sos)
    out += bytes(writer.out)
    out += b"\xff\xd9"
    return out
