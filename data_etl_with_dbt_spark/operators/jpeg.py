"""Dependency-free baseline JPEG codec (stdlib + numpy).

Closes the most common image format in web-scraped training corpora
without PIL/libjpeg (absent from this container): ``decode_jpeg`` handles
baseline/extended-sequential DCT JPEGs (SOF0/SOF1) AND progressive (SOF2 —
spectral selection, successive approximation, DC/AC refinement scans, EOB
runs) — 8-bit, grayscale or YCbCr with any H/V chroma subsampling (4:4:4,
4:2:2, 4:2:0, ...), restart markers, byte stuffing — returning an
(H, W, 3) or (H, W, 1) uint8 array. ``encode_jpeg`` produces baseline
4:4:4 (or grayscale) JPEGs with the Annex-K tables IJG-quality-scaled —
deterministic fixtures for tests and synthetic media, exactly like
``encode_png``/``encode_bmp`` — and there is a progressive encoder for
round-trip tests of the SOF2 path.

Only hierarchical, arithmetic-coded, lossless, and 12-bit JPEGs raise
``NotImplementedError`` — a real deployment injects a codec library for
those; the point here is that the COMMON cases decode with zero
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


#: full-prefix LUT cache keyed by the huffman spec — the Annex-K tables
#: repeat across every image of a corpus, so the one-time 65536-slot build
#: amortizes to zero (a per-image build would dominate small thumbnails)
_LUT16_CACHE: dict = {}


def _build_decode_table(bits, vals):
    """Canonical huffman decode dict: (length, code) -> symbol, plus a FULL
    16-bit prefix LUT under ``"__lut16__"`` — every code, whatever its
    length, resolves with ONE table index (the decoder's hot path; the
    old 8-bit LUT left long AC codes, the majority in high-entropy
    images, on a per-bit tree walk). Slots no code covers stay None and
    raise as invalid. Slice-assignment fills spans C-side, so the build
    is ~len(vals) list ops, cached per spec across images."""
    key = (tuple(bits), tuple(vals))
    cached = _LUT16_CACHE.get(key)
    table, code, i = {}, 0, 0
    lut = [None] * 65536 if cached is None else None
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[i]
            if lut is not None:
                base = code << (16 - length)
                span = 1 << (16 - length)
                lut[base : base + span] = [(vals[i], length)] * span
            code += 1
            i += 1
        code <<= 1
    if lut is None:
        lut = cached
    else:
        _LUT16_CACHE[key] = lut
    table["__lut16__"] = lut
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
        # Drop already-consumed high bits BEFORE growing buf: every read
        # masks to the live low ``nbits``, so truncation is free — without
        # it buf accumulates the whole entropy stream as one ever-growing
        # int and each shift is O(stream size) (quadratic total).
        self.buf &= (1 << self.nbits) - 1
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
                elif nxt == 0xFF:
                    self.pos += 1  # fill byte before a marker
                    continue
                else:
                    # ANY marker (RSTn, EOI, the next SOS/DHT/...) ends this
                    # scan's entropy data: stop feeding real bits, leave pos
                    # parked at the 0xFF for the caller to handle
                    self.buf <<= 8
                    self.nbits += 8
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
        if n == 0:
            return 0
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def decode_symbol(self, table) -> int:
        if self.nbits < 16:
            self._fill()
        hit = table["__lut16__"][(self.buf >> (self.nbits - 16)) & 0xFFFF]
        if hit is None:
            raise ValueError("invalid JPEG huffman code")
        self.nbits -= hit[1]
        return hit[0]

    def receive_extend(self, s: int) -> int:
        """Read an s-bit magnitude and EXTEND it (T.81 F.2.2.1) in one
        call — fuses the decoder's two per-coefficient bit reads."""
        if s == 0:
            return 0
        while self.nbits < s:
            self._fill()
        self.nbits -= s
        v = (self.buf >> self.nbits) & ((1 << s) - 1)
        return v - (1 << s) + 1 if v < (1 << (s - 1)) else v

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


def decode_jpeg(content: bytes):
    """Decode a JPEG to (H, W, C) uint8 (C=3 RGB for YCbCr/3-component
    images, C=1 for grayscale). Handles baseline (SOF0), extended
    sequential (SOF1), and PROGRESSIVE (SOF2) — spectral selection,
    successive approximation (DC and AC refinement scans, EOB runs),
    restart markers. Arithmetic-coded / hierarchical / lossless / 12-bit
    variants still raise.

    Mechanics: every scan decodes into a per-component COEFFICIENT store
    (zigzag order, int64) — baseline is simply the one-scan special case —
    and dequantize + IDCT + upsample + color-convert run once at the end,
    fully vectorized over all blocks. Memory is one int64 per coefficient
    (8 bytes/pixel/component) while decoding; the parallel unit at scale
    is the IMAGE (Arrow batches over mapInPandas), never pixels."""
    import numpy as np

    data = bytes(content)
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    store: dict[int, object] = {}
    saw_scan = False
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
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
            frame = {
                "h": h, "w": w, "comps": comps,
                "progressive": marker == 0xC2,
            }
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = -(-w // (8 * hmax))
            mcuy = -(-h // (8 * vmax))
            frame["hmax"], frame["vmax"] = hmax, vmax
            frame["mcux"], frame["mcuy"] = mcux, mcuy
            for c in comps:
                store[c["id"]] = np.zeros(
                    (mcuy * c["v"], mcux * c["h"], 64), np.int64
                )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"unsupported JPEG coding process (SOF marker 0xFF{marker:02X}:"
                " lossless/hierarchical/arithmetic) — inject a codec library"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not htables:
                # MJPEG (AVI/MOV video frames) legitimately omits DHT —
                # the standard says decoders assume the Annex-K tables
                for tc, th, bits, vals in (
                    (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
                    (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
                    (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                    (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
                ):
                    htables[(tc, th)] = _build_decode_table(bits, vals)
            ns = body[0]
            scan = []
            for c in range(ns):
                cid, tt = body[1 + 2 * c], body[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cid)
                scan.append((comp, tt >> 4, tt & 0x0F))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0x0F
            if not frame["progressive"]:
                ss, se, ah, al = 0, 63, 0, 0
            pos = _decode_entropy_scan(
                data, pos + size, frame, scan, ss, se, ah, al,
                restart_interval, htables, store,
            )
            saw_scan = True
            continue
        pos += size
    if not saw_scan:
        raise ValueError("JPEG has no SOS scan")
    return _finish(np, frame, store, qtables)


def _decode_entropy_scan(data, start, frame, scan, ss, se, ah, al, dri,
                         htables, store):
    """Decode one scan\'s entropy-coded data into the coefficient store and
    return the stream position after it. T.81 F.2.2 (sequential = the
    ss=0..63/ah=al=0 case) and G.2 (progressive: DC first/refine, AC
    first/refine with EOB runs). Returns ``reader.pos`` parked at the next
    marker so the caller\'s segment parser resumes."""
    reader = _BitReader(data, start)
    interleaved = len(scan) > 1
    if interleaved and ss != 0:
        raise ValueError("progressive AC scan must be non-interleaved")
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    eobrun = 0
    lo = max(ss, 1)

    def decode_block(coef, dc_tab, ac_tab, cid):
        nonlocal eobrun
        if ss == 0:
            if ah == 0:
                s = reader.decode_symbol(dc_tab)
                diff = reader.receive_extend(s)
                pred[cid] += diff
                coef[0] = pred[cid] << al
            elif reader.read_bit():
                coef[0] |= 1 << al
        if se < lo:
            return
        if ah == 0:  # AC first pass (baseline AC is the al=0 case)
            if eobrun > 0:
                eobrun -= 1
                return
            k = lo
            while k <= se:
                rs = reader.decode_symbol(ac_tab)
                r, s = rs >> 4, rs & 0x0F
                if s == 0:
                    if r == 15:
                        k += 16
                        continue
                    eobrun = (1 << r) - 1
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                k += r
                if k > se:
                    raise ValueError("JPEG AC index overrun")
                coef[k] = reader.receive_extend(s) << al
                k += 1
        else:  # AC refinement (G.2.2): correction bits + new +-1<<al coefs
            p1, m1 = 1 << al, -1 << al
            k = lo
            if eobrun == 0:
                while k <= se:
                    rs = reader.decode_symbol(ac_tab)
                    r, s = rs >> 4, rs & 0x0F
                    val = 0
                    if s == 0:
                        if r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # r == 15: run over 16 zero-history coefficients
                    else:
                        val = p1 if reader.read_bit() else m1
                    while k <= se:
                        c = int(coef[k])
                        if c != 0:
                            if reader.read_bit() and (c & p1) == 0:
                                coef[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if s and k <= se:
                        coef[k] = val
                    k += 1
            if eobrun > 0:
                while k <= se:
                    c = int(coef[k])
                    if c != 0:
                        if reader.read_bit() and (c & p1) == 0:
                            coef[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1

    if interleaved:
        units = frame["mcuy"] * frame["mcux"]
    else:
        comp = scan[0][0]
        cw = -(-(frame["w"] * comp["h"]) // frame["hmax"])
        ch = -(-(frame["h"] * comp["v"]) // frame["vmax"])
        bw, bh = -(-cw // 8), -(-ch // 8)
        units = bw * bh
    n_unit = 0
    for u in range(units):
        if dri and n_unit and n_unit % dri == 0:
            reader.align_and_sync_rst()
            for cid in pred:
                pred[cid] = 0
            eobrun = 0
        n_unit += 1
        if interleaved:
            my, mx = divmod(u, frame["mcux"])
            for comp, td, ta in scan:
                dc_tab = htables.get((0, td))
                ac_tab = htables.get((1, ta))
                arr = store[comp["id"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        decode_block(
                            arr[my * comp["v"] + by, mx * comp["h"] + bx],
                            dc_tab, ac_tab, comp["id"],
                        )
        else:
            comp, td, ta = scan[0]
            by, bx = divmod(u, bw)
            decode_block(
                store[comp["id"]][by, bx],
                htables.get((0, td)), htables.get((1, ta)), comp["id"],
            )
    return reader.pos


def _finish(np, frame, store, qtables):
    """Dequantize + IDCT + assemble + upsample + color-convert, vectorized
    over every block of every component at once."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    C = _dct_matrix()
    zig = np.array(ZIGZAG)
    out = []
    for comp in frame["comps"]:
        arr = store[comp["id"]]  # (bh, bw, 64) zigzag-order coefficients
        bh, bw = arr.shape[:2]
        q = np.array(qtables[comp["tq"]], np.int64)
        nat = np.zeros((bh, bw, 64), np.float64)
        nat[..., zig] = arr * q
        blocks = nat.reshape(bh, bw, 8, 8)
        pix = np.einsum("ij,xyjk,kl->xyil", C.T, blocks, C) + 128.0
        plane = np.clip(np.round(pix), 0, 255).transpose(0, 2, 1, 3).reshape(
            bh * 8, bw * 8
        )
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
        # keep only the undrained low bits — otherwise acc grows with the
        # whole stream and each shift above is O(stream size)
        self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec


def _scale_quant(base, quality: int):
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [min(255, max(1, (q * scale + 50) // 100)) for q in base]


def _uniform_huff_spec(symbols):
    """A canonical huffman spec with every symbol at 8 bits — wasteful on
    compression (irrelevant for fixtures) but lets the progressive encoder
    emit EOB-run symbols (0x10..0xE0) that the Annex-K tables lack."""
    assert len(symbols) < 255
    bits = [0] * 16
    bits[7] = len(symbols)
    return bits, list(symbols)


_PROG_AC_SYMBOLS = sorted(
    {0x00, 0xF0}
    | {(r << 4) | s for r in range(16) for s in range(1, 11)}
    | {r << 4 for r in range(1, 15)}  # EOB-run lengths 2..2^14
)
_PROG_DC_SYMBOLS = list(range(12))


def encode_jpeg(
    img,
    quality: int = 85,
    restart_interval: int = 0,
    progressive: bool = False,
    subsampling: str = "444",
) -> bytes:
    """Encode (H, W[, C]) uint8 (C in {1, 3}) as a JPEG — YCbCr for
    color (``subsampling`` "444" or "420"; "420" downsamples chroma 2x2
    mean and interleaves 2x2 luma blocks per MCU, the form nearly every
    web JPEG uses), single-component for grayscale, IJG quality scaling.
    Deterministic fixture generator and the inverse half of the codec
    round-trip tests.

    ``progressive=True`` emits an SOF2 stream with the full progressive
    toolbox — an interleaved DC first scan at Al=1 plus DC refinement,
    per-component spectral-selection AC bands at Al=1 plus AC refinement
    scans (EOB runs, correction bits, newly-significant coefficients per
    T.81 G.1.2) — conveying EXACTLY the same quantized coefficients as the
    sequential form, so progressive and baseline encodings of one image
    decode bit-identically (asserted in tests). Uses uniform 8-bit huffman
    tables (EOB-run symbols aren't in Annex K).

    ``restart_interval`` > 0 (sequential mode only) emits a DRI segment
    and an RSTn marker every N MCUs (DC predictors reset, bitstream
    byte-aligned) — how real encoders bound error propagation; here it
    exists chiefly so the DECODER's restart path is exercised by
    round-trip tests rather than only by whatever system sample files
    happen to use DRI."""
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
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and len(comps) == 3
    qluma = _scale_quant(QUANT_LUMA, quality)
    qchroma = _scale_quant(QUANT_CHROMA, quality)
    qt = [qluma] + [qchroma] * (len(comps) - 1)
    C = _dct_matrix()
    # MCU = 8*hmax x 8*vmax pixels: pad luma to the MCU grid; 4:2:0 chroma
    # is the 2x2 mean of the padded luma-resolution plane (alignment free)
    mcu_px = 16 if sub420 else 8
    ph, pw = -(-h // mcu_px) * mcu_px, -(-w // mcu_px) * mcu_px
    hv = [(2, 2), (1, 1), (1, 1)] if sub420 else [(1, 1)] * len(comps)
    zig = np.array(ZIGZAG)
    all_zz = []
    for ci, plane in enumerate(comps):
        padded = np.empty((ph, pw))
        padded[:h, :w] = plane
        padded[h:, :w] = padded[h - 1 : h, :w]  # edge replicate
        padded[:, w:] = padded[:, w - 1 : w]
        if sub420 and ci > 0:
            padded = padded.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        cby, cbx = padded.shape[0] // 8, padded.shape[1] // 8
        blocks = (
            padded.reshape(cby, 8, cbx, 8).transpose(0, 2, 1, 3) - 128.0
        )
        coef = np.einsum("ij,xyjk,kl->xyil", C, blocks, C.T)
        flat = coef.reshape(cby, cbx, 64)
        q = np.array(qt[ci], np.float64)
        all_zz.append(
            np.round(flat[..., zig] / q).astype(np.int64)
        )

    ncomp = len(comps)
    if progressive:
        body = _emit_progressive_scans(all_zz, hv, h, w)
        dc_spec = _uniform_huff_spec(_PROG_DC_SYMBOLS)
        ac_spec = _uniform_huff_spec(_PROG_AC_SYMBOLS)
        dhts = [(0, 0, *dc_spec), (1, 0, *ac_spec)]
        sof_marker = 0xC2
    else:
        body = [
            (None, _emit_sequential_scan(all_zz, hv, restart_interval))
        ]
        dhts = [
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        ]
        if ncomp > 1:
            dhts += [
                (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
                (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
            ]
        sof_marker = 0xC0

    def seg(marker: int, body_: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body_) + 2).to_bytes(2, "big") + body_

    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + bytes([ncomp])
    for ci in range(ncomp):
        tq = 0 if ci == 0 else 1
        sof += bytes([ci + 1, (hv[ci][0] << 4) | hv[ci][1], tq])
    out = b"\xff\xd8"
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xDB, bytes([0]) + bytes(qluma))
    if ncomp > 1:
        out += seg(0xDB, bytes([1]) + bytes(qchroma))
    out += seg(sof_marker, sof)
    for tc, th, bits, vals in dhts:
        out += seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals))
    if restart_interval and not progressive:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    for sos_params, entropy in body:
        if sos_params is None:  # sequential: one SOS over all comps
            sos = bytes([ncomp])
            for ci in range(ncomp):
                sos += bytes([ci + 1, (0 if ci == 0 else 1) * 0x11])
            sos += bytes([0, 63, 0])
        else:
            comp_ids, ss, se, ah, al = sos_params
            sos = bytes([len(comp_ids)])
            for cid in comp_ids:
                sos += bytes([cid, 0x00])  # tables 0/0 in progressive mode
            sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, sos) + entropy
    out += b"\xff\xd9"
    return out


def _emit_sequential_scan(all_zz, hv, restart_interval):
    """Baseline entropy data: MCU-interleaved DC-diff + AC run-length over
    the quantized coefficients (Hi x Vi blocks per component per MCU, so
    4:2:0 emits 2x2 luma + 1 cb + 1 cr), Annex-K tables, optional restart
    markers."""
    ncomp = len(all_zz)
    enc_dc = [_build_encode_table(DC_LUMA_BITS, DC_LUMA_VALS),
              _build_encode_table(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    enc_ac = [_build_encode_table(AC_LUMA_BITS, AC_LUMA_VALS),
              _build_encode_table(AC_CHROMA_BITS, AC_CHROMA_VALS)]
    writer = _BitWriter()
    pred = [0] * ncomp
    n_mcu = 0
    rst = 0
    mcuy = all_zz[0].shape[0] // hv[0][1]
    mcux = all_zz[0].shape[1] // hv[0][0]
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            n_mcu += 1
            for ci in range(ncomp):
                tsel = 0 if ci == 0 else 1
                hi, vi = hv[ci]
                for v_ in range(vi):
                  for u_ in range(hi):
                    zz = all_zz[ci][my * vi + v_, mx * hi + u_]
                    diff = int(zz[0]) - pred[ci]
                    pred[ci] = int(zz[0])
                    s = abs(diff).bit_length()
                    code, length = enc_dc[tsel][s]
                    writer.write(code, length)
                    if s:
                        writer.write(
                            diff if diff > 0 else diff + (1 << s) - 1, s
                        )
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
    return bytes(writer.out)


def _emit_progressive_scans(all_zz, hv, img_h, img_w):
    """Progressive scan script over the quantized coefficients: DC first
    (interleaved, Al=1) -> per-component AC bands (Al=1) -> DC refinement
    -> per-component AC refinements (Al 1->0). Returns a list of
    ((comp_ids, ss, se, ah, al), entropy_bytes) in emission order. Encoder
    halves of T.81 G.1.2.2-G.1.2.3; the AC refinement pass mirrors the
    classic libjpeg structure (pending-correction-bit buffer riding the
    EOB run)."""
    dc_tab = _build_encode_table(*_uniform_huff_spec(_PROG_DC_SYMBOLS))
    ac_tab = _build_encode_table(*_uniform_huff_spec(_PROG_AC_SYMBOLS))
    ncomp = len(all_zz)
    comp_ids = list(range(1, ncomp + 1))
    scans = []

    def emit_eobrun(state, writer):
        n = state["eobrun"]
        if n > 0:
            r = n.bit_length() - 1
            code, length = ac_tab[r << 4]
            writer.write(code, length)
            if r:
                writer.write(n - (1 << r), r)
            for bit in state["pending"]:
                writer.write(bit, 1)
            state["pending"] = []
            state["eobrun"] = 0

    mcuy = all_zz[0].shape[0] // hv[0][1]
    mcux = all_zz[0].shape[1] // hv[0][0]
    hmax = max(x for x, _ in hv)
    vmax = max(y for _, y in hv)
    # non-interleaved scans cover ceil(comp_dims/8) blocks (T.81 A.2.2) —
    # NOT the MCU-padded grid; pad blocks are coded only by interleaved
    # (DC) scans and fall outside the crop anyway
    scan_grid = [
        (
            -(-(-(-img_h * vi // vmax)) // 8),
            -(-(-(-img_w * hi // hmax)) // 8),
        )
        for hi, vi in hv
    ]

    # --- DC first scan: interleaved, point transform >> 1 ---------------
    writer = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = hv[ci]
                for v_ in range(vi):
                    for u_ in range(hi):
                        dc = int(all_zz[ci][my * vi + v_, mx * hi + u_, 0]) >> 1
                        diff = dc - pred[ci]
                        pred[ci] = dc
                        s = abs(diff).bit_length()
                        code, length = dc_tab[s]
                        writer.write(code, length)
                        if s:
                            writer.write(
                                diff if diff > 0 else diff + (1 << s) - 1, s
                            )
    writer.flush()
    scans.append(((comp_ids, 0, 0, 0, 1), bytes(writer.out)))

    # --- AC first scans: spectral bands per component at Al=1 ------------
    bands = [(1, 5), (6, 63)] if ncomp > 1 else [(1, 63)]
    ac_first = [(0, lo, hi) for lo, hi in bands]
    ac_first += [(ci, 1, 63) for ci in range(1, ncomp)]
    for ci, lo, hi in ac_first:
        writer = _BitWriter()
        state = {"eobrun": 0, "pending": []}
        cby, cbx = scan_grid[ci]
        for by in range(cby):
            for bx in range(cbx):
                zz = all_zz[ci][by, bx]
                r = 0
                for k in range(lo, hi + 1):
                    v = int(zz[k])
                    t = (abs(v) >> 1) * (1 if v >= 0 else -1)
                    if t == 0:
                        r += 1
                        continue
                    emit_eobrun(state, writer)
                    while r > 15:
                        code, length = ac_tab[0xF0]
                        writer.write(code, length)
                        r -= 16
                    s = abs(t).bit_length()
                    code, length = ac_tab[(r << 4) | s]
                    writer.write(code, length)
                    writer.write(t if t > 0 else t + (1 << s) - 1, s)
                    r = 0
                if r > 0:
                    state["eobrun"] += 1
                    if state["eobrun"] == 0x7FFF:
                        emit_eobrun(state, writer)
        emit_eobrun(state, writer)
        writer.flush()
        scans.append((([ci + 1], lo, hi, 0, 1), bytes(writer.out)))

    # --- DC refinement: emit bit 0 of every DC, same interleaved order ---
    writer = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci in range(ncomp):
                hi, vi = hv[ci]
                for v_ in range(vi):
                    for u_ in range(hi):
                        writer.write(
                            int(all_zz[ci][my * vi + v_, mx * hi + u_, 0]) & 1,
                            1,
                        )
    writer.flush()
    scans.append(((comp_ids, 0, 0, 1, 0), bytes(writer.out)))

    # --- AC refinement scans: Ah=1 -> Al=0 -------------------------------
    for ci, lo, hi in ac_first:
        writer = _BitWriter()
        state = {"eobrun": 0, "pending": []}
        cby, cbx = scan_grid[ci]
        for by in range(cby):
            for bx in range(cbx):
                zz = all_zz[ci][by, bx]
                absv = [abs(int(zz[k])) for k in range(lo, hi + 1)]
                eob = lo - 1  # last newly-significant position
                for i, a in enumerate(absv):
                    if a == 1:
                        eob = lo + i
                r = 0
                br = []
                for i, a in enumerate(absv):
                    k = lo + i
                    if a == 0:
                        r += 1
                        continue
                    while r > 15 and k <= eob:
                        emit_eobrun(state, writer)
                        code, length = ac_tab[0xF0]
                        writer.write(code, length)
                        r -= 16
                        for bit in br:
                            writer.write(bit, 1)
                        br = []
                    if a > 1:
                        br.append(a & 1)
                        continue
                    emit_eobrun(state, writer)
                    code, length = ac_tab[(r << 4) | 1]
                    writer.write(code, length)
                    writer.write(1 if int(zz[k]) > 0 else 0, 1)
                    for bit in br:
                        writer.write(bit, 1)
                    br = []
                    r = 0
                if r > 0 or br:
                    state["eobrun"] += 1
                    state["pending"].extend(br)
                    if state["eobrun"] == 0x7FFF:
                        emit_eobrun(state, writer)
        emit_eobrun(state, writer)
        writer.flush()
        scans.append((([ci + 1], lo, hi, 1, 0), bytes(writer.out)))
    return scans
