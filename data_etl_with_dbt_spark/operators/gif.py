"""Dependency-free GIF codec (stdlib + numpy): full frame decode, not
just container metadata.

``decode_gif`` handles GIF87a/GIF89a — variable-width LSB-first LZW with
clear/end codes and dictionary resets, global AND local color tables,
4-pass interlace, frame composition with disposal methods 0/1 (leave),
2 (restore background), 3 (restore previous), and GCE transparency —
returning composited RGB frames plus per-frame delays. ``encode_gif``
writes multi-frame GIF89a from uint8 RGB frames (palette built from the
frames' unique colors, optional interlace) — the deterministic fixture
generator that round-trip-tests every decoder path without Pillow.

Same posture as operators/jpeg.py: the parallel unit at corpus scale is
the FILE (Arrow batches over mapInPandas); entropy decode is sequential
per file by construction. Reference semantics from the public GIF89a
specification; no reference-repo counterpart (SURVEY.md §2 multimodal
extension).
"""

from __future__ import annotations


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF-variant LZW: codes are LSB-first, start at min_code_size+1 bits,
    grow to 12; CLEAR resets the dictionary, END terminates. Decodes at
    most ``expected`` pixels (trailing junk in truncated/overfull streams
    is ignored, matching lenient real-world decoders)."""
    clear = 1 << min_code_size
    end = clear + 1
    # Sliding-window LSB-first bit reader: refill a SMALL accumulator byte
    # by byte as codes are consumed. (Converting the whole stream to one
    # big int and shifting it per code makes every shift O(stream size) —
    # quadratic total — for real web GIFs with ~100 KB+ frames.)
    nbits = len(data) * 8
    acc = 0
    accbits = 0
    byte_pos = 0
    bitpos = 0
    out = bytearray()

    def reset():
        return (
            [bytes([i]) for i in range(clear)] + [b"", b""],
            min_code_size + 1,
        )

    table, code_size = reset()
    prev = None
    while bitpos + code_size <= nbits and len(out) < expected:
        while accbits < code_size:
            acc |= data[byte_pos] << accbits
            byte_pos += 1
            accbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        accbits -= code_size
        bitpos += code_size
        if code == clear:
            table, code_size = reset()
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("GIF LZW: first code out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("GIF LZW: code out of range")
        out += entry
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
    return out


def _lzw_encode(min_code_size: int, data: bytes) -> bytes:
    """Inverse of :func:`_lzw_decode`: emits CLEAR, the code stream with
    the same growth rule (width bumps when the NEXT free code would not
    fit), dictionary reset at 4096, and END."""
    clear = 1 << min_code_size
    end = clear + 1
    acc = 0
    accbits = 0
    out = bytearray()

    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1

    def emit(code):
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += code_size
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    emit(clear)
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w])
        table[wk] = next_code
        next_code += 1
        # mirror of the decoder rule: its table length equals next_code-1
        # (it lags one entry), so it widens when next_code-1 == 2^size
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        elif next_code == 4097:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([b])
    if w:
        emit(table[w])
    emit(end)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


#: GIF 4-pass interlace: (row0, step)
_GIF_INTERLACE = [(0, 8), (4, 8), (2, 4), (1, 2)]


def _deinterlace(np, idx, h, w):
    out = np.empty((h, w), np.uint8)
    src = 0
    for r0, rs in _GIF_INTERLACE:
        rows = range(r0, h, rs)
        n = len(rows)
        out[r0::rs] = idx[src : src + n]
        src += n
    return out


def decode_gif(content: bytes, max_frames: int | None = None):
    """Decode a GIF to ``(frames, delays_cs)``: composited (H, W, 3) uint8
    RGB frames (logical-screen size) and per-frame delays in centiseconds.
    ``max_frames`` bounds work on pathological animations (None = all)."""
    import numpy as np

    data = bytes(content)
    if data[:3] != b"GIF" or data[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF payload (missing GIF87a/GIF89a header)")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    flags = data[10]
    bg_index = data[11]
    pos = 13
    global_pal = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        global_pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
        pos += n * 3
    if global_pal is not None and bg_index < len(global_pal):
        canvas = np.tile(global_pal[bg_index], (h, w, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((h, w, 3), np.uint8)
    frames: list = []
    delays: list[int] = []
    transparent = None
    disposal = 0
    delay = 0
    while pos < len(data):
        marker = data[pos]
        if marker == 0x3B:  # trailer
            break
        if marker == 0x21:  # extension
            label = data[pos + 1]
            pos += 2
            if label == 0xF9:  # graphic control
                size = data[pos]
                packed = data[pos + 1]
                disposal = (packed >> 2) & 0x07
                delay = int.from_bytes(data[pos + 2 : pos + 4], "little")
                transparent = data[pos + 4] if packed & 0x01 else None
                pos += 1 + size
            else:  # comment/app/plain-text: skip sub-blocks
                while data[pos]:
                    pos += 1 + data[pos]
            pos += 1  # block terminator
            continue
        if marker != 0x2C:
            raise ValueError(f"unknown GIF block marker 0x{marker:02x} at {pos}")
        # image descriptor
        ix = int.from_bytes(data[pos + 1 : pos + 3], "little")
        iy = int.from_bytes(data[pos + 3 : pos + 5], "little")
        iw = int.from_bytes(data[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(data[pos + 7 : pos + 9], "little")
        iflags = data[pos + 9]
        pos += 10
        pal = global_pal
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data, np.uint8, n * 3, pos).reshape(-1, 3)
            pos += n * 3
        if pal is None:
            raise ValueError("GIF frame has neither local nor global palette")
        min_code_size = data[pos]
        pos += 1
        chunks = []
        while data[pos]:
            size = data[pos]
            chunks.append(data[pos + 1 : pos + 1 + size])
            pos += 1 + size
        pos += 1  # sub-block terminator
        idx = np.frombuffer(
            bytes(_lzw_decode(min_code_size, b"".join(chunks), iw * ih)),
            np.uint8,
        )
        if len(idx) < iw * ih:
            raise ValueError("GIF frame pixel data truncated")
        idx = idx[: iw * ih].reshape(ih, iw)
        if iflags & 0x40:
            idx = _deinterlace(np, idx, ih, iw)
        region = canvas[iy : iy + ih, ix : ix + iw]
        saved = region.copy() if disposal == 3 else None
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = (idx != transparent)[:, :, None]
            region[:] = np.where(mask, rgb, region)
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            bg = (
                global_pal[bg_index]
                if global_pal is not None and bg_index < len(global_pal)
                else np.zeros(3, np.uint8)
            )
            canvas[iy : iy + ih, ix : ix + iw] = bg
        elif disposal == 3 and saved is not None:
            canvas[iy : iy + ih, ix : ix + iw] = saved
        # GIF89a scopes a Graphic Control Extension to ONLY the next image:
        # a frame without its own GCE must not inherit the previous frame's
        # transparency/disposal/delay.
        transparent, disposal, delay = None, 0, 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF contains no image data")
    return frames, delays


def encode_gif(
    frames,
    delays_cs=None,
    interlace: bool = False,
    transparent_rgb=None,
    loop: bool = True,
) -> bytes:
    """Write a GIF89a from (H, W, 3) uint8 RGB frames sharing one global
    palette built from their unique colors (<= 256, else
    ``NotImplementedError`` — a production encoder quantizes; fixtures
    don't need to). ``delays_cs`` per frame (centiseconds);
    ``transparent_rgb`` marks one color transparent in every frame;
    ``interlace`` writes 4-pass rows (decoder-path fixture)."""
    import numpy as np

    frames = [np.asarray(f, dtype=np.uint8) for f in frames]
    h, w = frames[0].shape[:2]
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if transparent_rgb is not None:
        t = np.asarray(transparent_rgb, np.uint8)
        if not (colors == t).all(axis=1).any():
            colors = np.concatenate([colors, t[None]], axis=0)
    if len(colors) > 256:
        raise NotImplementedError(
            f"encode_gif fixture palette capped at 256 colors (got {len(colors)})"
        )
    depth = max(1, int(len(colors) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), np.uint8)
    pal[: len(colors)] = colors
    lut = {tuple(c): i for i, c in enumerate(colors)}
    trans_idx = (
        lut[tuple(np.asarray(transparent_rgb, np.uint8))]
        if transparent_rgb is not None
        else None
    )
    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | (depth - 1))  # global palette flag + size
    out += bytes([0, 0])  # bg index, aspect
    out += pal.tobytes()
    if loop and len(frames) > 1:  # Netscape loop-forever block
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, depth)
    for fi, frame in enumerate(frames):
        delay = 0 if delays_cs is None else int(delays_cs[fi])
        gce_packed = 0x01 if trans_idx is not None else 0x00
        out += b"\x21\xf9\x04" + bytes([gce_packed])
        out += delay.to_bytes(2, "little")
        out += bytes([trans_idx if trans_idx is not None else 0, 0])
        out += b"\x2c" + (0).to_bytes(2, "little") * 2
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        idx = np.array(
            [lut[tuple(px)] for px in frame.reshape(-1, 3)], np.uint8
        ).reshape(h, w)
        if interlace:
            rows = [r for r0, rs in _GIF_INTERLACE for r in range(r0, h, rs)]
            idx = idx[rows]
        out.append(mcs)
        payload = _lzw_encode(mcs, idx.tobytes())
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)  # sub-block terminator
    out.append(0x3B)
    return bytes(out)
