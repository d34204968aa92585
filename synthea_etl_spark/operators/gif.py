"""GIF (87a/89a) pixel decode in pure Python — no image codec.

GIF is LZW-compressed palette indices behind fixed-layout descriptors
(public spec: GIF89a specification, CompuServe 1990; LZW per the spec's
Appendix F variable-code-width variant, LSB-first bit packing). This
module implements both directions:

- ``encode_gif``: logical screen + global color table + one image with
  real LZW compression (dictionary growth, CLEAR/EOI, 12-bit cap) —
  exists so property tests can round-trip arbitrary rasters through a
  spec-valid byte stream;
- ``decode_gif_pixels``: full parse (extension-block skipping, local
  color tables, interlace flag) to exact per-channel means.

Means don't need spatial reassembly, so interlaced streams decode
without the four-pass reshuffle (index order is irrelevant to a sum)
— the same observation the PNG/Adam7 path uses. Strict-reject + bomb
caps match the other decoders: any truncation, bad LZW code, index
past the palette, or oversized geometry returns None.

Reference scope note: the reference (Glue_Scripts/*.py) carries no
media; beyond-reference surface (BASELINE.json north star).
"""

from __future__ import annotations

import numpy as np

_GIF_MAX_PIXELS = 1 << 24


# ---------------------------------------------------------------------------
# LZW (GIF variant): variable 3..12-bit codes, LSB-first packing
# ---------------------------------------------------------------------------


def _lzw_compress(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}

    # The code WIDTH follows the DECODER's table length, not the
    # encoder's: the decoder adds its entry one code behind the
    # encoder (and adds one after the final data code the encoder
    # never mirrors), so simulating the decoder is the only width
    # schedule that stays in sync through the stream tail. The
    # decoder's table before reading any code holds
    # clear + 2 + max(0, d - 1) entries, where d = data codes it has
    # read since the last CLEAR; it widens whenever that count
    # reaches 2^width.
    width = min_code_size + 1
    data_codes = 0  # data codes emitted since the last CLEAR
    adds_applied = 0
    dec_len = clear + 2
    out_bits: list[tuple[int, int]] = []

    def emit(code: int) -> None:
        nonlocal width, dec_len, adds_applied
        while adds_applied < max(0, data_codes - 1):
            dec_len += 1
            adds_applied += 1
        while dec_len >= (1 << width) and width < 12:
            width += 1
        out_bits.append((code, width))

    def reset() -> None:
        nonlocal width, dec_len, data_codes, adds_applied, table, next_code
        width = min_code_size + 1
        dec_len = clear + 2
        data_codes = adds_applied = 0
        table = {(i,): i for i in range(clear)}
        next_code = eoi + 1

    emit(clear)
    seq: tuple[int, ...] = ()
    for px in indices:
        cand = seq + (px,)
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        data_codes += 1
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
        else:  # dictionary full: emit CLEAR and restart
            emit(clear)
            reset()
        seq = (px,)
    if seq:
        emit(table[seq])
        data_codes += 1
    emit(eoi)

    # LSB-first bit packing
    acc = n_acc = 0
    data = bytearray()
    for code, w in out_bits:
        acc |= code << n_acc
        n_acc += w
        while n_acc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            n_acc -= 8
    if n_acc:
        data.append(acc & 0xFF)
    return bytes(data)


def _lzw_decompress(
    data: bytes, min_code_size: int, max_pixels: int
) -> list[int] | None:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None

    acc = n_acc = pos = 0
    while True:
        while n_acc < width:
            if pos >= len(data):
                return None  # ran out of bits before EOI
            acc |= data[pos] << n_acc
            pos += 1
            n_acc += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_acc -= width

        if code == clear:
            table = [[i] for i in range(clear)] + [[], []]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if prev is None:
            if code >= len(table) or not table[code]:
                return None
            entry = table[code]
        elif code < len(table) and (table[code] or code < clear):
            entry = table[code]
        elif code == len(table):
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if len(out) > max_pixels:
            return None  # decompression bomb
        if prev is not None and len(table) < 4096:
            table.append(prev + [entry[0]])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry


# ---------------------------------------------------------------------------
# Container
# ---------------------------------------------------------------------------


def encode_gif(
    width: int,
    height: int,
    indices: list[int],
    palette: list[tuple[int, int, int]],
    interlace: bool = False,
    comment: bytes | None = None,
) -> bytes:
    """Spec-valid single-image GIF89a with a global color table and
    real LZW compression. ``indices`` is row-major (callers encoding
    an interlaced stream must pre-shuffle; means are order-blind).
    An optional comment extension exercises decoders' block skipping."""
    if len(indices) != width * height:
        raise ValueError("indices must be width*height")
    if any(i >= len(palette) for i in indices):
        raise ValueError("index past palette")
    k = max(1, (max(1, len(palette) - 1)).bit_length())  # table size bits
    n_table = 1 << k
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x80 | (k - 1))  # global table present, 2^k entries
    out += b"\x00\x00"  # background index, aspect
    for i in range(n_table):
        out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
    if comment is not None:
        out += b"\x21\xFE" + bytes([len(comment)]) + comment + b"\x00"
    out += b"\x2C" + b"\x00\x00\x00\x00"  # image descriptor at (0,0)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out.append(0x40 if interlace else 0x00)  # no local table
    mcs = max(2, k)
    out.append(mcs)
    data = _lzw_compress(list(indices), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3B"  # block terminator + trailer
    return bytes(out)


_GIF_MAX_FRAMES = 1 << 12


def _decode_gif_stream(
    b: bytes,
) -> tuple[int, int, list[np.ndarray]] | None:
    """Walk a full GIF stream to (width, height, [per-image N x 3 RGB
    pixel arrays]) — one entry per image block, so animations come
    back as frame sequences. Shared by the single-image and animation
    decoders; same strict-reject posture throughout: malformed
    headers, sub-rectangle frames (compositing is out of scope),
    truncated sub-blocks, bad LZW streams, indices past the palette,
    a missing trailer, or cap violations all return None."""
    b = bytes(b)
    if b[:6] not in (b"GIF87a", b"GIF89a") or len(b) < 13:
        return None
    width = int.from_bytes(b[6:8], "little")
    height = int.from_bytes(b[8:10], "little")
    if width <= 0 or height <= 0 or width * height > _GIF_MAX_PIXELS:
        return None
    flags = b[10]
    pos = 13
    global_table = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(b):
            return None
        global_table = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
        pos += 3 * n
    frames: list[np.ndarray] = []
    saw_trailer = False
    while pos < len(b):
        block = b[pos]
        if block == 0x3B:  # trailer
            saw_trailer = True
            break
        if block == 0x21:  # extension (GCE, comment, application, ...)
            pos += 2
            while pos < len(b) and b[pos] != 0:
                pos += 1 + b[pos]
            if pos >= len(b):
                return None
            pos += 1  # block terminator
            continue
        if block != 0x2C:
            return None
        if len(frames) >= _GIF_MAX_FRAMES:
            return None
        # image descriptor
        if pos + 10 > len(b):
            return None
        iw = int.from_bytes(b[pos + 5 : pos + 7], "little")
        ih = int.from_bytes(b[pos + 7 : pos + 9], "little")
        iflags = b[pos + 9]
        pos += 10
        if iw != width or ih != height:
            return None  # sub-rectangle frames: out of scope, reject
        table = global_table
        if iflags & 0x80:  # local color table overrides global
            n = 2 << (iflags & 0x07)
            if pos + 3 * n > len(b):
                return None
            table = np.frombuffer(b, np.uint8, 3 * n, pos).reshape(n, 3)
            pos += 3 * n
        if table is None:
            return None
        if pos >= len(b):
            return None
        mcs = b[pos]
        pos += 1
        if not 2 <= mcs <= 11:
            return None
        data = bytearray()
        while True:
            if pos >= len(b):
                return None
            n = b[pos]
            pos += 1
            if n == 0:
                break
            if pos + n > len(b):
                return None
            data += b[pos : pos + n]
            pos += n
        indices = _lzw_decompress(bytes(data), mcs, width * height)
        if indices is None or len(indices) != width * height:
            return None
        idx = np.asarray(indices, np.int64)
        if idx.max(initial=0) >= len(table):
            return None
        frames.append((table[idx], bool(iflags & 0x40)))
    if not saw_trailer or not frames:
        return None
    return (width, height, frames)


def _deinterlace_rows(h: int) -> list[int]:
    """GIF interlace row order (spec appendix E): pass 1 every 8th
    row from 0, pass 2 every 8th from 4, pass 3 every 4th from 2,
    pass 4 every 2nd from 1. Returns the destination row index for
    each stream row."""
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def decode_gif_raster(b: bytes) -> tuple[int, int, np.ndarray] | None:
    """SINGLE-image GIF -> (w, h, h x w x 3 uint8 spatial raster),
    de-interlacing the four-pass row order when the image descriptor
    sets the interlace flag. The spatial companion to
    decode_gif_pixels (whose means never needed row order)."""
    dec = _decode_gif_stream(b)
    if dec is None or len(dec[2]) != 1:
        return None
    w, h, ((px, interlaced),) = dec
    raster = px.reshape(h, w, 3).astype(np.uint8)
    if interlaced:
        out = np.empty_like(raster)
        out[_deinterlace_rows(h)] = raster
        raster = out
    return (w, h, raster)


def decode_gif_pixels(
    b: bytes,
) -> tuple[int, int, float, float, float] | None:
    """(width, height, mean_r, mean_g, mean_b) from a SINGLE-image
    GIF (animations are rejected here — decode_gif_frames handles
    them): header + logical screen, global/local color table,
    extension skipping, sub-block reassembly, LZW decode, palette
    resolution. Means are exact int64 sums / pixel count. None on any
    malformation (strict-reject) or bomb-cap violation."""
    dec = _decode_gif_stream(b)
    if dec is None or len(dec[2]) != 1:
        return None
    w, h, ((px, _interlaced),) = dec
    sums = px.sum(axis=0, dtype=np.int64)
    cnt = float(w * h)
    return (w, h, sums[0] / cnt, sums[1] / cnt, sums[2] / cnt)


def decode_gif_frames(
    b: bytes,
) -> tuple[int, int, list[tuple[float, float, float]]] | None:
    """(width, height, [(mean_r, mean_g, mean_b) per frame]) from a
    GIF of ANY frame count — the animated-GIF analogue of the Y4M
    frame decode. Frames must be full-size (sub-rectangle frames with
    disposal compositing are out of scope and strict-rejected), which
    is exactly the shape synthetic/training corpora use."""
    dec = _decode_gif_stream(b)
    if dec is None:
        return None
    w, h, frames = dec
    cnt = float(w * h)
    means = []
    for px, _interlaced in frames:
        sums = px.sum(axis=0, dtype=np.int64)
        means.append((sums[0] / cnt, sums[1] / cnt, sums[2] / cnt))
    return (w, h, means)


def encode_gif_animation(
    width: int,
    height: int,
    frames: list[tuple[list[int], list[tuple[int, int, int]]]],
    delay_cs: int = 4,
    loop: bool = False,
) -> bytes:
    """Spec-valid animated GIF89a: logical screen with NO global
    table, then per frame a graphic control extension (delay,
    no transparency) + full-frame image descriptor with a LOCAL
    color table + LZW data; optional NETSCAPE2.0 looping application
    extension after the header. ``frames`` is [(indices, palette)]
    per frame."""
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += b"\x00\x00\x00"  # no global table
    if loop:
        out += (
            b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
        )
    for indices, palette in frames:
        if len(indices) != width * height:
            raise ValueError("indices must be width*height")
        if any(i >= len(palette) for i in indices):
            raise ValueError("index past palette")
        out += b"\x21\xf9\x04\x00" + delay_cs.to_bytes(2, "little") + b"\x00\x00"
        k = max(1, (max(1, len(palette) - 1)).bit_length())
        n_table = 1 << k
        out += b"\x2c" + b"\x00\x00\x00\x00"
        out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
        out.append(0x80 | (k - 1))  # local table, 2^k entries
        for i in range(n_table):
            out += bytes(palette[i] if i < len(palette) else (0, 0, 0))
        mcs = max(2, k)
        out.append(mcs)
        data = _lzw_compress(list(indices), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
