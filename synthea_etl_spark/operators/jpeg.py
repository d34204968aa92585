"""JPEG codec — baseline (SOF0) AND progressive (SOF2) — pure Python
+ numpy, no image library.

Beyond-reference multimodal surface (the reference repo has no image
code; this implements the builder's-brief 'real pixel decode' scope
for the format that dominates real corpora). Public knowledge only:
the ITU-T T.81 spec — marker/segment layout, zigzag order, Huffman
entropy coding (Annex K standard tables), 8x8 DCT-II, JFIF YCbCr,
and Annex G's progressive mode (spectral selection, successive
approximation, EOB-run coding, the AC correction-bit refinement
algorithm).

Scope:

- decode: sequential DCT (SOF0) AND progressive DCT (SOF2), 8-bit
  precision, 1 or 3 components, chroma subsampling up to 2x2 on the
  sequential path (4:4:4 / 4:2:2 / 4:2:0 — interleaved MCUs with
  per-component sampling factors, chroma upsampled by sample
  replication; progressive stays 1x1), restart markers (DRI/RSTn),
  byte stuffing, multi-table DQT/DHT, multi-scan progressive
  refinement with DC/AC successive approximation and EOB runs.
  Arithmetic coding and hierarchical/lossless modes return None —
  the remaining stub scope together with inter-frame video codecs.
- encode: exact twins used to synthesize valid payloads for tests
  and oracles (same spirit as multimodal.encode_png):
  ``encode_jpeg`` emits baseline SOF0 streams;
  ``encode_jpeg_progressive`` emits multi-scan SOF2 streams from the
  SAME quantized coefficients, so the two decode paths must agree
  sample-for-sample — the differential property the tests pin.

Adversarial-input posture matches the PNG decoder: declared raster
capped at 2^24 pixels, every read bounds-checked, malformed input
returns None — never an exception, never an unbounded allocation.
"""

from __future__ import annotations

import math

import numpy as np

# ---------------------------------------------------------------------------
# Shared constants
# ---------------------------------------------------------------------------

_JPEG_MAX_PIXELS = 1 << 24  # same adversarial-input cap as PNG


def _zigzag() -> list[int]:
    """The spec's zigzag scan as natural-order indices: position i of
    the zigzag sequence holds natural index _ZZ[i] (row*8+col).
    Generated, not transcribed: anti-diagonal s runs up-right when s
    is even, down-left when odd."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(s + 1) if r < 8 and 0 <= s - r < 8]
        if s % 2 == 0:
            diag.reverse()  # even diagonals walk bottom-left -> top-right
        order.extend(r * 8 + c for r, c in diag)
    return order


_ZZ = _zigzag()

# Orthonormal 8x8 DCT-II basis: A[u, x] = c(u) cos((2x+1)u pi / 16).
# A p A^T equals the spec's (1/4) a(u) a(v) double sum exactly
# (c(0)^2 = 1/8 = (1/4)(1/sqrt2)(1/sqrt2) * ... term for term), so a
# constant block of value v has DC = 8v and zero ACs.
_A = np.array(
    [
        [
            (math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8))
            * math.cos((2 * x + 1) * u * math.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ],
    dtype=np.float64,
)

# Standard Huffman tables, ITU-T T.81 Annex K (public constants):
# (bits[16], values). The decoder never trusts these — it builds its
# tables from the file's own DHT segments; they are the encoder's
# defaults so synthesized files look like real-world baseline JPEGs.
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment (T.81
    Annex C): codes of each length are consecutive, doubling on the
    way down. Raises ValueError on an infeasible counts vector."""
    if len(bits) != 16 or sum(bits) != len(vals):
        raise ValueError("huffman spec mismatch")
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if code >= (1 << length):
                raise ValueError("huffman counts overflow")
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _floor_half(x):
    """round-half-up as floor(x + 0.5) — the ONE rounding convention
    shared by encoder, decoder, and the DuckDB oracles (SQL twin:
    FLOOR(x + 0.5)). Works elementwise on numpy arrays."""
    return np.floor(x + 0.5)


# JFIF / BT.601 color constants — mirrored VERBATIM in ORACLE_Q127;
# both engines parse the same decimal literals to the same float64.
_YCC = dict(
    kr=0.299, kg=0.587, kb=0.114,
    cb_r=-0.168735892, cb_g=-0.331264108, cb_b=0.5,
    cr_r=0.5, cr_g=-0.418687589, cr_b=-0.081312411,
    r_cr=1.402, g_cb=-0.344136286, g_cr=-0.714136286, b_cb=1.772,
)


def rgb_to_ycc(r, g, b):
    """Integer RGB -> integer YCbCr, floor(x+0.5) rounding, clamped."""
    r = np.asarray(r, np.float64)
    g = np.asarray(g, np.float64)
    b = np.asarray(b, np.float64)
    y = _floor_half(_YCC["kr"] * r + _YCC["kg"] * g + _YCC["kb"] * b)
    cb = _floor_half(
        _YCC["cb_r"] * r + _YCC["cb_g"] * g + _YCC["cb_b"] * b + 128.0
    )
    cr = _floor_half(
        _YCC["cr_r"] * r + _YCC["cr_g"] * g + _YCC["cr_b"] * b + 128.0
    )
    clip = lambda a: np.clip(a, 0, 255).astype(np.int64)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def ycc_to_rgb(y, cb, cr):
    """Integer YCbCr -> integer RGB, floor(x+0.5) rounding, clamped."""
    y = np.asarray(y, np.float64)
    cbc = np.asarray(cb, np.float64) - 128.0
    crc = np.asarray(cr, np.float64) - 128.0
    r = _floor_half(y + _YCC["r_cr"] * crc)
    g = _floor_half(y + _YCC["g_cb"] * cbc + _YCC["g_cr"] * crc)
    b = _floor_half(y + _YCC["b_cb"] * cbc)
    clip = lambda a: np.clip(a, 0, 255).astype(np.int64)  # noqa: E731
    return clip(r), clip(g), clip(b)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits per spec


def _magnitude(v: int) -> tuple[int, int]:
    """(category, value-bits): category = bit length of |v|; negative
    values use the one's-complement convention."""
    if v == 0:
        return 0, 0
    cat = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << cat) - 1
    return cat, bits


def _encode_block(
    wr: _BitWriter,
    block: np.ndarray,
    qtable: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    """DCT + quantize + Huffman one 8x8 sample block; returns the new
    DC predictor."""
    coef = _A @ (block.astype(np.float64) - 128.0) @ _A.T
    q = _floor_half(coef / qtable).astype(np.int64)
    # baseline entropy coding caps AC magnitudes at category 10
    # (|v| <= 1023); extreme blocks at low quant clamp like any real
    # encoder rather than emitting an uncodable symbol
    q = np.clip(q, -1023, 1023)
    zz = [int(q.flat[_ZZ[i]]) for i in range(64)]
    cat, bits = _magnitude(zz[0] - pred)
    code, length = dc_codes[cat]
    wr.put(code, length)
    if cat:
        wr.put(bits, cat)
    run = 0
    last_nz = max((i for i in range(1, 64) if zz[i]), default=0)
    for i in range(1, last_nz + 1):
        if zz[i] == 0:
            run += 1
            continue
        while run >= 16:
            code, length = ac_codes[0xF0]  # ZRL: sixteen zeros
            wr.put(code, length)
            run -= 16
        cat, bits = _magnitude(zz[i])
        code, length = ac_codes[(run << 4) | cat]
        wr.put(code, length)
        wr.put(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        wr.put(code, length)
    return zz[0]


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def encode_jpeg(
    width: int,
    height: int,
    pixels_rgb: list[tuple[int, int, int]],
    gray: bool = False,
    quant: int = 8,
    restart_interval: int = 0,
    subsampling: str = "444",
) -> bytes:
    """Minimal REAL baseline-JPEG encoder, twin of decode_jpeg_pixels —
    synthesizes valid SOF0 payloads for tests/oracles without a codec.

    ``pixels_rgb`` is row-major (r, g, b); ``gray=True`` encodes one
    component from the r channel (like encode_png colortype 0). The
    quantization table is uniform ``quant`` for every coefficient —
    with the default 8, a CONSTANT 8x8 block round-trips exactly
    (DC = 8(v-128) quantizes to v-128 losslessly; see ORACLE_Q127).
    ``subsampling`` selects the luma sampling factors: '444' (1x1,
    byte-identical streams to the pre-subsampling encoder), '422'
    (2x1), or '420' (2x2 — what real photos use); chroma is
    box-averaged with floor(x+0.5) and the decoder upsamples by
    sample replication, so constant 2x2 color patches round-trip
    exactly. Dimensions must be multiples of the MCU size (8 x the
    sampling factor per axis — no edge padding, keeps the mean
    arithmetic exact for oracles)."""
    factors = {"444": (1, 1), "422": (2, 1), "420": (2, 2)}
    if subsampling not in factors:
        raise ValueError(f"bad subsampling {subsampling}")
    hs, vs = (1, 1) if gray else factors[subsampling]
    if width <= 0 or height <= 0 or width % (8 * hs) or height % (8 * vs):
        raise ValueError("dimensions must be positive MCU multiples")
    if len(pixels_rgb) != width * height:
        raise ValueError("pixel count mismatch")
    if not 1 <= quant <= 255:
        raise ValueError("quant must fit an 8-bit DQT entry")
    px = np.asarray(pixels_rgb, dtype=np.int64).reshape(height, width, 3)
    if gray:
        planes = [px[:, :, 0]]
        samps = [(1, 1)]
    else:
        y, cb, cr = rgb_to_ycc(px[:, :, 0], px[:, :, 1], px[:, :, 2])
        if (hs, vs) != (1, 1):

            def down(p):
                boxes = p.astype(np.float64).reshape(
                    height // vs, vs, width // hs, hs
                )
                return _floor_half(boxes.mean(axis=(1, 3))).astype(np.int64)

            cb, cr = down(cb), down(cr)
        planes = [y, cb, cr]
        samps = [(hs, vs), (1, 1), (1, 1)]

    qtable = np.full((8, 8), float(quant))
    qzz = bytes([quant] * 64)  # uniform, so zigzag order is trivial
    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, b"\x00" + qzz)  # DQT table 0 (luma)
    if not gray:
        out += _seg(0xDB, b"\x01" + qzz)  # DQT table 1 (chroma)
    ncomp = 1 if gray else 3
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        shi, svi = samps[ci]
        sof += bytes([ci + 1, (shi << 4) | svi, 0 if ci == 0 else 1])
    out += _seg(0xC0, sof)  # SOF0: baseline sequential

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _STD_DC_LUMA) + dht(1, 0, _STD_AC_LUMA)
    tables = [(_canonical_codes(*_STD_DC_LUMA), _canonical_codes(*_STD_AC_LUMA))]
    if not gray:
        out += dht(0, 1, _STD_DC_CHROMA) + dht(1, 1, _STD_AC_CHROMA)
        chroma = (
            _canonical_codes(*_STD_DC_CHROMA),
            _canonical_codes(*_STD_AC_CHROMA),
        )
        tables += [chroma, chroma]
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))  # DRI
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])  # Ss, Se, AhAl — full baseline spectral range
    out += _seg(0xDA, sos)

    wr = _BitWriter()
    preds = [0] * ncomp
    mcux, mcuy = width // (8 * hs), height // (8 * vs)
    rst = 0
    for mcu in range(mcux * mcuy):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wr.flush()
            out += wr.out
            out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
            wr = _BitWriter()
            preds = [0] * ncomp
        my_, mx_ = divmod(mcu, mcux)
        for ci in range(ncomp):
            shi, svi = samps[ci]
            for v in range(svi):
                for u in range(shi):
                    by = my_ * svi + v
                    bx = mx_ * shi + u
                    block = planes[ci][
                        by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8
                    ]
                    preds[ci] = _encode_block(
                        wr, block, qtable, tables[ci][0], tables[ci][1],
                        preds[ci],
                    )
    wr.flush()
    out += wr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Progressive encoder (SOF2)
# ---------------------------------------------------------------------------

# A complete AC Huffman table holding ALL 256 run/size symbols: 254 at
# code length 8, the last two (0xFE/0xFF, never emitted) at length 9.
# Progressive scans need EOBn symbols (0x10..0xE0) that Annex K's
# standard tables deliberately omit — real progressive encoders build
# per-scan optimal tables; a fixed complete table keeps this twin
# deterministic without a Huffman-construction pass. Canonical-valid:
# lengths sum to 254/256 + 2/4 of the remaining code space.
_FLAT_AC = (
    [0, 0, 0, 0, 0, 0, 0, 254, 2, 0, 0, 0, 0, 0, 0, 0],
    list(range(256)),
)


class _EntropyOut:
    """Accumulates entropy-coded chunks separated by restart markers;
    each restart flushes the bit writer (1-padded per spec) before the
    RSTn byte pair."""

    def __init__(self) -> None:
        self.chunks = bytearray()
        self.wr = _BitWriter()
        self.rst = 0

    def restart(self) -> None:
        self.wr.flush()
        self.chunks += self.wr.out
        self.chunks += bytes([0xFF, 0xD0 + self.rst])
        self.rst = (self.rst + 1) % 8
        self.wr = _BitWriter()

    def finish(self) -> bytes:
        self.wr.flush()
        self.chunks += self.wr.out
        return bytes(self.chunks)


def _quantized_zigzag(plane: np.ndarray, qtable: np.ndarray, mx: int, my: int) -> np.ndarray:
    """(my*8, mx*8) samples -> (n_blocks, 64) quantized coefficients in
    ZIGZAG order — the shared front half of both encoders (same DCT,
    same floor(x+0.5) quantizer, same |v|<=1023 baseline clamp)."""
    blocks = (
        plane.astype(np.float64)
        .reshape(my, 8, mx, 8)
        .transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    # per-block chained matmul, NOT a batched einsum: must be the
    # bit-identical float64 op sequence _encode_block uses, or
    # floor(x+0.5) flips on near-half coefficients at low quant and
    # the baseline/progressive twins stop agreeing
    out = np.empty((blocks.shape[0], 64), dtype=np.int64)
    zz = np.array(_ZZ)
    for i in range(blocks.shape[0]):
        coef = _A @ (blocks[i] - 128.0) @ _A.T
        q = _floor_half(coef / qtable).astype(np.int64)
        out[i] = np.clip(q, -1023, 1023).flatten()[zz]
    return out


def _emit_dc_first(eo, coefs, al, dc_tables, restart_interval):
    """Interleaved first DC scan: DPCM over (dc >> al) per component
    (arithmetic shift — T.81 G.1.2.1's DC point transform)."""
    preds = [0] * len(coefs)
    n = coefs[0].shape[0]
    for mcu in range(n):
        if restart_interval and mcu and mcu % restart_interval == 0:
            eo.restart()
            preds = [0] * len(coefs)
        for ci, cz in enumerate(coefs):
            v = int(cz[mcu, 0]) >> al
            cat, bits = _magnitude(v - preds[ci])
            code, ln = dc_tables[ci][cat]
            eo.wr.put(code, ln)
            if cat:
                eo.wr.put(bits, cat)
            preds[ci] = v
    return eo


def _emit_dc_refine(eo, coefs, al, restart_interval):
    """DC refinement: one raw bit per block per component — bit ``al``
    of the two's-complement DC value, no Huffman coding at all."""
    n = coefs[0].shape[0]
    for mcu in range(n):
        if restart_interval and mcu and mcu % restart_interval == 0:
            eo.restart()
        for cz in coefs:
            eo.wr.put((int(cz[mcu, 0]) >> al) & 1, 1)
    return eo


def _emit_ac_first(eo, cz, ss, se, al, ac_codes, restart_interval):
    """Non-interleaved first AC scan for one band: run/size coding as
    baseline plus EOBn run accumulation across all-zero bands. The AC
    point transform is sign-magnitude (|v| >> al, sign kept)."""
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            eo.wr.put(code, ln)
            if r:
                eo.wr.put(eobrun - (1 << r), r)
            eobrun = 0

    n = cz.shape[0]
    for mcu in range(n):
        if restart_interval and mcu and mcu % restart_interval == 0:
            flush_eob()
            eo.restart()
        vals = []
        for k in range(ss, se + 1):
            v = int(cz[mcu, k])
            m = abs(v) >> al
            vals.append(m if v >= 0 else -m)
        last = -1
        for i, v in enumerate(vals):
            if v:
                last = i
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:  # largest representable EOBn
                flush_eob()
            continue
        flush_eob()
        run = 0
        for i in range(last + 1):
            v = vals[i]
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                eo.wr.put(code, ln)
                run -= 16
            cat, bits = _magnitude(v)
            code, ln = ac_codes[(run << 4) | cat]
            eo.wr.put(code, ln)
            eo.wr.put(bits, cat)
            run = 0
        if last < se - ss:
            eobrun = 1  # EOB covers this block's tail; may extend
    flush_eob()
    return eo


def _emit_ac_refine(eo, cz, ss, se, ah, al, ac_codes, restart_interval):
    """Non-interleaved AC refinement scan (T.81 G.1.2.3, the
    correction-bit algorithm): newly-significant coefficients (|v|>>al
    == 1) are run/size-coded with s=1 plus a sign bit; already-nonzero
    history coefficients contribute one buffered correction bit each,
    emitted after the next symbol; trailing runs fold into EOBn whose
    buffered bits follow the EOBn code."""
    eobrun = 0
    pending: list[int] = []

    def flush_eob():
        nonlocal eobrun, pending
        if eobrun:
            r = eobrun.bit_length() - 1
            code, ln = ac_codes[r << 4]
            eo.wr.put(code, ln)
            if r:
                eo.wr.put(eobrun - (1 << r), r)
            for bitv in pending:
                eo.wr.put(bitv, 1)
            eobrun = 0
            pending = []

    n = cz.shape[0]
    for mcu in range(n):
        if restart_interval and mcu and mcu % restart_interval == 0:
            flush_eob()
            eo.restart()
        tvals = []
        signs = []
        for k in range(ss, se + 1):
            v = int(cz[mcu, k])
            tvals.append(abs(v) >> al)
            signs.append(1 if v >= 0 else 0)
        eob_pos = -1
        for i, t in enumerate(tvals):
            if t == 1:
                eob_pos = i
        run = 0
        br: list[int] = []
        for i, t in enumerate(tvals):
            if t == 0:
                run += 1
                continue
            while run > 15 and i <= eob_pos:
                flush_eob()
                code, ln = ac_codes[0xF0]  # ZRL among history coefs
                eo.wr.put(code, ln)
                run -= 16
                for bitv in br:
                    eo.wr.put(bitv, 1)
                br = []
            if t > 1:  # history coefficient: buffered correction bit
                br.append(t & 1)
                continue
            flush_eob()
            code, ln = ac_codes[(run << 4) | 1]
            eo.wr.put(code, ln)
            eo.wr.put(signs[i], 1)
            for bitv in br:
                eo.wr.put(bitv, 1)
            br = []
            run = 0
        if run > 0 or br:
            eobrun += 1
            pending.extend(br)
            if eobrun == 0x7FFF or len(pending) > 900:
                flush_eob()
    flush_eob()
    return eo


def encode_jpeg_progressive(
    width: int,
    height: int,
    pixels_rgb: list[tuple[int, int, int]],
    gray: bool = False,
    quant: int = 8,
    restart_interval: int = 0,
    dc_al: int = 1,
    ac_al: int = 2,
    band_split: int = 6,
) -> bytes:
    """REAL progressive-JPEG (SOF2) encoder, twin of the progressive
    decode path. Same pixel contract as ``encode_jpeg`` (row-major
    RGB, dims multiples of 8, uniform quant, 1x1 sampling), same
    quantized coefficients — so baseline and progressive streams of
    the same image decode identically.

    Scan script (the successive-approximation ladder libjpeg's
    simple-progression preset uses, parameterized):

    1. interleaved DC first scan at Al=dc_al, then dc_al refinement
       scans down to Al=0 (raw-bit scans);
    2. per component, AC first scans at Al=ac_al for the two spectral
       bands [1, band_split-1] and [band_split, 63];
    3. per component and band, ac_al correction-bit refinement scans
       stepping Al down to 0.

    dc_al=0/ac_al=0 degenerates to pure spectral selection. AC scans
    use a complete fixed Huffman table (_FLAT_AC) so EOBn symbols are
    codable without a per-scan Huffman-construction pass."""
    if width <= 0 or height <= 0 or width % 8 or height % 8:
        raise ValueError("dimensions must be positive multiples of 8")
    if len(pixels_rgb) != width * height:
        raise ValueError("pixel count mismatch")
    if not 1 <= quant <= 255:
        raise ValueError("quant must fit an 8-bit DQT entry")
    if not (0 <= dc_al <= 8 and 0 <= ac_al <= 8 and 1 <= band_split <= 63):
        raise ValueError("bad progression parameters")
    px = np.asarray(pixels_rgb, dtype=np.int64).reshape(height, width, 3)
    if gray:
        planes = [px[:, :, 0]]
    else:
        y, cb, cr = rgb_to_ycc(px[:, :, 0], px[:, :, 1], px[:, :, 2])
        planes = [y, cb, cr]
    ncomp = len(planes)
    mx, my = width // 8, height // 8
    qtable = np.full((8, 8), float(quant))
    coefs = [_quantized_zigzag(p, qtable, mx, my) for p in planes]

    qzz = bytes([quant] * 64)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, b"\x00" + qzz)
    if not gray:
        out += _seg(0xDB, b"\x01" + qzz)
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += _seg(0xC2, sof)  # SOF2: progressive DCT

    def dht(tc: int, th: int, spec) -> bytes:
        bits, vals = spec
        return _seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    out += dht(0, 0, _STD_DC_LUMA) + dht(1, 0, _FLAT_AC)
    dc_tables = [_canonical_codes(*_STD_DC_LUMA)]
    if not gray:
        out += dht(0, 1, _STD_DC_CHROMA)
        dc_tables += [_canonical_codes(*_STD_DC_CHROMA)] * 2
    ac_codes = _canonical_codes(*_FLAT_AC)
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))

    def sos(comp_specs: list[tuple[int, int]], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_specs)])
        for cid, tda in comp_specs:
            body += bytes([cid, tda])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    # 1. DC ladder (interleaved, all components)
    all_dc = [(ci + 1, (0 if ci == 0 else 1) << 4) for ci in range(ncomp)]
    out += sos(all_dc, 0, 0, 0, dc_al)
    out += _emit_dc_first(
        _EntropyOut(), coefs, dc_al, dc_tables, restart_interval
    ).finish()
    for al in range(dc_al - 1, -1, -1):
        out += sos(all_dc, 0, 0, al + 1, al)
        out += _emit_dc_refine(
            _EntropyOut(), coefs, al, restart_interval
        ).finish()

    # 2+3. AC ladder per component and spectral band (non-interleaved)
    bands = [(1, band_split - 1), (band_split, 63)] if band_split > 1 else [(1, 63)]
    for ci in range(ncomp):
        for ss, se in bands:
            out += sos([(ci + 1, 0x00)], ss, se, 0, ac_al)
            out += _emit_ac_first(
                _EntropyOut(), coefs[ci], ss, se, ac_al, ac_codes, restart_interval
            ).finish()
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for ss, se in bands:
                out += sos([(ci + 1, 0x00)], ss, se, al + 1, al)
                out += _emit_ac_refine(
                    _EntropyOut(), coefs[ci], ss, se, al + 1, al,
                    ac_codes, restart_interval,
                ).finish()

    out += b"\xff\xd9"
    return bytes(out)


def ensure_huffman_tables(b: bytes) -> bytes:
    """MJPEG convention support: motion-JPEG streams routinely OMIT
    DHT segments (the OpenDML/MJPG spec says decoders supply the
    Annex-K defaults). If the stream has no DHT before its first SOS,
    splice the four standard tables in right before the SOS marker;
    otherwise return it unchanged. Walks markers with the same
    bounds discipline as the decoder; returns the input unchanged on
    anything malformed (the decoder will reject it properly)."""
    if b[:2] != b"\xff\xd8":
        return b
    pos = 2
    n = len(b)
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return b
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if marker == 0xC4:
            return b  # has its own tables
        if marker == 0xDA:  # first SOS, no DHT seen: splice defaults
            def dht(tc, th, spec):
                bits, vals = spec
                return _seg(
                    0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)
                )

            tables = (
                dht(0, 0, _STD_DC_LUMA)
                + dht(1, 0, _STD_AC_LUMA)
                + dht(0, 1, _STD_DC_CHROMA)
                + dht(1, 1, _STD_AC_CHROMA)
            )
            return b[:pos] + tables + b[pos:]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            return b
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return b
        pos += seglen
    return b


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, stops cleanly at
    any other marker (the caller handles RSTn). Raises EOFError past
    the end — the decoder catches it and returns None."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.d = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.d):
            raise EOFError
        byte = self.d[self.pos]
        if byte == 0xFF:
            nxt = self.d[self.pos + 1] if self.pos + 1 < len(self.d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError  # a real marker: segment over
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | byte
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self) -> int | None:
        """Drop partial byte, return the marker code at the cursor (or
        None if the stream is exhausted/not at a marker)."""
        self.acc = 0
        self.nbits = 0
        if self.pos + 1 < len(self.d) and self.d[self.pos] == 0xFF:
            return self.d[self.pos + 1]
        return None


def _huff_decode(rd: _BitReader, table: dict[tuple[int, int], int]) -> int:
    """Bit-serial canonical Huffman decode: at most 16 probes of a
    (length, code) -> symbol dict."""
    code = 0
    for length in range(1, 17):
        code = (code << 1) | rd.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise EOFError  # invalid code


def _extend(bits: int, cat: int) -> int:
    """Inverse of _magnitude: value bits + category -> signed value."""
    if cat == 0:
        return 0
    if bits < (1 << (cat - 1)):
        return bits - (1 << cat) + 1
    return bits


def decode_jpeg_pixels(
    b: bytes,
) -> tuple[int, int, float, float, float] | None:
    """REAL baseline-JPEG pixel decode to per-channel means: marker
    walk, DQT/DHT/DRI, SOF0 (8-bit, 1 or 3 components, 1x1 sampling
    only), Huffman entropy decode with byte un-stuffing and restart
    markers, dequantize, batched float64 IDCT, level shift, and JFIF
    YCbCr->RGB (floor(x+0.5) rounding — the convention ORACLE_Q127
    mirrors). Returns (width, height, mean_r, mean_g, mean_b) with
    means as exact int64 sums over the CROPPED w x h raster / count;
    None for progressive/arithmetic/subsampled/12-bit/malformed input.
    Raster capped at 2^24 pixels (anti-bomb, as PNG)."""
    dec = decode_jpeg_samples(b)
    if dec is None:
        return None
    w, h, planes = dec
    cnt = float(w * h)
    if len(planes) == 1:
        m = int(planes[0].sum(dtype=np.int64)) / cnt
        return (w, h, m, m, m)
    r, g, bl = ycc_to_rgb(planes[0], planes[1], planes[2])
    return (
        w,
        h,
        int(r.sum(dtype=np.int64)) / cnt,
        int(g.sum(dtype=np.int64)) / cnt,
        int(bl.sum(dtype=np.int64)) / cnt,
    )


def decode_jpeg_samples(
    b: bytes,
) -> tuple[int, int, list[np.ndarray]] | None:
    """Per-sample decode: (width, height, [component planes]) with
    planes as cropped (h, w) int64 arrays — 1 plane (gray) or 3
    (Y, Cb, Cr; callers color-convert via ycc_to_rgb). The per-pixel
    surface the property tests compare against an independent IDCT;
    decode_jpeg_pixels reduces it to channel means."""
    try:
        return _decode_jpeg_inner(bytes(b))
    except (EOFError, IndexError, KeyError, ValueError, OverflowError):
        # OverflowError: defense in depth for any out-of-range numpy
        # element assignment a crafted stream might still reach — the
        # degradation contract is null, never a task crash
        return None


def _decode_jpeg_inner(b: bytes):
    if b[:2] != b"\xff\xd8":
        return None
    qtables: dict[int, np.ndarray] = {}  # id -> 64 values in zigzag order
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> decode dict
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, tq)], progressive)
    prog: dict | None = None  # progressive state: quantized coefs + scan flag
    pos = 2
    n = len(b)
    # pos+2 (not +4): the trailing EOI of a progressive stream is the
    # last two bytes and must still be visited for finalization
    while pos + 2 <= n:
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if marker == 0xD9:
            # EOI: for progressive, all accumulated scans now finalize;
            # for baseline (single-scan) reaching EOI here means no scan
            if prog is not None and prog["scans"] > 0:
                return _finalize_progressive(frame, prog, qtables)
            return None
        seglen = int.from_bytes(b[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            return None
        seg = b[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT: one or more tables
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0xF
                s += 1
                width = 2 if pq == 1 else 1
                if pq > 1 or s + 64 * width > len(seg):
                    return None
                vals = [
                    int.from_bytes(seg[s + i * width : s + (i + 1) * width], "big")
                    for i in range(64)
                ]
                if any(v == 0 for v in vals):
                    return None
                qtables[tq] = np.array(vals, dtype=np.float64)
                s += 64 * width
        elif marker == 0xC4:  # DHT: one or more tables
            s = 0
            while s + 17 <= len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0xF
                bits = list(seg[s + 1 : s + 17])
                cnt = sum(bits)
                if tc > 1 or s + 17 + cnt > len(seg):
                    return None
                vals = list(seg[s + 17 : s + 17 + cnt])
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {
                    (length, code): sym for sym, (code, length) in codes.items()
                }
                s += 17 + cnt
            if s != len(seg):
                return None
        elif marker == 0xDD:  # DRI
            if len(seg) != 2:
                return None
            restart_interval = int.from_bytes(seg, "big")
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            if frame is not None:
                return None  # multiple frames: not a valid T.81 stream
            if len(seg) < 6 or seg[0] != 8:
                return None
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            nf = seg[5]
            if w == 0 or h == 0 or nf not in (1, 3):
                return None
            if w * h > _JPEG_MAX_PIXELS or len(seg) != 6 + 3 * nf:
                return None
            comps = []
            for ci in range(nf):
                cid, hv, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                hi, vi = hv >> 4, hv & 0xF
                if not (1 <= hi <= 2 and 1 <= vi <= 2):
                    return None  # sampling factors beyond 2 are exotic
                comps.append((cid, tq, hi, vi))
            if nf == 1 and comps[0][2:] != (1, 1):
                return None  # single-component frames are never sampled
            if marker == 0xC2 and any(c[2:] != (1, 1) for c in comps):
                return None  # progressive + subsampling: out of scope
            frame = (w, h, comps, marker == 0xC2)
        elif marker in (0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # extended/lossless/arithmetic modes
        elif marker == 0xDA:  # SOS
            if frame is None:
                return None
            if not frame[3]:  # baseline: decode the single scan, done
                return _decode_scan(
                    b, pos, seg, frame[:3], qtables, htables, restart_interval
                )
            if prog is None:
                w, h = frame[0], frame[1]
                mx, my = (w + 7) // 8, (h + 7) // 8
                # anti-bomb before allocation: the first scan must
                # cover every block of at least ONE component, each
                # costing >= 1 Huffman bit — so the remaining stream
                # must hold at least one component's block count in
                # bits. Bounding by a single component (not all of
                # them) keeps unusually compact but VALID streams
                # (flat-color or DC-dominated, or any future
                # subsampled-progressive support where chroma has
                # fewer blocks) decodable, while a tiny crafted file
                # still can't force the all-component allocation.
                if mx * my > (n - pos) * 8:
                    return None
                # int32: T.81 coefficient magnitudes fit 16 bits even
                # after successive-approximation shifts; halving the
                # buffer width caps the worst-case crafted-SOF2
                # allocation at ~200 MB instead of ~400 MB
                prog = {
                    "coefs": [
                        np.zeros((mx * my, 64), dtype=np.int32)
                        for _ in frame[2]
                    ],
                    "scans": 0,
                }
            pos = _decode_scan_progressive(
                b, pos, seg, frame, prog, htables, restart_interval
            )
            if pos is None:
                return None
            prog["scans"] += 1
        # else: APPn/COM/unknown-with-length — skipped
    return None


def _decode_scan(b, pos, seg, frame, qtables, htables, restart_interval):
    w, h, comps = frame
    ns = seg[0] if seg else 0
    if ns != len(comps) or len(seg) != 1 + 2 * ns + 3:
        return None
    if tuple(seg[1 + 2 * ns :]) != (0, 63, 0):
        return None  # non-baseline spectral selection / successive approx
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    selectors = []  # (dc_table, ac_table, qtable, hi, vi) per component
    for ci in range(ns):
        cs, tda = seg[1 + 2 * ci], seg[2 + 2 * ci]
        match = [c for c in comps if c[0] == cs]
        if not match:
            return None
        _cid, tq, hi, vi = match[0]
        dc = htables.get((0, tda >> 4))
        ac = htables.get((1, tda & 0xF))
        qt = qtables.get(tq)
        if dc is None or ac is None or qt is None:
            return None
        selectors.append((dc, ac, qt, hi, vi))

    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    n_mcu = mcux * mcuy
    blocks_per_mcu = sum(s[3] * s[4] for s in selectors)
    # anti-bomb, before any allocation: every block costs >= 2 entropy
    # bits (one DC code + one EOB/AC code, each >= 1 bit even under a
    # degenerate custom DHT), so a tiny file cannot justify a huge
    # declared raster's coefficient buffer
    if n_mcu * blocks_per_mcu * 2 > (len(b) - pos) * 8:
        return None
    # per component: a (mcuy*vi) x (mcux*hi) grid of blocks, flattened
    coefs = [
        np.zeros((mcuy * vi * mcux * hi, 64), dtype=np.float64)
        for (_d, _a, _q, hi, vi) in selectors
    ]
    rd = _BitReader(b, pos)
    preds = [0] * len(selectors)
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            marker = rd.align_to_marker()
            if marker is None or not 0xD0 <= marker <= 0xD7:
                return None
            rd.pos += 2
            preds = [0] * len(selectors)
        my_, mx_ = divmod(mcu, mcux)
        for ci, (dc_tab, ac_tab, qt, hi, vi) in enumerate(selectors):
            for v in range(vi):
                for u in range(hi):
                    brow = my_ * vi + v
                    bcol = mx_ * hi + u
                    zz = coefs[ci][brow * (mcux * hi) + bcol]
                    cat = _huff_decode(rd, dc_tab)
                    if cat > 15:
                        return None
                    preds[ci] += _extend(rd.bits(cat), cat)
                    zz[0] = preds[ci] * qt[0]
                    k = 1
                    while k < 64:
                        sym = _huff_decode(rd, ac_tab)
                        if sym == 0x00:  # EOB
                            break
                        run, cat = sym >> 4, sym & 0xF
                        if cat == 0:
                            if run != 15:
                                return None
                            k += 16  # ZRL
                            continue
                        k += run
                        if k > 63:
                            return None
                        zz[k] = _extend(rd.bits(cat), cat) * qt[k]
                        k += 1

    planes = []
    for ci, (_d, _a, _q, hi, vi) in enumerate(selectors):
        cols_b = mcux * hi
        rows_b = mcuy * vi
        plane_w = -(-w * hi // hmax)  # ceil: component's sample dims
        plane_h = -(-h * vi // vmax)
        (plane,) = _finish_planes(
            [coefs[ci]], plane_w, plane_h, cols_b, rows_b
        )
        if (hi, vi) != (hmax, vmax):
            # chroma upsampling by sample replication (nearest,
            # co-sited top-left) — the encoder twin mirrors this
            plane = np.repeat(
                np.repeat(plane, vmax // vi, axis=0), hmax // hi, axis=1
            )[:h, :w]
        planes.append(plane)
    return (w, h, planes)


def _finish_planes(coefs, w, h, mx, my):
    """Dequantized zigzag coefficient arrays -> cropped sample planes:
    inverse zigzag -> (n_mcu, 8, 8), batched orthonormal IDCT, level
    shift, floor(x+0.5) sample rounding — shared by the baseline
    single-scan path and the progressive EOI finalizer."""
    inv = np.empty(64, dtype=np.int64)
    inv[np.array(_ZZ)] = np.arange(64)
    planes = []
    for arr in coefs:
        blocks = arr[:, inv].reshape(-1, 8, 8)
        spatial = np.einsum("ux,nuv,vy->nxy", _A, blocks, _A) + 128.0
        samples = np.clip(_floor_half(spatial), 0, 255).astype(np.int64)
        # MCU raster -> image plane, crop to declared dims
        plane = (
            samples.reshape(my, mx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(my * 8, mx * 8)[:h, :w]
        )
        planes.append(plane)
    return planes


def _finalize_progressive(frame, prog, qtables):
    """Dequantize the accumulated quantized coefficients (progressive
    scans refine QUANTIZED values; dequantization happens once, here)
    and run the shared IDCT tail."""
    w, h, comps, _ = frame
    mx, my = (w + 7) // 8, (h + 7) // 8
    deq = []
    for ci, (_cid, tq, _hi, _vi) in enumerate(comps):
        qt = qtables.get(tq)
        if qt is None:
            return None
        deq.append(prog["coefs"][ci].astype(np.float64) * qt)
    return (w, h, _finish_planes(deq, w, h, mx, my))


def _next_marker_pos(b: bytes, pos: int) -> int | None:
    """Advance past entropy-coded data to the next true marker (skips
    stuffed 0xFF00 pairs); None if the stream ends first."""
    n = len(b)
    while pos + 1 < n:
        if b[pos] == 0xFF and b[pos + 1] != 0x00:
            return pos
        pos += 1
    return None


def _decode_scan_progressive(b, pos, seg, frame, prog, htables, restart_interval):
    """One progressive scan (T.81 Annex G decode): DC first/refine
    (interleaved allowed), AC first/refine (single component only),
    EOB-run bookkeeping, restart markers. Mutates prog['coefs'] in
    place; returns the byte offset of the marker after the scan's
    entropy data, or None on malformed input."""
    w, h, comps, _ = frame
    ns = seg[0] if seg else 0
    if ns < 1 or len(seg) != 1 + 2 * ns + 3:
        return None
    ss, se, ahl = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
    ah, al = ahl >> 4, ahl & 0xF
    if ss > 63 or se > 63 or se < ss or al > 13:
        return None
    if ah and ah != al + 1:
        return None  # successive approximation must step one bit
    dc_scan = ss == 0
    if dc_scan and se != 0:
        return None  # DC and AC bands may not mix in progressive mode
    if not dc_scan and ns != 1:
        return None  # AC scans are non-interleaved by spec

    # resolve scan components -> (coef array index, dc table)
    sel = []
    for ci in range(ns):
        cs, tda = seg[1 + 2 * ci], seg[2 + 2 * ci]
        idxs = [i for i, c in enumerate(comps) if c[0] == cs]
        if not idxs:
            return None
        if dc_scan and ah == 0:
            tab = htables.get((0, tda >> 4))
            if tab is None:
                return None
        elif not dc_scan:
            tab = htables.get((1, tda & 0xF))
            if tab is None:
                return None
        else:
            tab = None  # DC refinement reads raw bits, no table
        sel.append((idxs[0], tab))

    mx, my = (w + 7) // 8, (h + 7) // 8
    n_mcu = mx * my  # 1x1 sampling: MCU == block for every scan shape
    rd = _BitReader(b, pos)
    preds = [0] * ns
    eobrun = 0
    coefs = prog["coefs"]
    p1 = 1 << al
    m1 = -p1
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            marker = rd.align_to_marker()
            if marker is None or not 0xD0 <= marker <= 0xD7:
                return None
            rd.pos += 2
            preds = [0] * ns
            eobrun = 0
        if dc_scan:
            for si, (idx, tab) in enumerate(sel):
                if ah == 0:  # first DC scan: DPCM of (dc >> al)
                    cat = _huff_decode(rd, tab)
                    if cat > 15:
                        return None
                    preds[si] += _extend(rd.bits(cat), cat)
                    # strict-reject: a valid 8-bit-precision stream's
                    # accumulated DC fits 11 bits; 2^15 is a generous
                    # bound that keeps (pred << al<=13) inside the
                    # int32 coefficient buffer — without it a crafted
                    # DPCM walk overflows the assignment below
                    if not -32768 <= preds[si] <= 32767:
                        return None
                    coefs[idx][mcu, 0] = preds[si] << al
                else:  # DC refinement: one raw bit ORed into bit al
                    if rd.bit():
                        coefs[idx][mcu, 0] = int(coefs[idx][mcu, 0]) | p1
            continue
        # --- AC scan, single component ---
        idx, tab = sel[0]
        band = coefs[idx][mcu]
        if ah == 0:  # first scan for this band
            if eobrun > 0:
                eobrun -= 1
                continue
            k = ss
            while k <= se:
                sym = _huff_decode(rd, tab)
                r, s = sym >> 4, sym & 0xF
                if s == 0:
                    if r != 15:
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += rd.bits(r)
                        break
                    k += 16  # ZRL
                    continue
                k += r
                if k > se:
                    return None
                band[k] = _extend(rd.bits(s), s) << al
                k += 1
        else:  # refinement scan: correction bits (T.81 G.1.2.3)
            k = ss
            if eobrun == 0:
                while k <= se:
                    sym = _huff_decode(rd, tab)
                    r, s = sym >> 4, sym & 0xF
                    newval = 0
                    if s:
                        if s != 1:
                            return None
                        newval = p1 if rd.bit() else m1
                    elif r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += rd.bits(r)
                        break  # rest of band handled by the EOB sweep
                    # advance over r zero-history coefficients, applying
                    # correction bits to nonzero-history ones en route
                    while k <= se:
                        c = int(band[k])
                        if c != 0:
                            if rd.bit() and (c & p1) == 0:
                                band[k] = c + (p1 if c >= 0 else m1)
                        else:
                            if r == 0:
                                break
                            r -= 1
                        k += 1
                    if newval:
                        if k > se:
                            return None
                        band[k] = newval
                    k += 1
            if eobrun > 0:
                # EOB sweep: correction bits for every remaining
                # nonzero-history coefficient in the band
                while k <= se:
                    c = int(band[k])
                    if c != 0 and rd.bit() and (c & p1) == 0:
                        band[k] = c + (p1 if c >= 0 else m1)
                    k += 1
                eobrun -= 1
    return _next_marker_pos(b, rd.pos)
