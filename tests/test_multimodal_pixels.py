"""Unit tests for the REAL uncompressed-raster pixel decoder
(operators/multimodal.decode_pixels / pixel_stats): stride padding,
bottom-up vs top-down BMP row order, PPM comment handling, and
truncation safety — the branches q125's fixed-width fixtures don't
exercise."""

from __future__ import annotations

import struct

from synthea_etl_spark.operators.multimodal import decode_pixels


def make_bmp(width: int, height: int, pixels_bgr: list[tuple[int, int, int]], top_down: bool = False) -> bytes:
    """Build a real 24-bit BI_RGB BMP. ``pixels_bgr`` is row-major
    top-to-bottom; storage flips to bottom-up unless top_down."""
    stride = (width * 3 + 3) // 4 * 4
    rows = [
        b"".join(bytes(p) for p in pixels_bgr[r * width : (r + 1) * width]).ljust(
            stride, b"\xAA"  # padding bytes must be ignored by the decoder
        )
        for r in range(height)
    ]
    if not top_down:
        rows = rows[::-1]
    raster = b"".join(rows)
    h_field = height if not top_down else -height
    header = b"BM" + struct.pack(
        "<IHHI", 54 + len(raster), 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, 24, 0, len(raster), 0, 0, 0, 0
    )
    return header + raster


def test_bmp_stride_padding_ignored():
    # width 3 -> row 9 bytes, stride 12: 3 pad bytes (0xAA) per row
    # must not leak into the means
    px = [(10, 20, 30), (40, 50, 60), (70, 80, 90)]  # BGR
    fmt, w, h, mr, mg, mb = decode_pixels(make_bmp(3, 1, px))
    assert (fmt, w, h) == ("bmp", 3, 1)
    assert (mb, mg, mr) == (40.0, 50.0, 60.0)


def test_bmp_top_down_and_bottom_up_agree_on_means():
    px = [(i, 2 * i, 3 * i) for i in range(6)]  # 3x2
    up = decode_pixels(make_bmp(3, 2, px))
    down = decode_pixels(make_bmp(3, 2, px, top_down=True))
    assert up == down
    assert up[1:3] == (3, 2)


def test_bmp_truncated_and_wrong_bpp_rejected():
    good = make_bmp(3, 2, [(1, 2, 3)] * 6)
    assert decode_pixels(good[:40]) is None          # truncated header
    assert decode_pixels(good[:-4]) is None          # truncated raster
    bad_bpp = bytearray(good)
    bad_bpp[28] = 16                                 # 16bpp unsupported
    assert decode_pixels(bytes(bad_bpp)) is None
    rle = bytearray(good)
    rle[30] = 1                                      # BI_RLE8 compressed
    assert decode_pixels(bytes(rle)) is None


def test_ppm_with_comments_and_multi_whitespace():
    raster = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])  # RGB 2x2
    ppm = b"P6\n# a comment\n 2  2 \n# another\n255\n" + raster
    fmt, w, h, mr, mg, mb = decode_pixels(ppm)
    assert (fmt, w, h) == ("ppm", 2, 2)
    assert (mr, mg, mb) == (66.0, 66.0, 66.0)


def test_ppm_truncated_and_bad_maxval_rejected():
    raster = bytes(range(12))
    assert decode_pixels(b"P6\n2 2\n255\n" + raster[:-1]) is None
    assert decode_pixels(b"P6\n2 2\n65535\n" + raster) is None  # 16-bit
    assert decode_pixels(b"P6\n2 2\n255" + raster) is None  # no ws after maxval


def test_unrecognized_payloads_yield_none():
    assert decode_pixels(b"") is None
    assert decode_pixels(b"\x89PNG\r\n\x1a\nrest") is None  # compressed: codec
    assert decode_pixels(b"garbage" * 20) is None


def test_pixel_stats_distributed(spark):
    rows = [
        (1, make_bmp(3, 1, [(10, 20, 30), (40, 50, 60), (70, 80, 90)])),
        (2, b"P6\n2 2\n255\n" + bytes([255, 0, 0] * 4)),
        (3, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    from synthea_etl_spark.operators.multimodal import pixel_stats

    got = {r.id: r for r in pixel_stats(df).collect()}
    assert got[1].format == "bmp" and got[1].mean_b == 40.0
    assert got[2].format == "ppm" and (got[2].mean_r, got[2].mean_g) == (255.0, 0.0)
    assert got[3].format is None and got[3].mean_r is None


# ---------------------------------------------------------------------------
# property-based: decoder total correctness + crash-freedom (hypothesis)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

pixel_st = st.tuples(
    st.integers(0, 255), st.integers(0, 255), st.integers(0, 255)
)


@given(
    w=st.integers(1, 7),
    h=st.integers(1, 5),
    data=st.data(),
    top_down=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_bmp_roundtrip_any_geometry(w, h, data, top_down):
    """For ANY width/height/pixels: decode returns the exact geometry
    and the exact rational channel means (int sums / count)."""
    px = data.draw(
        st.lists(pixel_st, min_size=w * h, max_size=w * h)
    )
    fmt, gw, gh, mr, mg, mb = decode_pixels(make_bmp(w, h, px, top_down))
    n = w * h
    assert (fmt, gw, gh) == ("bmp", w, h)
    assert mb == sum(p[0] for p in px) / n
    assert mg == sum(p[1] for p in px) / n
    assert mr == sum(p[2] for p in px) / n


@given(
    w=st.integers(1, 7),
    h=st.integers(1, 5),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_ppm_roundtrip_any_geometry(w, h, data):
    px = data.draw(st.lists(pixel_st, min_size=w * h, max_size=w * h))
    raster = b"".join(bytes(p) for p in px)
    ppm = f"P6\n{w} {h}\n255\n".encode() + raster
    fmt, gw, gh, mr, mg, mb = decode_pixels(ppm)
    n = w * h
    assert (fmt, gw, gh) == ("ppm", w, h)
    assert mr == sum(p[0] for p in px) / n
    assert mg == sum(p[1] for p in px) / n
    assert mb == sum(p[2] for p in px) / n


@given(b=st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_decoder_never_raises_on_arbitrary_bytes(b):
    """The decoder runs over arbitrary payloads at scale: it must
    return a tuple or None, NEVER raise — including on adversarial
    prefixes that look like headers."""
    out = decode_pixels(b)
    assert out is None or (
        len(out) == 6
        and out[0]
        in ("bmp", "ppm", "pgm", "png", "jpeg", "gif", "tiff", "ico")
    )


@given(data=st.data())
@settings(max_examples=100, deadline=None)
def test_decoder_never_raises_on_truncated_valid_files(data):
    """Any prefix of a VALID file: tuple (if enough bytes) or None,
    never an exception, never garbage geometry."""
    w = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 4))
    px = data.draw(st.lists(pixel_st, min_size=w * h, max_size=w * h))
    full = data.draw(
        st.sampled_from(
            [
                make_bmp(w, h, px),
                f"P6\n{w} {h}\n255\n".encode() + b"".join(bytes(p) for p in px),
            ]
        )
    )
    cut = data.draw(st.integers(0, len(full)))
    out = decode_pixels(full[:cut])
    if out is not None:
        assert (out[1], out[2]) == (w, h)


@given(b=st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_header_parser_never_raises_on_arbitrary_bytes(b):
    """parse_image_dims walks JPEG marker chains with attacker-shaped
    lengths at scale; it must be total: (fmt|None, w|None, h|None)."""
    from synthea_etl_spark.operators.multimodal import parse_image_dims

    fmt, w, h = parse_image_dims(b)
    assert fmt in (None, "png", "jpeg", "gif", "bmp")
    assert w is None or isinstance(w, int)
    assert h is None or isinstance(h, int)


@given(b=st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_header_parser_never_raises_on_jpeg_prefixed_bytes(b):
    """Force the deepest code path (SOI + random marker soup)."""
    from synthea_etl_spark.operators.multimodal import parse_image_dims

    fmt, w, h = parse_image_dims(b"\xff\xd8" + b)
    assert fmt == "jpeg"


# ---------------------------------------------------------------------------
# real PNG pixel decode (stdlib zlib + spec filter reversal)
# ---------------------------------------------------------------------------

import zlib  # noqa: E402


def make_png(width, height, pixels_rgb, colortype=2, filters=None):
    """Build a real 8-bit PNG with chosen per-row filter types,
    applying the spec's FORWARD filters (the decoder must invert)."""
    bpp = 3 if colortype == 2 else 4
    if colortype == 6:
        pixels = [p + (255,) for p in pixels_rgb]
    else:
        pixels = pixels_rgb
    stride = width * bpp
    rows = [
        b"".join(bytes(p) for p in pixels[r * width : (r + 1) * width])
        for r in range(height)
    ]
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for r, row in enumerate(rows):
        f = filters[r]
        raw.append(f)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b_ = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                v = row[x]
            elif f == 1:
                v = (row[x] - a) & 0xFF
            elif f == 2:
                v = (row[x] - b_) & 0xFF
            elif f == 3:
                v = (row[x] - ((a + b_) >> 1)) & 0xFF
            else:
                p_ = a + b_ - c
                pa, pb, pc = abs(p_ - a), abs(p_ - b_), abs(p_ - c)
                pred = a if (pa <= pb and pa <= pc) else (b_ if pb <= pc else c)
                v = (row[x] - pred) & 0xFF
            raw.append(v)
        prev = row

    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, colortype, 0, 0, 0])
    )
    body = zlib.compress(bytes(raw))
    # split IDAT to prove multi-chunk concatenation
    mid = len(body) // 2
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", body[:mid]) + chunk(b"IDAT", body[mid:])
        + chunk(b"IEND", b"")
    )


def test_png_all_filter_types_rgb_and_rgba():
    px = [(i * 7 % 256, i * 11 % 256, i * 13 % 256) for i in range(20)]  # 4x5
    for ct in (2, 6):
        for f in range(5):
            got = decode_pixels(make_png(4, 5, px, ct, filters=[f] * 5))
            assert got is not None, (ct, f)
            fmt, w, h, mr, mg, mb = got
            assert (fmt, w, h) == ("png", 4, 5)
            assert mr == sum(p[0] for p in px) / 20, (ct, f)
            assert mg == sum(p[1] for p in px) / 20, (ct, f)
            assert mb == sum(p[2] for p in px) / 20, (ct, f)


def test_png_rejects_unsupported_shapes():
    px = [(1, 2, 3)] * 4
    good = make_png(2, 2, px)
    assert decode_pixels(good)[0] == "png"
    assert decode_pixels(good[:40]) is None            # truncated
    badct = bytearray(good); badct[25] = 7             # invalid color type
    assert decode_pixels(bytes(badct)) is None
    # colortype byte flipped to gray without re-encoding the raster:
    # the stream now inflates past the declared gray raster size
    grey = bytearray(good); grey[25] = 0
    assert decode_pixels(bytes(grey)) is None
    # interlace byte flipped without re-encoding: Adam7's expected
    # raster size differs, so the stream length no longer matches
    interlaced = bytearray(good); interlaced[28] = 1
    assert decode_pixels(bytes(interlaced)) is None
    badmethod = bytearray(good); badmethod[28] = 2     # no such method
    assert decode_pixels(bytes(badmethod)) is None
    baddepth = bytearray(good); baddepth[24] = 4       # sub-byte depth
    assert decode_pixels(bytes(baddepth)) is None
    corrupt = bytearray(good); corrupt[45] ^= 0xFF     # break IDAT stream
    assert decode_pixels(bytes(corrupt)) is None


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 5),
    data=st.data(),
    colortype=st.sampled_from([2, 6]),
)
@settings(max_examples=60, deadline=None)
def test_png_roundtrip_any_geometry_any_filters(w, h, data, colortype):
    px = data.draw(st.lists(pixel_st, min_size=w * h, max_size=w * h))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = decode_pixels(make_png(w, h, px, colortype, filters))
    n = w * h
    assert got is not None
    fmt, gw, gh, mr, mg, mb = got
    assert (fmt, gw, gh) == ("png", w, h)
    assert mr == sum(p[0] for p in px) / n
    assert mg == sum(p[1] for p in px) / n
    assert mb == sum(p[2] for p in px) / n


@given(b=st.binary(max_size=300))
@settings(max_examples=200, deadline=None)
def test_png_decoder_never_raises(b):
    out = decode_pixels(b"\x89PNG\r\n\x1a\n" + b)
    assert out is None or out[0] == "png"


# ---------------------------------------------------------------------------
# gray / palette / gray+alpha color types + decompression-bomb guards
# ---------------------------------------------------------------------------

from synthea_etl_spark.operators.multimodal import encode_png  # noqa: E402


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 5),
    data=st.data(),
    colortype=st.sampled_from([0, 3, 4]),
)
@settings(max_examples=60, deadline=None)
def test_png_gray_palette_roundtrip_any_geometry_any_filters(
    w, h, data, colortype
):
    """Gray (0), palette (3), gray+alpha (4) at any geometry under any
    per-row filter mix: palette decodes to the exact RGB channel means;
    gray reports the gray-byte mean on all three channels."""
    px = data.draw(st.lists(pixel_st, min_size=w * h, max_size=w * h))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = decode_pixels(encode_png(w, h, px, colortype, filters))
    n = w * h
    assert got is not None
    fmt, gw, gh, mr, mg, mb = got
    assert (fmt, gw, gh) == ("png", w, h)
    if colortype == 3:
        assert mr == sum(p[0] for p in px) / n
        assert mg == sum(p[1] for p in px) / n
        assert mb == sum(p[2] for p in px) / n
    else:
        gray = sum(p[0] for p in px) / n
        assert (mr, mg, mb) == (gray, gray, gray)


def test_png_palette_index_past_plte_rejected():
    # shrink PLTE to one entry (keep chunk framing valid): rebuild the
    # file with a 3-byte PLTE so index 1 points past the palette end
    full = encode_png(2, 1, [(0, 0, 0), (9, 9, 9)], colortype=3)
    plte_at = full.index(b"PLTE") - 4
    plte_len = int.from_bytes(full[plte_at : plte_at + 4], "big")
    before, after = full[:plte_at], full[plte_at + 12 + plte_len :]
    short = zlib.crc32(b"PLTE" + b"\x00\x00\x00")
    rebuilt = (
        before
        + (3).to_bytes(4, "big")
        + b"PLTE\x00\x00\x00"
        + short.to_bytes(4, "big")
        + after
    )
    assert decode_pixels(rebuilt) is None
    assert decode_pixels(full) is not None  # original still fine


def _raw_png(w, h, idat_payload, colortype=0):
    """Hand-build a PNG with arbitrary IHDR dims and raw IDAT bytes."""
    def chunk(ctype, data):
        return (
            len(data).to_bytes(4, "big") + ctype + data
            + zlib.crc32(ctype + data).to_bytes(4, "big")
        )

    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big")
        + bytes([8, colortype, 0, 0, 0])
    )
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat_payload) + chunk(b"IEND", b"")
    )


pixel16_st = st.tuples(
    st.integers(0, 65535), st.integers(0, 65535), st.integers(0, 65535)
)


@given(
    w=st.integers(1, 6),
    h=st.integers(1, 5),
    data=st.data(),
    colortype=st.sampled_from([0, 2, 4, 6]),
)
@settings(max_examples=60, deadline=None)
def test_png_16bit_roundtrip_any_geometry_any_filters(w, h, data, colortype):
    """Bit depth 16 (big-endian samples, filters over 2-byte pixels):
    exact means over raw 0..65535 samples for every color type the
    depth supports, under any per-row filter mix."""
    px = data.draw(st.lists(pixel16_st, min_size=w * h, max_size=w * h))
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = decode_pixels(encode_png(w, h, px, colortype, filters, bitdepth=16))
    n = w * h
    assert got is not None
    fmt, gw, gh, mr, mg, mb = got
    assert (fmt, gw, gh) == ("png", w, h)
    if colortype in (0, 4):
        gray = sum(p[0] for p in px) / n
        assert (mr, mg, mb) == (gray, gray, gray)
    else:
        assert mr == sum(p[0] for p in px) / n
        assert mg == sum(p[1] for p in px) / n
        assert mb == sum(p[2] for p in px) / n


@given(
    w=st.integers(1, 18),
    h=st.integers(1, 14),
    data=st.data(),
    colortype=st.sampled_from([0, 2, 3, 4, 6]),
    bitdepth=st.sampled_from([8, 16]),
)
@settings(max_examples=60, deadline=None)
def test_png_adam7_roundtrip_any_geometry(w, h, data, colortype, bitdepth):
    """Adam7 interlacing at geometries spanning empty and non-empty
    passes (w,h up to 18x14 crosses every pass-emptiness boundary):
    per-pass unfiltering must recover the exact channel means. Filters
    cycle 0..4 across the concatenated pass rows."""
    if colortype == 3 and bitdepth == 16:
        bitdepth = 8
    top = (1 << bitdepth) - 1
    px = data.draw(
        st.lists(
            st.tuples(
                st.integers(0, top), st.integers(0, top), st.integers(0, top)
            ),
            min_size=w * h,
            max_size=w * h,
        )
    )
    got = decode_pixels(
        encode_png(
            w, h, px, colortype, [0, 1, 2, 3, 4], bitdepth=bitdepth, interlace=1
        )
    )
    n = w * h
    assert got is not None
    fmt, gw, gh, mr, mg, mb = got
    assert (fmt, gw, gh) == ("png", w, h)
    if colortype in (0, 4):
        gray = sum(p[0] for p in px) / n
        assert (mr, mg, mb) == (gray, gray, gray)
    else:
        assert mr == sum(p[0] for p in px) / n
        assert mg == sum(p[1] for p in px) / n
        assert mb == sum(p[2] for p in px) / n


def test_png_pixel_count_cap_rejects_huge_dims():
    """Declared dims past the 2^24-pixel cap are rejected before any
    inflate: a few-KB payload must not provoke a multi-GiB allocation."""
    big = _raw_png(1 << 13, 1 << 13, zlib.compress(b"\x00" * 64))
    assert decode_pixels(big) is None


def test_png_bounded_inflate_rejects_oversized_stream():
    """An IDAT inflating far past the declared raster (the classic
    zlib bomb) is rejected: the bounded decompress never materializes
    the excess. 2x2 gray declares 6 raw filtered bytes (h*(w*bpp+1));
    the stream holds 8 MB of zeros compressed to ~8 KB."""
    bomb = _raw_png(2, 2, zlib.compress(b"\x00" * (8 << 20)))
    assert decode_pixels(bomb) is None


def test_png_short_stream_rejected():
    """A stream inflating to LESS than the raster is rejected too."""
    short = _raw_png(2, 2, zlib.compress(b"\x00" * 5))
    assert decode_pixels(short) is None


# ---------------------------------------------------------------------------
# baseline JPEG (operators/jpeg.py): encoder/decoder round trips, the
# AC/zigzag/ZRL entropy paths against an independent loop-written
# IDCT, adversarial-input guards
# ---------------------------------------------------------------------------

import math  # noqa: E402

import numpy as np  # noqa: E402

from synthea_etl_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg_pixels,
    decode_jpeg_samples,
    encode_jpeg,
    rgb_to_ycc,
    ycc_to_rgb,
)


def _loop_reference_block(block, quant):
    """Independent 8x8 encode-model: explicit O(64^2) loops and
    math.cos — shares NO code with the codec's matrix DCT, so a
    transposed basis or mis-scaled coefficient cannot cancel out."""

    def a(u):
        return math.sqrt(0.125) if u == 0 else math.sqrt(0.25)

    S = [[0.0] * 8 for _ in range(8)]
    for u in range(8):
        for v in range(8):
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        (block[y][x] - 128)
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            S[v][u] = a(u) * a(v) * s
    Sq = [
        [math.floor(S[i][j] / quant + 0.5) * quant for j in range(8)]
        for i in range(8)
    ]
    rec = [[0] * 8 for _ in range(8)]
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        a(u)
                        * a(v)
                        * Sq[v][u]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            rec[y][x] = min(255, max(0, math.floor(s + 128 + 0.5)))
    return rec


def test_jpeg_solid_blocks_exact_means():
    """Solid 8x8 blocks round-trip exactly (DC = 8(v-128) quantizes
    by 8 losslessly) — the arithmetic q127's oracle relies on,
    including a negative DPCM diff (second block darker)."""
    v0, v1 = 201, 57
    pix = [((v0 if x < 8 else v1),) * 3 for _ in range(8) for x in range(16)]
    w, h, mr, mg, mb = decode_jpeg_pixels(encode_jpeg(16, 8, pix, gray=True))
    assert (w, h) == (16, 8)
    assert mr == mg == mb == (v0 + v1) / 2


def test_jpeg_solid_color_matches_ycc_closed_form():
    """3-component 4:4:4 color: the decoded solid equals the
    rgb->ycc->rgb closed form the DuckDB oracle computes."""
    rgb = (123, 45, 210)
    w, h, mr, mg, mb = decode_jpeg_pixels(encode_jpeg(8, 8, [rgb] * 64))
    y, cb, cr = rgb_to_ycc(*[np.array([c]) for c in rgb])
    er, eg, eb = ycc_to_rgb(y, cb, cr)
    assert (mr, mg, mb) == (float(er[0]), float(eg[0]), float(eb[0]))


def test_jpeg_restart_markers_reset_dc_prediction():
    """DRI/RSTn: restart interval 2 across 4 MCUs — byte alignment,
    marker consumption, and DC predictor reset must all be right for
    the means to survive."""
    vals = [10, 70, 130, 190]
    pix = [(vals[x // 8],) * 3 for _ in range(8) for x in range(32)]
    out = decode_jpeg_pixels(
        encode_jpeg(32, 8, pix, gray=True, restart_interval=2)
    )
    assert out is not None and out[2] == sum(vals) / 4


def test_jpeg_ac_entropy_roundtrip_vs_loop_reference():
    """Dense-AC blocks (deterministic pseudo-random pixels) decode to
    EXACTLY the loop-reference reconstruction, per pixel — proves
    zigzag order, run-length coding, magnitude categories, and the
    Huffman tables end-to-end, not just the DC path."""
    for seed, quant in ((3, 1), (11, 2), (29, 8)):
        block = [
            [(seed * 37 + y * 19 + x * 53 + (x * y * seed) % 97) % 256 for x in range(8)]
            for y in range(8)
        ]
        pix = [(block[y][x],) * 3 for y in range(8) for x in range(8)]
        dec = decode_jpeg_samples(
            encode_jpeg(8, 8, pix, gray=True, quant=quant)
        )
        assert dec is not None
        w, h, planes = dec
        ref = _loop_reference_block(block, quant)
        assert planes[0].tolist() == ref, (seed, quant)


def test_jpeg_zrl_long_zero_runs():
    """A raster built from one high-frequency cosine forces >16-length
    zero runs in zigzag order (ZRL symbols); per-pixel equality with
    the loop reference proves the run bookkeeping lands coefficients
    in the right slots."""
    block = [
        [128 + round(40 * math.cos((2 * x + 1) * 7 * math.pi / 16)
                     * math.cos((2 * y + 1) * 7 * math.pi / 16))
         for x in range(8)]
        for y in range(8)
    ]
    pix = [(block[y][x],) * 3 for y in range(8) for x in range(8)]
    payload = encode_jpeg(8, 8, pix, gray=True, quant=4)
    dec = decode_jpeg_samples(payload)
    assert dec is not None
    assert dec[2][0].tolist() == _loop_reference_block(block, 4)


def test_jpeg_byte_stuffing_roundtrip():
    """At quant=1 the dense entropy stream contains stuffed 0xFF00
    sequences; decode must un-stuff and still match the reference."""
    stuffed = None
    for seed in range(60):
        block = [
            [(seed * 41 + y * 23 + x * 59) % 256 for x in range(8)]
            for y in range(8)
        ]
        pix = [(block[y][x],) * 3 for y in range(8) for x in range(8)]
        payload = encode_jpeg(8, 8, pix, gray=True, quant=1)
        if b"\xff\x00" in payload:
            stuffed = (payload, block)
            break
    assert stuffed is not None, "no stuffed byte in 60 candidates"
    payload, block = stuffed
    dec = decode_jpeg_samples(payload)
    assert dec is not None
    assert dec[2][0].tolist() == _loop_reference_block(block, 1)


def test_jpeg_degenerate_sampling_and_marker_flip_rejected():
    """Color 4:2:0/4:2:2 decode for real now (see the subsampling
    tests), but degenerate shapes stay rejected: a SINGLE-component
    frame declaring 2x2 sampling (meaningless — nothing to subsample
    against), and a baseline stream with its SOF marker flipped to
    SOF2, whose single interleaved full-band scan is malformed for
    progressive mode."""
    good = bytearray(encode_jpeg(8, 8, [(9, 9, 9)] * 64, gray=True))
    i = good.find(b"\xff\xc0")
    assert i >= 0
    subsampled = bytearray(good)
    subsampled[i + 11] = 0x22  # 1-component frame claiming 2x2
    assert decode_jpeg_pixels(bytes(subsampled)) is None
    flipped = bytearray(good)
    flipped[i + 1] = 0xC2
    assert decode_jpeg_pixels(bytes(flipped)) is None


def test_jpeg_bomb_dims_and_zero_quant_rejected():
    """Declared raster past the 2^24-pixel cap and zero DQT entries
    (divide-by-zero vector) are both refused during the marker walk."""
    good = bytearray(encode_jpeg(8, 8, [(9, 9, 9)] * 64, gray=True))
    i = good.find(b"\xff\xc0")
    bomb = bytearray(good)
    bomb[i + 5 : i + 9] = (1 << 13).to_bytes(2, "big") * 2  # 8192x8192
    assert decode_jpeg_pixels(bytes(bomb)) is None
    j = good.find(b"\xff\xdb")
    zeroq = bytearray(good)
    zeroq[j + 6] = 0  # first quant entry 0
    assert decode_jpeg_pixels(bytes(zeroq)) is None


def test_jpeg_truncation_and_garbage_never_raise():
    """Every prefix of a valid file, and arbitrary bytes after an SOI
    signature, decode to None-or-result without an exception."""
    payload = encode_jpeg(
        16, 8, [((x * 17) % 256,) * 3 for _ in range(8) for x in range(16)],
        gray=True, quant=1,
    )
    for k in range(len(payload)):
        decode_jpeg_pixels(payload[:k])
    for seed in range(50):
        junk = bytes([(seed * 31 + i * 7) % 256 for i in range(200)])
        decode_jpeg_pixels(b"\xff\xd8" + junk)


def test_decode_pixels_routes_jpeg():
    """The multimodal dispatcher recognizes the SOI signature and
    reports format 'jpeg' with gray replicated on all channels."""
    out = decode_pixels(encode_jpeg(8, 8, [(77, 0, 0)] * 64, gray=True))
    assert out == ("jpeg", 8, 8, 77.0, 77.0, 77.0)


def test_jpeg_extreme_block_clamps_not_crashes():
    """A max-contrast checkerboard at quant=1 drives DCT coefficients
    past category 10; the encoder must clamp (as real encoders do),
    and the file must still decode."""
    block = [[255 if (x + y) % 2 == 0 else 0 for x in range(8)] for y in range(8)]
    pix = [(block[y][x],) * 3 for y in range(8) for x in range(8)]
    payload = encode_jpeg(8, 8, pix, gray=True, quant=1)
    assert decode_jpeg_pixels(payload) is not None


def test_jpeg_tiny_file_huge_dims_no_allocation():
    """A ~100-byte file declaring 4096x4096 must be refused by the
    entropy-length bound BEFORE the 400 MB coefficient buffer would
    be allocated."""
    good = bytearray(encode_jpeg(8, 8, [(9, 9, 9)] * 64, gray=True))
    i = good.find(b"\xff\xc0")
    good[i + 5 : i + 9] = (4096).to_bytes(2, "big") * 2
    assert decode_jpeg_pixels(bytes(good)) is None


def test_tiff_roundtrip_byte_orders_strips_and_routing():
    """Baseline TIFF: II and MM byte orders, single- and multi-strip
    layouts, gray and RGB — lossless round trip through the encoder
    twin, routed through decode_raster/decode_pixels like BMP/PPM."""
    import random

    from synthea_etl_spark.operators.multimodal import (
        _decode_tiff,
        decode_raster,
        encode_tiff,
    )

    rng = random.Random(3)
    for _ in range(40):
        w, h = rng.randint(1, 9), rng.randint(1, 9)
        gray = rng.random() < 0.4
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w * h)
        ]
        if gray:
            px = [(r, r, r) for r, _g, _b in px]
        t = encode_tiff(
            w, h, px, gray=gray,
            big_endian=rng.random() < 0.5,
            rows_per_strip=rng.choice([0, 1, 2, 3]),
        )
        got = _decode_tiff(t)
        assert got is not None and got[0] == w and got[1] == h
        exp = np.asarray(px, np.uint8).reshape(h, w, 3)
        assert np.array_equal(got[2], exp)
        fmt, raster = decode_raster(t)
        assert fmt == "tiff" and np.array_equal(raster, exp)
        f = decode_pixels(t)
        sums = exp.reshape(-1, 3).sum(axis=0)
        assert f == (
            "tiff", w, h,
            sums[0] / (w * h), sums[1] / (w * h), sums[2] / (w * h),
        )


def test_tiff_strict_rejects_and_fuzz():
    import random

    from synthea_etl_spark.operators.multimodal import (
        _decode_tiff,
        encode_tiff,
    )

    base = encode_tiff(4, 4, [(i, i, i) for i in range(16)], rows_per_strip=2)
    bad = bytearray(base)
    bad[2] = 41  # magic != 42
    assert _decode_tiff(bytes(bad)) is None
    # compressed TIFF (tag 259 != 1) refused, not silently mis-read:
    # flip the Compression value in the IFD
    comp = bytearray(base)
    # find the 259 tag entry (little-endian: 0x03 0x01)
    i = comp.find(bytes([3, 1, 3, 0]))
    assert i > 0
    comp[i + 8] = 5  # LZW
    assert _decode_tiff(bytes(comp)) is None
    rng = random.Random(11)
    for _ in range(300):
        ba = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = _decode_tiff(bytes(ba))
        assert r is None or isinstance(r, tuple)
    for cut in range(len(base)):
        r = _decode_tiff(base[:cut])
        assert r is None or isinstance(r, tuple)


def test_png_sub8_depths_roundtrip():
    """PNG bit depths 1/2/4 (gray and palette, interlaced or not, all
    five filters): bit-packed rows unpack to exact sample values;
    palette indices resolve through PLTE; sub-8 palette images also
    produce a spatial raster (full 8-bit RGB after resolution) while
    sub-8 gray stays stats-only (raw code values)."""
    import random

    from synthea_etl_spark.operators.multimodal import (
        _decode_png_samples,
        decode_raster,
        encode_png,
    )

    rng = random.Random(31)
    for _ in range(60):
        w, h = rng.randint(1, 13), rng.randint(1, 11)
        depth = rng.choice([1, 2, 4])
        ct = rng.choice([0, 3])
        inter = rng.choice([0, 0, 1])
        filters = [rng.randint(0, 4) for _ in range(h)]
        maxv = (1 << depth) - 1
        if ct == 0:
            px = [(rng.randint(0, maxv),) * 3 for _ in range(w * h)]
        else:
            pal = [
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
                for _ in range(rng.randint(1, maxv + 1))
            ]
            px = [pal[rng.randrange(len(pal))] for _ in range(w * h)]
        b = encode_png(
            w, h, px, colortype=ct, bitdepth=depth, interlace=inter,
            filters=filters,
        )
        dec = _decode_png_samples(b)
        assert dec is not None and dec[:4] == (w, h, depth, inter)
        stats = decode_pixels(b)
        n = w * h
        exp = tuple(sum(p[c] for p in px) / n for c in range(3))
        assert stats[0] == "png" and stats[1:3] == (w, h)
        assert all(abs(a - e) < 1e-12 for a, e in zip(stats[3:], exp))
        ras = decode_raster(b)
        if ct == 3 and inter == 0:
            assert ras is not None
            assert ras[1].reshape(-1, 3).tolist() == [list(p) for p in px]
        elif ct == 0:
            assert ras is None  # raw gray codes are not intensities


def test_png_sub8_depth_validation():
    from synthea_etl_spark.operators.multimodal import encode_png
    import pytest as _pytest

    with _pytest.raises(ValueError):
        encode_png(2, 2, [(1, 1, 1)] * 4, colortype=2, bitdepth=4)
    with _pytest.raises(ValueError):
        # 5 colors cannot fit a 2-bit palette
        encode_png(
            5, 1, [(i, 0, 0) for i in range(5)], colortype=3, bitdepth=2
        )
    with _pytest.raises(ValueError):
        # gray sample exceeding the depth range
        encode_png(2, 2, [(9, 9, 9)] * 4, colortype=0, bitdepth=2)


def _bmp_variant(width, height, bpp, raster_rows, palette=None,
                 top_down=False, clr_used=0):
    pal = b""
    if palette is not None:
        pal = b"".join(bytes([b_, g, r, 0]) for r, g, b_ in palette)
    off = 54 + len(pal)
    rows = raster_rows if top_down else raster_rows[::-1]
    raster = b"".join(rows)
    h_field = height if not top_down else -height
    hdr = b"BM" + struct.pack(
        "<IHHI", off + len(raster), 0, 0, off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, h_field, 1, bpp, 0, len(raster),
        0, 0, clr_used, 0,
    )
    return hdr + pal + raster


def test_bmp_32bit_and_8bit_palette_variants():
    """BMP beyond 24-bit: 32-bit BGRA (alpha dropped) and 8-bit
    palette (BGRA color quads after the info header, biClrUsed
    honored, index bound enforced, stride padding ignored)."""
    import random

    import numpy as np

    from synthea_etl_spark.operators.multimodal import decode_raster

    rng = random.Random(8)
    for _ in range(15):
        w, h = rng.randint(1, 6), rng.randint(1, 5)
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w * h)
        ]
        rows = [
            b"".join(
                bytes([p[2], p[1], p[0], 0xCC]) for p in px[r * w : (r + 1) * w]
            )
            for r in range(h)
        ]
        exp = np.array(px, np.uint8).reshape(h, w, 3)
        for td in (False, True):
            f, ras = decode_raster(_bmp_variant(w, h, 32, rows, top_down=td))
            assert f == "bmp" and np.array_equal(ras, exp)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(rng.randint(1, 9))
        ]
        idx = [rng.randrange(len(pal)) for _ in range(w * h)]
        stride = (w + 3) // 4 * 4
        prows = [
            bytes(idx[r * w : (r + 1) * w]).ljust(stride, b"\xAA")
            for r in range(h)
        ]
        f, ras = decode_raster(
            _bmp_variant(w, h, 8, prows, palette=pal, clr_used=len(pal))
        )
        pexp = np.array([pal[i] for i in idx], np.uint8).reshape(h, w, 3)
        assert f == "bmp" and np.array_equal(ras, pexp)
    # index past the declared palette is a hard reject
    bad = _bmp_variant(
        2, 1, 8, [bytes([5, 0]).ljust(4, b"\x00")],
        palette=[(1, 2, 3)], clr_used=1,
    )
    assert decode_raster(bad) is None


def test_pgm_gray_sibling():
    from synthea_etl_spark.operators.multimodal import decode_raster

    g = bytes([10, 200, 30, 40, 55, 66])
    p5 = b"P5\n3 2\n255\n" + g
    f, ras = decode_raster(p5)
    assert f == "pgm" and ras.shape == (2, 3, 3)
    assert ras[0, 0].tolist() == [10, 10, 10]
    st = decode_pixels(p5)
    assert st[0] == "pgm" and st[3] == st[4] == st[5] == sum(g) / 6
    assert decode_raster(b"P5\n3 2\n255\n" + g[:-1]) is None


def test_ico_container_largest_member_wins():
    """ICO favicons: PNG and headerless-BMP members (doubled-height
    info header, XOR rows + AND mask) both decode; the consumer
    picks the largest member, per standard behavior; corruption and
    truncation never raise."""
    import random

    import numpy as np

    from synthea_etl_spark.operators.multimodal import (
        decode_ico_raster,
        decode_raster,
        encode_ico,
    )

    rng = random.Random(61)
    for trial in range(15):
        n = rng.randint(1, 3)
        imgs = []
        for _ in range(n):
            w, h = rng.randint(1, 12), rng.randint(1, 12)
            ras = np.random.default_rng(trial).integers(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            imgs.append((ras, rng.choice(["png", "bmp"])))
        ico = encode_ico(imgs)
        best = max(imgs, key=lambda im: im[0].shape[0] * im[0].shape[1])[0]
        got = decode_ico_raster(ico)
        assert got is not None and np.array_equal(got[2], best)
        fmt, ras2 = decode_raster(ico)
        assert fmt == "ico" and np.array_equal(ras2, best)
    base = encode_ico(
        [
            (np.zeros((4, 4, 3), np.uint8), "bmp"),
            (np.full((8, 8, 3), 7, np.uint8), "png"),
        ]
    )
    assert decode_ico_raster(base[:10]) is None
    for _ in range(150):
        ba = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = decode_ico_raster(bytes(ba))
        assert r is None or isinstance(r, tuple)
