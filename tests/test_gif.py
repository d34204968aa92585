"""GIF decode: LZW round trips (incl. dictionary growth, CLEAR
restart, the KwKwK case), container walking (extensions, local color
tables, sub-block reassembly), strict-reject, bomb caps, totality.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from synthea_etl_spark.operators.gif import (
    _lzw_compress,
    _lzw_decompress,
    decode_gif_pixels,
    encode_gif,
)


@given(
    mcs=st.integers(2, 8),
    idx=st.lists(st.integers(0, 255), max_size=600),
)
@settings(max_examples=200, deadline=None)
def test_lzw_roundtrip(mcs, idx):
    # exact bomb cap: the decoder must produce len(idx) pixels, not
    # one more — this is the boundary that exposed the tail-width
    # desync the cross-format differential caught (decoder widens
    # after its post-final-code add; encoder must simulate it)
    idx = [i & ((1 << mcs) - 1) for i in idx]
    assert _lzw_decompress(_lzw_compress(idx, mcs), mcs, max(len(idx), 1)) == idx


def test_lzw_kwkwk_case():
    # 'aaaa...' forces the code == len(table) path immediately
    idx = [0] * 50
    assert _lzw_decompress(_lzw_compress(idx, 2), 2, 10**6) == idx


def test_lzw_dictionary_cap_and_clear_restart():
    # enough distinct 2-grams to overflow 4096 codes and force the
    # compressor's CLEAR-restart path
    idx = [(j * 181 + j // 7) % 256 for j in range(60000)]
    assert _lzw_decompress(_lzw_compress(idx, 8), 8, 10**6) == idx


def test_lzw_bomb_cap():
    # valid stream decoding past max_pixels must be rejected
    idx = [0] * 1000
    blob = _lzw_compress(idx, 2)
    assert _lzw_decompress(blob, 2, 999) is None
    assert _lzw_decompress(blob, 2, 1000) == idx


def test_container_roundtrip_exact_means():
    pal = [(10 * i, 10 * i + 1, 10 * i + 2) for i in range(7)]
    idx = [j % 7 for j in range(20)]
    got = decode_gif_pixels(encode_gif(5, 4, idx, pal, comment=b"meta"))
    exp_r = sum(pal[i][0] for i in idx) / 20
    assert got == (5, 4, exp_r, exp_r + 1, exp_r + 2)


def test_interlace_flag_is_order_blind_for_means():
    pal = [(i, i, i) for i in range(4)]
    idx = [j % 4 for j in range(16)]
    a = decode_gif_pixels(encode_gif(4, 4, idx, pal, interlace=False))
    b = decode_gif_pixels(encode_gif(4, 4, idx, pal, interlace=True))
    assert a == b


def test_local_color_table_overrides_global():
    # hand-extend an encoded GIF: rewrite the image descriptor to
    # carry a local table with shifted colors
    pal = [(0, 0, 0), (10, 20, 30)]
    b = bytearray(encode_gif(2, 1, [0, 1], pal))
    desc = b.index(0x2C)
    assert b[desc + 9] == 0x00
    b[desc + 9] = 0x80  # local table, 2 entries
    local = bytes([100, 0, 0, 200, 0, 0])
    patched = bytes(b[: desc + 10]) + local + bytes(b[desc + 10 :])
    got = decode_gif_pixels(patched)
    assert got == (2, 1, 150.0, 0.0, 0.0)


def test_big_image_multi_subblock_12bit_codes():
    idx = [(j * 37 + j // 13) % 200 for j in range(90000)]
    pal = [(i % 256, i * 2 % 256, i * 3 % 256) for i in range(200)]
    w, h, mr, mg, mb = decode_gif_pixels(encode_gif(300, 300, idx, pal))
    exp = np.array([pal[i] for i in idx], np.int64).sum(0) / 90000
    assert (w, h) == (300, 300)
    assert (mr, mg, mb) == (exp[0], exp[1], exp[2])


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b"",
        lambda b: b[:10],
        lambda b: b"GIF90a" + b[6:],                 # unknown version
        lambda b: b[:-1],                            # truncated trailer
        lambda b: b[: b.index(0x2C)] + b"\x3B",      # trailer before image
        lambda b: b.replace(b"\x2C", b"\x2D", 1),    # bad block intro
        lambda b: b[:6] + struct.pack("<HH", 0, 4) + b[10:],  # zero width
    ],
)
def test_malformed_gifs_rejected(mutate):
    pal = [(1, 2, 3), (4, 5, 6)]
    b = encode_gif(2, 2, [0, 1, 1, 0], pal)
    assert decode_gif_pixels(mutate(b)) is None


def test_pixel_cap_rejects_huge_dims():
    b = bytearray(encode_gif(2, 2, [0] * 4, [(1, 2, 3)]))
    b[6:8] = (50000).to_bytes(2, "little")
    b[8:10] = (50000).to_bytes(2, "little")
    assert decode_gif_pixels(bytes(b)) is None  # 2.5e9 px > cap


@given(b=st.binary(max_size=300))
@settings(max_examples=300, deadline=None)
def test_decoder_never_raises_on_arbitrary_bytes(b):
    for payload in (b, b"GIF89a" + b):
        r = decode_gif_pixels(payload)
        assert r is None or len(r) == 5


@given(data=st.data())
@settings(max_examples=150, deadline=None)
def test_decoder_never_raises_on_truncated_valid_gifs(data):
    pal = [(i * 3, i * 3 + 1, i * 3 + 2) for i in range(5)]
    w = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 5))
    idx = [data.draw(st.integers(0, 4)) for _ in range(w * h)]
    b = encode_gif(w, h, idx, pal)
    cut = data.draw(st.integers(0, len(b)))
    r = decode_gif_pixels(b[:cut])
    assert r is None or len(r) == 5


def test_dispatch_through_decode_pixels():
    from synthea_etl_spark.operators.multimodal import decode_pixels

    pal = [(9, 10, 11)]
    got = decode_pixels(encode_gif(2, 2, [0] * 4, pal))
    assert got == ("gif", 2, 2, 9.0, 10.0, 11.0)


@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_cross_format_mean_consistency(data):
    """The same raster encoded as BMP, PPM, PNG, GIF, and TIFF (both
    byte orders) must decode to identical means through decode_pixels
    — a differential test across five independent codecs (GIF
    constrained to <=256 distinct colors by construction)."""
    from synthea_etl_spark.operators.multimodal import (
        decode_pixels,
        encode_png,
        encode_tiff,
    )
    from tests.test_multimodal_pixels import make_bmp

    w = data.draw(st.integers(1, 5))
    h = data.draw(st.integers(1, 5))
    n_colors = data.draw(st.integers(1, 8))
    palette = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_colors)
    ]
    idx = [data.draw(st.integers(0, n_colors - 1)) for _ in range(w * h)]
    px = [palette[i] for i in idx]

    ppm = b"P6\n%d %d\n255\n" % (w, h) + b"".join(bytes(p) for p in px)
    bmp = make_bmp(w, h, [(b, g, r) for r, g, b in px])
    png = encode_png(w, h, px, colortype=2)
    gif = encode_gif(w, h, idx, palette)
    tiff_le = encode_tiff(w, h, px, big_endian=False,
                          rows_per_strip=data.draw(st.integers(0, 3)))
    tiff_be = encode_tiff(w, h, px, big_endian=True)

    results = {
        fmt: decode_pixels(b)
        for fmt, b in (
            ("ppm", ppm), ("bmp", bmp), ("png", png), ("gif", gif),
            ("tiff", tiff_le), ("tiff_be", tiff_be),
        )
    }
    base = results["ppm"]
    assert base is not None and base[0] == "ppm"
    for fmt, r in results.items():
        assert r is not None and r[0] == ("tiff" if fmt.startswith("tiff") else fmt)
        assert r[1:] == base[1:], (fmt, r, base)


def test_animation_roundtrip_per_frame_means():
    from synthea_etl_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = []
    for k in range(3):
        pal = [(10 * k + 3 * i, 10 * k + 3 * i + 1, 10 * k + 3 * i + 2) for i in range(4)]
        frames.append(([j % 4 for j in range(6)], pal))
    b = encode_gif_animation(3, 2, frames, loop=True)
    w, h, means = decode_gif_frames(b)
    assert (w, h) == (3, 2)
    # wh=6 divides p=4? no -- j%4 over 6 px: counts [2,2,1,1]; compute directly
    exp = []
    for k in range(3):
        pal = frames[k][1]
        px = [pal[j % 4] for j in range(6)]
        exp.append(tuple(sum(c[d] for c in px) / 6 for d in range(3)))
    assert means == exp
    # single-image decoder strict-rejects animations; frames decoder
    # accepts single images
    assert decode_gif_pixels(b) is None
    single = encode_gif(2, 1, [0, 0], [(5, 6, 7)])
    assert decode_gif_frames(single) == (2, 1, [(5.0, 6.0, 7.0)])


def test_animation_truncation_and_frame_cap():
    from synthea_etl_spark.operators.gif import (
        _GIF_MAX_FRAMES,
        decode_gif_frames,
        encode_gif_animation,
    )

    frames = [([0], [(1, 2, 3)])] * 3
    b = encode_gif_animation(1, 1, frames)
    assert decode_gif_frames(b[:-1]) is None          # no trailer
    assert decode_gif_frames(b[: len(b) // 2]) is None
    assert _GIF_MAX_FRAMES == 4096  # cap documented; huge animations reject


def test_gif_frame_stats_distributed(spark):
    from synthea_etl_spark.operators.gif import encode_gif_animation
    from synthea_etl_spark.operators.multimodal import gif_frame_stats

    frames = [
        ([0, 0], [(10 * (k + 1), 0, 0)]) for k in range(5)
    ]  # 5 solid 2x1 frames, mean_r = 10(k+1)
    rows = [
        (1, encode_gif_animation(2, 1, frames)),
        (2, b"not a gif"),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary").repartition(2)
    got = {(r.id, r.frame_idx): r for r in gif_frame_stats(df, every_n=2).collect()}
    assert set(got) == {(1, 0), (1, 2), (1, 4), (2, None)}
    assert got[(1, 2)].mean_r == 30.0 and got[(1, 2)].n_frames == 5
    assert got[(2, None)].width is None and got[(2, None)].mean_r is None


def test_gif_spatial_raster_and_deinterlace():
    """decode_gif_raster: exact spatial raster, with the four-pass
    interlaced row order de-shuffled — so resize and every raster
    consumer accept GIFs via decode_raster."""
    import random

    import numpy as np

    from synthea_etl_spark.operators.gif import (
        _deinterlace_rows,
        decode_gif_raster,
    )
    from synthea_etl_spark.operators.multimodal import decode_raster

    rng = random.Random(17)
    for _ in range(25):
        w, h = rng.randint(1, 9), rng.randint(1, 11)
        pal = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(rng.randint(1, 8))
        ]
        idx = [rng.randrange(len(pal)) for _ in range(w * h)]
        exp = np.array([pal[i] for i in idx], np.uint8).reshape(h, w, 3)
        plain = encode_gif(w, h, idx, pal)
        got = decode_gif_raster(plain)
        assert got is not None and np.array_equal(got[2], exp)
        fmt, ras = decode_raster(plain)
        assert fmt == "gif" and np.array_equal(ras, exp)
        # interlaced storage: raster rows pre-shuffled to pass order
        order = _deinterlace_rows(h)
        stream_idx = []
        for dst in order:
            stream_idx.extend(idx[dst * w : (dst + 1) * w])
        inter = encode_gif(w, h, stream_idx, pal, interlace=True)
        got_i = decode_gif_raster(inter)
        assert got_i is not None and np.array_equal(got_i[2], exp)
