"""Progressive JPEG (SOF2) codec tests — no Spark session needed.

The load-bearing property is DIFFERENTIAL: ``encode_jpeg_progressive``
emits multi-scan SOF2 streams from the same quantized coefficients as
the baseline encoder, so ``decode_jpeg_samples`` must produce
bit-identical planes for both streams of the same image, across the
whole progression-parameter space (spectral band splits, DC/AC
successive-approximation depth, restart markers). That pins the
decoder's DC refinement (raw bits), AC first-scan EOB runs, and the
AC correction-bit refinement algorithm against an independent
implementation of the same spec (the encoder), on inputs where every
coefficient path — ZRL, EOBRUN>1, interleaved history/newly-
significant refinement — actually fires.

Reference scope note: the reference repo has no image code
(Glue_Scripts/ is boto3+DataFrame ETL only); this is builder's-brief
multimodal surface.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from synthea_etl_spark.operators.jpeg import (
    decode_jpeg_pixels,
    decode_jpeg_samples,
    encode_jpeg,
    encode_jpeg_progressive,
    rgb_to_ycc,
    ycc_to_rgb,
)


def _random_image(rng: random.Random, w: int, h: int):
    # mix of flat runs (exercise EOB runs) and noise (exercise AC paths)
    px = []
    for _ in range(w * h):
        if rng.random() < 0.3:
            v = rng.randrange(256)
            px.append((v, v, v))
        else:
            px.append(
                (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            )
    return px


def _assert_same(base: bytes, prog: bytes):
    db = decode_jpeg_samples(base)
    dp = decode_jpeg_samples(prog)
    assert db is not None and dp is not None
    assert db[0] == dp[0] and db[1] == dp[1]
    for a, b in zip(db[2], dp[2]):
        assert np.array_equal(a, b)


def test_progressive_equals_baseline_across_scripts():
    """The headline differential: every progression script decodes to
    the same planes as the baseline stream of the same image."""
    rng = random.Random(7)
    for trial in range(60):
        w = 8 * rng.randint(1, 3)
        h = 8 * rng.randint(1, 3)
        gray = rng.random() < 0.5
        quant = rng.choice([1, 2, 8, 16, 40])
        ri = rng.choice([0, 0, 1, 2, 3])
        kw = dict(
            dc_al=rng.choice([0, 1, 2]),
            ac_al=rng.choice([0, 1, 2, 3]),
            band_split=rng.choice([1, 2, 6, 33, 63]),
        )
        px = _random_image(rng, w, h)
        base = encode_jpeg(w, h, px, gray=gray, quant=quant, restart_interval=ri)
        prog = encode_jpeg_progressive(
            w, h, px, gray=gray, quant=quant, restart_interval=ri, **kw
        )
        _assert_same(base, prog)


def test_eobrun_gt_one_and_zrl_paths():
    """Force the EOBRUN>1 extra-bits path (15 all-zero-AC blocks before
    one with content -> EOBn with r>0) and long zero runs inside a
    block (ZRL in both first and refinement AC scans)."""
    rng = random.Random(11)
    w, h = 8 * 16, 8  # 16 blocks in a row
    px = [(60, 60, 60)] * (w * h)
    # last block: one bright pixel -> nonzero high-frequency ACs with
    # long zero runs; every earlier block solid -> 15-block EOB run
    idx = 7 * w + (w - 1)
    px[idx] = (250, 10, 200)
    for ac_al in (0, 2):
        base = encode_jpeg(w, h, px, quant=2)
        prog = encode_jpeg_progressive(w, h, px, quant=2, ac_al=ac_al, dc_al=1)
        _assert_same(base, prog)
    # sparse noise across many blocks: refinement scans interleave
    # history coefficients, newly-significant ones, and EOB runs
    px = [(128, 128, 128)] * (w * h)
    for _ in range(40):
        px[rng.randrange(w * h)] = (
            rng.randrange(256), rng.randrange(256), rng.randrange(256)
        )
    base = encode_jpeg(w, h, px, quant=1)
    prog = encode_jpeg_progressive(w, h, px, quant=1, ac_al=3, dc_al=2)
    _assert_same(base, prog)


def test_solid_constructions_are_exact():
    """The q137 gate arithmetic: solid 8x8 blocks survive the full
    successive-approximation ladder bit-for-bit (only DC nonzero; DC
    quantizes losslessly at quant 8), so decoded means equal the
    closed-form the DuckDB oracle computes."""
    for doc_id in (0, 1, 2, 3, 5, 6, 12, 101, 997):
        kw = dict(
            dc_al=doc_id % 3,
            ac_al=doc_id % 4,
            band_split=(1, 6, 33)[doc_id % 3],
            restart_interval=1 if doc_id % 6 == 0 else 0,
        )
        if doc_id % 2 == 0:
            v0, v1 = doc_id % 251, (doc_id * 3 + 17) % 251
            pix = [
                ((v0 if x < 8 else v1),) * 3 for _ in range(8) for x in range(16)
            ]
            got = decode_jpeg_pixels(
                encode_jpeg_progressive(16, 8, pix, gray=True, **kw)
            )
            assert got == (16, 8, (v0 + v1) / 2, (v0 + v1) / 2, (v0 + v1) / 2)
        else:
            rgb = (doc_id % 256, (doc_id * 5 + 3) % 256, (doc_id * 11 + 7) % 256)
            got = decode_jpeg_pixels(
                encode_jpeg_progressive(8, 8, [rgb] * 64, **kw)
            )
            y, cb, cr = rgb_to_ycc(*(np.array([c]) for c in rgb))
            er, eg, eb = ycc_to_rgb(y, cb, cr)
            assert got == (8, 8, float(er[0]), float(eg[0]), float(eb[0]))


def test_truncation_and_bitflip_never_raise():
    """Adversarial posture parity with the baseline decoder: any
    truncation or corruption of a progressive stream returns None or
    a decoded tuple — never an exception, never a giant allocation."""
    rng = random.Random(3)
    px = _random_image(rng, 16, 16)
    good = encode_jpeg_progressive(
        16, 16, px, dc_al=1, ac_al=2, restart_interval=2
    )
    for cut in range(0, len(good), 5):
        r = decode_jpeg_samples(good[:cut])
        assert r is None or isinstance(r, tuple)
    for _ in range(300):
        ba = bytearray(good)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = decode_jpeg_samples(bytes(ba))
        assert r is None or isinstance(r, tuple)


def test_progressive_rejects_malformed_scan_shapes():
    """Spec posture: AC scans must be non-interleaved, DC and AC bands
    may not mix, successive approximation must step one bit. A
    baseline stream with its SOF marker flipped to SOF2 becomes
    exactly such a malformed stream (interleaved full-band scan) and
    must return None."""
    b = bytearray(encode_jpeg(8, 8, [(10, 20, 30)] * 64))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    assert decode_jpeg_samples(bytes(b)) is None

    # Ah stepping by 2 is rejected: patch a real progressive stream's
    # first AC refinement scan header (Ah<<4|Al byte)
    good = bytearray(
        encode_jpeg_progressive(8, 8, [(9, 9, 9)] * 64, gray=True, ac_al=2)
    )
    # find an SOS whose AhAl byte is 0x21 (Ah=2, Al=1) and bump Ah
    pos = 0
    patched = False
    while True:
        j = good.find(b"\xff\xda", pos)
        if j < 0:
            break
        seglen = int.from_bytes(good[j + 2 : j + 4], "big")
        ahal = j + 2 + seglen - 1
        if good[ahal] == 0x21:
            good[ahal] = 0x31  # Ah=3, Al=1: skips a bit plane
            patched = True
            break
        pos = j + 2
    assert patched
    assert decode_jpeg_samples(bytes(good)) is None


def test_progressive_multiple_frames_rejected():
    """Two SOF segments in one stream is not valid T.81; the decoder
    must not silently reinterpret the second frame."""
    a = encode_jpeg_progressive(8, 8, [(5, 5, 5)] * 64, gray=True)
    i = a.find(b"\xff\xc2")
    seglen = int.from_bytes(a[i + 2 : i + 4], "big")
    sof = a[i : i + 2 + seglen]
    doubled = a[: i + 2 + seglen] + sof + a[i + 2 + seglen :]
    assert decode_jpeg_samples(doubled) is None


@pytest.mark.parametrize("gray", [True, False])
def test_pure_spectral_selection_no_approximation(gray):
    """dc_al=0/ac_al=0 degenerates to spectral selection only — no
    refinement scans at all — and still matches baseline."""
    rng = random.Random(19)
    px = _random_image(rng, 24, 8)
    base = encode_jpeg(24, 8, px, gray=gray, quant=4)
    prog = encode_jpeg_progressive(
        24, 8, px, gray=gray, quant=4, dc_al=0, ac_al=0, band_split=6
    )
    _assert_same(base, prog)


# ---------------------------------------------------------------------------
# chroma subsampling (sequential path)
# ---------------------------------------------------------------------------


def test_subsampled_constant_color_roundtrips_exactly():
    """4:2:0 / 4:2:2: constant-color images survive the box-average
    downsample + replication upsample bit-for-bit (the q154 oracle
    argument)."""
    for sub, w, h in (("420", 16, 16), ("422", 16, 8), ("420", 32, 16)):
        rgb = (200, 35, 90)
        got = decode_jpeg_pixels(
            encode_jpeg(w, h, [rgb] * (w * h), subsampling=sub)
        )
        y, cb, cr = rgb_to_ycc(*(np.array([c]) for c in rgb))
        er, eg, eb = ycc_to_rgb(y, cb, cr)
        assert got == (w, h, float(er[0]), float(eg[0]), float(eb[0]))


def test_subsampled_planes_match_reference_pipeline():
    """Random images at quant=1: decoded Y tracks the source within
    DCT rounding, and decoded chroma equals an independently computed
    replicate(floor_half(boxmean(chroma))) within the same bound —
    pins MCU interleave geometry, per-component DC predictors, and
    the upsampling convention."""
    from synthea_etl_spark.operators.jpeg import _floor_half

    rng = random.Random(51)
    for sub, hs, vs in (("420", 2, 2), ("422", 2, 1)):
        w, h = 16, 16
        px = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(w * h)
        ]
        arr = np.array(px, np.int64).reshape(h, w, 3)
        y, cb, cr = rgb_to_ycc(arr[:, :, 0], arr[:, :, 1], arr[:, :, 2])
        dec = decode_jpeg_samples(encode_jpeg(w, h, px, quant=1, subsampling=sub))
        assert dec is not None and dec[:2] == (w, h)
        planes = dec[2]
        assert all(p.shape == (h, w) for p in planes)

        def expect_chroma(p):
            d = _floor_half(
                p.astype(np.float64)
                .reshape(h // vs, vs, w // hs, hs)
                .mean(axis=(1, 3))
            ).astype(np.int64)
            return np.repeat(np.repeat(d, vs, axis=0), hs, axis=1)

        assert np.abs(planes[0] - y).max() <= 1
        assert np.abs(planes[1] - expect_chroma(cb)).max() <= 1
        assert np.abs(planes[2] - expect_chroma(cr)).max() <= 1


def test_subsampled_with_restarts_and_fuzz():
    rng = random.Random(7)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(32 * 32)
    ]
    base = encode_jpeg(32, 32, px, subsampling="420", restart_interval=2)
    assert decode_jpeg_pixels(base) is not None
    for _ in range(200):
        ba = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = decode_jpeg_samples(bytes(ba))
        assert r is None or isinstance(r, tuple)
    for cut in range(0, len(base), 17):
        r = decode_jpeg_samples(base[:cut])
        assert r is None or isinstance(r, tuple)


def test_444_streams_unchanged_by_subsampling_support():
    """subsampling='444' must emit byte-identical streams to the
    historical encoder (the progressive differential and all prior
    oracles depend on it)."""
    rng = random.Random(3)
    px = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(64)
    ]
    a = encode_jpeg(8, 8, px)
    b = encode_jpeg(8, 8, px, subsampling="444")
    assert a == b


def test_subsampled_odd_dims_crop():
    """Real photos are rarely MCU multiples: a 4:2:0 stream whose SOF
    declares 20x18 inside a 2x2-MCU grid must crop every plane to the
    declared dims (the encoder twin can't emit this shape, so the
    stream is synthesized by patching a 32x32 stream's SOF)."""
    b = bytearray(
        encode_jpeg(32, 32, [(100, 50, 200)] * 1024, subsampling="420")
    )
    i = b.find(b"\xff\xc0")
    b[i + 5 : i + 7] = (18).to_bytes(2, "big")
    b[i + 7 : i + 9] = (20).to_bytes(2, "big")
    d = decode_jpeg_samples(bytes(b))
    assert d is not None and (d[0], d[1]) == (20, 18)
    assert all(p.shape == (18, 20) for p in d[2])
    # solid color: every cropped sample still the exact round trip
    y, cb, cr = rgb_to_ycc(*(np.array([c]) for c in (100, 50, 200)))
    assert set(d[2][0].flat) == {int(y[0])}
