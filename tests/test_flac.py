"""FLAC codec tests — no Spark.

The load-bearing property is LOSSLESSNESS: decode(encode(x)) must
equal x bit-exactly for arbitrary signals across every subframe type,
stereo decorrelation mode, partition order, escape, and wasted-bits
combination the encoder can emit. CRC-8/CRC-16 strictness and
truncation/corruption fuzz mirror the other decoders' posture.

Reference scope note: the reference repo has no media code; this is
builder's-brief multimodal surface (operators/flac.py).
"""

from __future__ import annotations

import random

import numpy as np

from synthea_etl_spark.operators.flac import (
    crc8,
    crc16,
    decode_flac,
    encode_flac,
)


def test_crc_check_vectors():
    """Public check values: CRC-8 poly 0x07 of '123456789' is 0xF4;
    CRC-16 poly 0x8005 MSB-first (unreflected, init 0) is 0xFEE8."""
    assert crc8(b"123456789") == 0xF4
    assert crc16(b"123456789") == 0xFEE8


def _roundtrip(chans, **kw):
    f = encode_flac(44100, chans, **kw)
    d = decode_flac(f)
    assert d is not None
    sr, bits, nch, samples = d
    assert sr == 44100 and nch == len(chans)
    assert np.array_equal(samples, np.array(chans, dtype=np.int64).T)


def test_lossless_roundtrip_all_modes():
    rng = random.Random(9)
    for trial in range(60):
        nch = rng.choice([1, 2])
        bits = rng.choice([8, 16])
        n = rng.choice([1, 5, 192, 200, 256, 300, 517])
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        kind = rng.choice(["noise", "ramp", "const", "sine"])

        def mk():
            if kind == "noise":
                return [rng.randint(lo, hi) for _ in range(n)]
            if kind == "ramp":
                return [(lo + i) % (hi - lo + 1) + lo for i in range(n)]
            if kind == "const":
                v = rng.randint(lo, hi)
                return [v] * n
            return [int((hi // 2) * np.sin(i / 9)) for i in range(n)]

        chans = [mk() for _ in range(nch)]
        stereo = "independent" if nch == 1 else rng.choice(
            ["independent", "left_side", "right_side", "mid_side"]
        )
        mode = rng.choice(
            ["auto", "verbatim", "fixed0", "fixed1", "fixed2",
             "fixed3", "fixed4", "lpc2"]
        )
        _roundtrip(
            chans, bits=bits, block_size=rng.choice([192, 256]),
            stereo_mode=stereo, subframe_mode=mode,
            partition_order=rng.choice([0, 1, 2]),
        )


def test_partitions_escape_and_wasted_bits():
    """The residual-coding corners: partition order > 0 (including the
    per-frame clamp on short trailing frames), raw-bits escape
    partitions, and wasted-bits subframes."""
    n = 300
    sig = [((i * 37) % 400) - 200 for i in range(n)]
    _roundtrip([sig], bits=16, block_size=128, subframe_mode="fixed2",
               partition_order=4)
    _roundtrip([sig], bits=16, block_size=128, subframe_mode="fixed2",
               escape_bits=18)
    shifted = [s << 3 for s in sig]
    _roundtrip([shifted], bits=16, block_size=128, subframe_mode="fixed2",
               wasted=3)
    # short trailing frame: 300 % 128 = 44 samples; order-4 partition
    # clamp and the verbatim fallback for order >= block both fire
    _roundtrip([sig[:129]], bits=16, block_size=128, subframe_mode="fixed4",
               partition_order=4)


def test_lpc_path_equals_fixed():
    """An LPC subframe with coefficients [2,-1]/shift 0 must decode
    identically to fixed order 2 — same predictor through a different
    stream encoding."""
    sig = [int(1000 * np.sin(i / 7)) for i in range(256)]
    a = decode_flac(encode_flac(8000, [sig], subframe_mode="fixed2"))
    b = decode_flac(encode_flac(8000, [sig], subframe_mode="lpc2"))
    assert a is not None and b is not None
    assert np.array_equal(a[3], b[3])


def test_multiframe_and_odd_blocksize():
    """Block size 32 is not a spec table code, so the header takes the
    16-bit blocksize-escape path; 100 samples make 4 frames with a
    short tail."""
    sig = [((i * 13) % 256) - 128 for i in range(100)]
    _roundtrip([sig], bits=16, block_size=32)


def test_crc_guards_and_strict_rejects():
    sig = [((i * 37) % 200) - 100 for i in range(300)]
    base = encode_flac(8000, [sig, sig[::-1]], bits=16, block_size=128,
                       stereo_mode="mid_side", subframe_mode="fixed2")
    # flip one entropy byte: CRC-16 must catch it -> None, never
    # silently wrong samples
    ba = bytearray(base)
    ba[len(ba) // 2] ^= 0x40
    assert decode_flac(bytes(ba)) is None
    assert decode_flac(b"fLaX" + base[4:]) is None
    assert decode_flac(base[:30]) is None


def test_fuzz_never_raises():
    sig = [((i * 37) % 200) - 100 for i in range(300)]
    base = encode_flac(8000, [sig], bits=16, block_size=128,
                       subframe_mode="lpc2", partition_order=2)
    rng = random.Random(4)
    for _ in range(400):
        ba = bytearray(base)
        for _k in range(rng.randint(1, 5)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = decode_flac(bytes(ba))
        assert r is None or isinstance(r, tuple)
    for cut in range(0, len(base), 7):
        r = decode_flac(base[:cut])
        assert r is None or isinstance(r, tuple)
