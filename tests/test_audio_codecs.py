"""Compressed-audio codec tests (G.711 + IMA ADPCM) — no Spark.

Load-bearing properties:

- G.711 value-level round trip on ALL 256 code points per law
  (mu-law's dual zero — 0x7F is negative zero — re-encodes to 0xFF,
  the one spec-sanctioned non-identity).
- IMA ADPCM state-machine agreement: the decoder reproduces the
  encoder's internal predictor sequence EXACTLY, nibble for nibble —
  this pins the step/index tables and clamping in both directions at
  once, independent of how lossy the quantization is.
- The q139 oracle invariant: constant blocks encode to all-zero
  nibbles and decode to the constant exactly.

Reference scope note: the reference repo has no media code; this is
builder's-brief multimodal surface.
"""

from __future__ import annotations

import random

import numpy as np

from synthea_etl_spark.operators.audio_codecs import (
    IMA_STEP_TABLE,
    _ima_encode_sample,
    alaw_to_linear,
    decode_ima_adpcm,
    encode_ima_adpcm,
    encode_wav_g711,
    encode_wav_ima_adpcm,
    linear_to_alaw,
    linear_to_ulaw,
    ulaw_to_linear,
)
from synthea_etl_spark.operators.multimodal import parse_wav


def test_g711_roundtrip_all_codes():
    for b in range(256):
        rb = linear_to_ulaw(int(ulaw_to_linear(bytes([b]))[0]))
        assert rb == b or (b == 0x7F and rb == 0xFF)
        assert linear_to_alaw(int(alaw_to_linear(bytes([b]))[0])) == b


def test_g711_anchor_values():
    """Public spec anchors in the 16-bit linear domain: mu-law 0xFF
    is +0 and 0x7F negative zero; mu-law max magnitude is +/-32124
    (codes 0x80/0x00); A-law min magnitude is 8 (code 0xD5), max
    32256 (code 0xAA); sign conventions are opposite between laws."""
    assert int(ulaw_to_linear(bytes([0xFF]))[0]) == 0
    assert int(ulaw_to_linear(bytes([0x7F]))[0]) == 0  # negative zero
    assert int(ulaw_to_linear(bytes([0x80]))[0]) == 32124
    assert int(ulaw_to_linear(bytes([0x00]))[0]) == -32124
    assert int(alaw_to_linear(bytes([0xD5]))[0]) == 8
    assert int(alaw_to_linear(bytes([0x55]))[0]) == -8
    assert int(alaw_to_linear(bytes([0xAA]))[0]) == 32256
    assert int(alaw_to_linear(bytes([0x2A]))[0]) == -32256


def test_g711_monotone_on_positive_codes():
    """Within each law, decoded magnitude is monotone in the code's
    segment/mantissa ordering — a cheap whole-table sanity that would
    catch a transposed shift or bias."""
    ulaw_pos = [int(ulaw_to_linear(bytes([b]))[0]) for b in range(0xFF, 0x7F, -1)]
    assert all(a <= b for a, b in zip(ulaw_pos, ulaw_pos[1:]))
    alaw_pos = sorted(
        int(alaw_to_linear(bytes([b]))[0]) for b in range(0x80, 0x100)
    )
    assert all(v > 0 for v in alaw_pos)


def test_g711_wav_means_exact():
    for law in ("ulaw", "alaw"):
        expand = ulaw_to_linear if law == "ulaw" else alaw_to_linear
        b0, b1 = 37, 201
        w = encode_wav_g711(8000, [bytes([b0] * 5), bytes([b1] * 5)], law)
        assert parse_wav(w) == (
            2, 8000, 8, 5,
            [float(expand(bytes([b0]))[0]), float(expand(bytes([b1]))[0])],
        )


def test_adpcm_constant_block_is_exact():
    """The q139 oracle hook: constant input -> all-zero nibbles ->
    predictor held exactly (step_table[0] >> 3 == 0)."""
    data, ba = encode_ima_adpcm([[1234] * 17 * 3], 17)
    # nibble bytes after each 4-byte header must be zero
    for off in range(0, len(data), ba):
        assert data[off + 4 : off + ba] == b"\x00" * (ba - 4)
    dec = decode_ima_adpcm(data, 1, ba)
    assert dec.shape == (51, 1) and set(dec[:, 0].tolist()) == {1234}
    w = encode_wav_ima_adpcm(8000, [[1234] * 17 * 3], 17)
    assert parse_wav(w) == (1, 8000, 4, 51, [1234.0])


def test_adpcm_state_machine_agreement():
    """Decoder output == encoder-internal predictor sequence, exactly,
    for arbitrary signals, mono and stereo, any initial index."""
    rng = random.Random(5)
    n = 1 + 8 * 25
    for nch, idxs in ((1, [0]), (2, [3, 88]), (2, [17, 0])):
        chans = [
            [rng.randint(-32768, 32767) for _ in range(n)] for _ in range(nch)
        ]
        expected = []
        for c in range(nch):
            pred, ix = chans[c][0], idxs[c]
            seq = [pred]
            for s in chans[c][1:]:
                _nib, pred, ix = _ima_encode_sample(s, pred, ix)
                seq.append(pred)
            expected.append(seq)
        data, ba = encode_ima_adpcm(chans, n, init_indexes=idxs)
        dec = decode_ima_adpcm(data, nch, ba)
        for c in range(nch):
            assert dec[:, c].tolist() == expected[c]


def test_adpcm_tracks_smooth_signal_after_warmup():
    n = 1 + 8 * 20
    sig = [int(10000 * np.sin(i / 10)) for i in range(n)]
    data, ba = encode_ima_adpcm([sig], n)
    dec = decode_ima_adpcm(data, 1, ba)[:, 0]
    err = np.abs(np.asarray(sig) - dec)
    # cold start from index 0 slews; after adaptation the quantizer
    # stays within a few steps of the source
    assert err[60:].max() < 1000


def test_adpcm_strict_reject():
    data, ba = encode_ima_adpcm([[0] * 17], 17)
    bad = bytearray(data)
    bad[2] = 99  # step index > 88
    assert decode_ima_adpcm(bytes(bad), 1, ba) is None
    assert decode_ima_adpcm(data[:-1], 1, ba) is None  # ragged block
    # WAV-level: tag 0x11 with wrong bits is refused
    w = bytearray(encode_wav_ima_adpcm(8000, [[0] * 17], 17))
    i = w.find(b"fmt ")
    w[i + 8 + 14] = 8  # bits 4 -> 8
    assert parse_wav(bytes(w)) is None


def test_g711_wav_strict_reject():
    w = bytearray(encode_wav_g711(8000, [bytes([1, 2, 3])], "ulaw"))
    i = w.find(b"fmt ")
    w[i + 8 + 14] = 16  # bits 8 -> 16 under tag 7: invalid
    assert parse_wav(bytes(w)) is None
    # unsupported compressed tag (MPEG, 0x50) still refused
    w2 = bytearray(encode_wav_g711(8000, [bytes([1, 2, 3])], "ulaw"))
    w2[i + 8] = 0x50
    assert parse_wav(bytes(w2)) is None
