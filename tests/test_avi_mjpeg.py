"""MJPEG-in-AVI compressed-video decode tests — no Spark.

Reference scope note: the reference repo has no media code; this is
builder's-brief multimodal surface (operators/avi.py + the MJPEG
default-Huffman convention in operators/jpeg.ensure_huffman_tables).
"""

from __future__ import annotations

import random

from synthea_etl_spark.operators.avi import (
    _remove_dht,
    encode_avi_mjpeg,
    parse_avi_mjpeg,
)
from synthea_etl_spark.operators.jpeg import (
    decode_jpeg_pixels,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _frames3():
    return [encode_jpeg(8, 8, [(10 * k + 5, 20, 30)] * 64) for k in range(3)]


def test_avi_frames_decode_in_movi_order():
    frames = _frames3()
    r = parse_avi_mjpeg(encode_avi_mjpeg(8, 8, frames))
    assert r is not None and (r[0], r[1]) == (8, 8) and len(r[2]) == 3
    for k in range(3):
        assert r[2][k] == decode_jpeg_pixels(frames[k])[2:]


def test_dht_less_frames_use_annex_k_defaults():
    """The MJPEG hardware convention: frames ship without DHT and the
    decoder supplies the standard tables — results must be identical
    to the with-tables stream."""
    frames = _frames3()
    with_tables = parse_avi_mjpeg(encode_avi_mjpeg(8, 8, frames))
    stripped_stream = _remove_dht(frames[0])
    assert b"\xff\xc4" not in stripped_stream.split(b"\xff\xda")[0]
    assert len(stripped_stream) < len(frames[0])
    without = parse_avi_mjpeg(encode_avi_mjpeg(8, 8, frames, strip_dht=True))
    assert without == with_tables


def test_progressive_frames_inside_avi():
    """Nothing restricts MJPEG frames to baseline here: the shared
    JPEG decoder handles SOF2 frames too."""
    pf = [encode_jpeg_progressive(8, 8, [(99, 50, 200)] * 64)]
    r = parse_avi_mjpeg(encode_avi_mjpeg(8, 8, pf))
    assert r is not None and r[2][0] == decode_jpeg_pixels(pf[0])[2:]


def test_avi_strict_rejects():
    frames = _frames3()
    avi = encode_avi_mjpeg(8, 8, frames)
    assert parse_avi_mjpeg(avi[:40]) is None  # truncated container
    # non-MJPG handler (both strh fccHandler and strf biCompression)
    bad = bytearray(avi)
    for _ in range(2):
        j = bad.find(b"MJPG")
        bad[j : j + 4] = b"H264"
    assert parse_avi_mjpeg(bytes(bad)) is None
    # container/frame dimension mismatch
    assert parse_avi_mjpeg(encode_avi_mjpeg(16, 8, frames)) is None


def test_avi_fuzz_never_raises():
    avi = encode_avi_mjpeg(8, 8, _frames3(), strip_dht=True)
    rng = random.Random(2)
    for _ in range(300):
        ba = bytearray(avi)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = parse_avi_mjpeg(bytes(ba))
        assert r is None or isinstance(r, tuple)
    for cut in range(0, len(avi), 11):
        r = parse_avi_mjpeg(avi[:cut])
        assert r is None or isinstance(r, tuple)
