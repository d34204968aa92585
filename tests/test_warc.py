"""WARC.gz ingestion tests — no Spark.

Reference scope note: the reference repo has no web ingestion; this
is builder's-brief LLM-pipeline surface (operators/warc.py — the
Common Crawl wire format: one gzip member per record, version line +
headers + Content-Length-framed payload + CRLF CRLF trailer).
"""

from __future__ import annotations

import random
import zlib

from synthea_etl_spark.operators.warc import encode_warc_gz, parse_warc_gz


def _gz(member: bytes) -> bytes:
    co = zlib.compressobj(6, zlib.DEFLATED, 31)
    return co.compress(member) + co.flush()


def test_multi_member_roundtrip():
    recs = [
        {"type": "response", "uri": "http://a/0", "payload": b"hello world"},
        {"type": "request", "uri": "http://a/1", "payload": b""},
        {"type": "metadata", "payload": bytes(range(256))},  # binary, no uri
    ]
    out = parse_warc_gz(encode_warc_gz(recs))
    assert out is not None and len(out) == 3
    assert out[0] == {
        "type": "response", "uri": "http://a/0",
        "content_length": 11, "payload": b"hello world",
    }
    assert out[1]["content_length"] == 0
    assert out[2]["uri"] is None and out[2]["payload"] == bytes(range(256))


def test_framing_strict_rejects():
    good = encode_warc_gz([{"payload": b"x"}])
    assert parse_warc_gz(good[: len(good) // 2]) is None  # truncated member
    assert parse_warc_gz(b"") is None
    # payload shorter than Content-Length
    assert parse_warc_gz(_gz(
        b"WARC/1.0\r\nContent-Length: 100\r\n\r\nshort\r\n\r\n"
    )) is None
    # missing CRLF CRLF trailer
    assert parse_warc_gz(_gz(
        b"WARC/1.0\r\nContent-Length: 2\r\n\r\nab"
    )) is None
    # unknown version
    assert parse_warc_gz(_gz(
        b"WARC/9.9\r\nContent-Length: 0\r\n\r\n\r\n\r\n"
    )) is None
    # header line without a colon
    assert parse_warc_gz(_gz(
        b"WARC/1.0\r\nContent-Length: 0\r\nnotaheader\r\n\r\n\r\n\r\n"
    )) is None
    # missing Content-Length entirely
    assert parse_warc_gz(_gz(
        b"WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n"
    )) is None


def test_gzip_bomb_capped():
    """A ~130 KB member declaring a 128 MiB payload must be refused by
    the bounded inflate, not allocated."""
    big = b"A" * (1 << 27)
    member = (
        b"WARC/1.0\r\nContent-Length: " + str(len(big)).encode()
        + b"\r\n\r\n" + big + b"\r\n\r\n"
    )
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb = co.compress(member) + co.flush()
    assert len(bomb) < 1 << 18
    assert parse_warc_gz(bomb) is None


def test_fuzz_never_raises():
    base = encode_warc_gz(
        [{"uri": f"http://x/{i}", "payload": b"p" * i} for i in range(5)]
    )
    rng = random.Random(6)
    for _ in range(300):
        ba = bytearray(base)
        for _k in range(rng.randint(1, 4)):
            ba[rng.randrange(len(ba))] = rng.randrange(256)
        r = parse_warc_gz(bytes(ba))
        assert r is None or isinstance(r, list)
    for cut in range(0, len(base), 13):
        r = parse_warc_gz(base[:cut])
        assert r is None or isinstance(r, list)
