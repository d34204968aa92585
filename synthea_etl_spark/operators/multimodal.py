"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas stages
(beyond-reference surface; BASELINE.json north star).

Media (image/audio/video) is carried as a `binary` column plus a typed
metadata struct — the layout that works at 100 TB: payloads stay
columnar in parquet, metadata predicates (content_type, n_bytes,
width...) prune row groups WITHOUT touching payload bytes, and decode
runs distributed via mapInPandas (Arrow batches, bounded memory per
task via maxRecordsPerBatch).

The pixel/sample-level codec step is STUBBED: this container ships no
image/audio libraries, so ``decode_features`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic byte-level feature extractor. The Spark-side plumbing —
schema, batch shape, partition behavior — is real and tested
(tests/test_llm.py); swapping in PIL/librosa later changes only the
inner function body.

Container-header metadata, by contrast, is REAL: ``parse_image_dims``
reads PNG/JPEG/GIF/BMP dimensions straight from the binary headers in
pure Python (no codec dependency), and ``image_metadata`` runs it
distributed over payload batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "id long, n_bytes long, mean_byte double, head_hex string, content_type string"
)


def attach_payload(df: DataFrame, text_col: str, id_col: str, content_type: str = "application/octet-stream") -> DataFrame:
    """Build a multimodal-shaped frame from a text column: payload =
    utf-8 bytes, metadata struct alongside. (Real pipelines read the
    bytes from object storage with `binaryFile` format — same shape.)"""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("id"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.lit(content_type).alias("content_type"),
        ).alias("meta"),
    )


def decode_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Distributed decode/feature-extract over payload bytes via
    mapInPandas (Arrow batches). With fake=True computes deterministic
    byte-level stand-in features; otherwise raises NotImplementedError
    at task level (no media codecs in this environment)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio codecs not present in "
                    "this environment; pass fake=True for the deterministic stub"
                )
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "mean_byte": payloads.map(
                        lambda b: (sum(b) / len(b)) if len(b) else 0.0
                    ),
                    "head_hex": payloads.map(lambda b: bytes(b[:8]).hex()),
                    "content_type": pdf["meta"].map(lambda m: m["content_type"]),
                }
            )

    return df.mapInPandas(extract, schema=FEATURE_SCHEMA)


# JPEG start-of-frame markers that carry dimensions. C4/C8/CC are
# huffman/arithmetic/extension tables, not frames.
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
# JPEG standalone markers with no length field (RSTn, SOI, EOI, TEM).
_JPEG_STANDALONE = frozenset(range(0xD0, 0xDA)) | {0x01}


def parse_image_dims(b: bytes) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) parsed from container headers in pure
    Python — PNG IHDR, JPEG SOF marker walk, GIF logical screen
    descriptor, BMP DIB header. No image codec involved: only the
    fixed-layout header bytes are read, so this is safe to run over
    arbitrary payloads at scale (returns (None, None, None) for
    anything unrecognized or truncated)."""
    b = bytes(b)
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(b[16:20], "big"),
            int.from_bytes(b[20:24], "big"),
        )
    if b[:2] == b"\xff\xd8":  # JPEG SOI; walk marker segments to a SOF
        pos = 2
        while pos + 1 < len(b):
            if b[pos] != 0xFF:
                return ("jpeg", None, None)  # corrupt stream
            marker = b[pos + 1]
            if marker == 0xFF:  # fill byte
                pos += 1
                continue
            if marker in _JPEG_STANDALONE:
                pos += 2
                continue
            if pos + 4 > len(b):
                break
            seg_len = int.from_bytes(b[pos + 2 : pos + 4], "big")
            if marker in _JPEG_SOF:
                # segment: len(2) precision(1) height(2) width(2)
                if pos + 9 > len(b):
                    break
                return (
                    "jpeg",
                    int.from_bytes(b[pos + 7 : pos + 9], "big"),
                    int.from_bytes(b[pos + 5 : pos + 7], "big"),
                )
            if seg_len < 2:
                return ("jpeg", None, None)
            pos += 2 + seg_len
        return ("jpeg", None, None)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        return (
            "gif",
            int.from_bytes(b[6:8], "little"),
            int.from_bytes(b[8:10], "little"),
        )
    if b[:2] == b"BM" and len(b) >= 26:
        return (
            "bmp",
            int.from_bytes(b[18:22], "little", signed=True),
            # negative height = top-down row order; magnitude is the size
            abs(int.from_bytes(b[22:26], "little", signed=True)),
        )
    return (None, None, None)


IMAGE_META_SCHEMA = (
    "id long, format string, width int, height int, n_bytes long"
)


def image_metadata(df: DataFrame) -> DataFrame:
    """REAL distributed image-metadata extraction: parse container
    dimensions from payload headers via ``parse_image_dims`` in
    Arrow-batched mapInPandas. Unlike ``decode_features`` this needs
    no codec — it reads fixed-layout header bytes only — so there is
    no ``fake`` flag; unrecognized payloads yield null format/dims."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [parse_image_dims(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "format": [p[0] for p in parsed],
                    "width": pd.array([p[1] for p in parsed], dtype="Int32"),
                    "height": pd.array([p[2] for p in parsed], dtype="Int32"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return df.mapInPandas(extract, schema=IMAGE_META_SCHEMA)


RESIZED_SCHEMA = (
    "id long, payload binary, "
    "meta struct<n_bytes: long, content_type: string, width: int, height: int>"
)


def resize_payloads(
    df: DataFrame, width: int, height: int, fake: bool = False
) -> DataFrame:
    """Distributed image resize: payload -> re-encoded payload +
    updated (width, height) metadata, 1-to-1 via mapInPandas. The
    codec is stubbed (no PIL here): fake=True substitutes a
    deterministic byte transform (truncate/cycle-pad to width*height
    bytes) so batch shape, output schema, and metadata propagation are
    exercised end-to-end; a real deployment replaces only the inner
    per-payload function with Image.open/resize/save."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv, absent here; "
                    "pass fake=True for the deterministic stub"
                )

            def fake_resize(b: bytes) -> bytes:
                if not len(b):
                    return bytes(target)
                reps = -(-target // len(b))  # ceil
                return (bytes(b) * reps)[:target]

            payload = pdf["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "payload": payload,
                    "meta": [
                        {
                            "n_bytes": len(p),
                            "content_type": m["content_type"],
                            "width": width,
                            "height": height,
                        }
                        for p, m in zip(payload, pdf["meta"])
                    ],
                }
            )

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = "id long, frame_idx int, frame binary, n_frames int"


def sample_frames(
    df: DataFrame,
    frame_bytes: int = 64,
    every_n: int = 4,
    fake: bool = False,
) -> DataFrame:
    """Distributed frame sampling: one input payload -> 0..k frame
    rows (1-to-many mapInPandas — output batches need not align with
    input rows). The decoder is stubbed: fake=True treats the payload
    as fixed-size byte frames and keeps every ``every_n``-th; a real
    deployment swaps in pyav/ffmpeg keyframe extraction with the same
    row-explosion shape."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires pyav/ffmpeg, absent here; "
                    "pass fake=True for the deterministic stub"
                )
            ids, idxs, frames, totals = [], [], [], []
            for i, b in zip(pdf["id"], pdf["payload"]):
                b = bytes(b)
                n = len(b) // frame_bytes
                for fi in range(0, n, every_n):
                    ids.append(i)
                    idxs.append(fi)
                    frames.append(b[fi * frame_bytes : (fi + 1) * frame_bytes])
                    totals.append(n)
            yield pd.DataFrame(
                {"id": ids, "frame_idx": idxs, "frame": frames, "n_frames": totals}
            )

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)
