"""Multimodal column plumbing: opaque binary payloads + typed metadata,
with decode/feature-extraction as Arrow-batched pandas stages
(beyond-reference surface; BASELINE.json north star).

Media (image/audio/video) is carried as a `binary` column plus a typed
metadata struct — the layout that works at 100 TB: payloads stay
columnar in parquet, metadata predicates (content_type, n_bytes,
width...) prune row groups WITHOUT touching payload bytes, and decode
runs distributed via mapInPandas (Arrow batches, bounded memory per
task via maxRecordsPerBatch).

The actual codec step is STUBBED: this container ships no image/audio
libraries, so ``decode_features`` raises NotImplementedError unless
``fake=True``, which substitutes a deterministic byte-level feature
extractor. The Spark-side plumbing — schema, batch shape, partition
behavior — is real and tested (tests/test_llm.py); swapping in PIL/
librosa later changes only the inner function body.
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
