"""WebDataset-style tar shard sink for training-data export.

LLM training loaders (WebDataset, Mosaic StreamingDataset, and kin)
consume corpora as sequences of tar "shards", each holding a few
thousand samples as members named ``<key>.<ext>``. This operator
packs a (id, payload[, text]) frame into such shards with three
properties the 100 TB regime needs:

- **Deterministic placement**: shard index = id // docs_per_shard —
  a pure function of the sample key, never of partitioning, so two
  runs (or a re-run after failure) produce byte-identical shards.
- **Deterministic bytes**: tar members are emitted in sorted key
  order with zeroed mtime/uid/gid/uname, so a shard's sha256 is
  reproducible and shards can be diffed/cached by content.
- **Bounded memory**: one shard is built per applyInPandas group
  (docs_per_shard x payload size), and groups distribute across
  executors by shard id — thousands of shards write in parallel,
  no driver involvement, no global sort.

The reference (Glue_Scripts/*.py) has no export surface; this is
beyond-reference LLM-pipeline scope (BASELINE.json north star).
"""

from __future__ import annotations

import hashlib
import io
import os
import tarfile

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_SCHEMA = (
    "shard_id long, n_docs long, payload_bytes long, tar_sha256 string"
)


def _build_tar(rows: list[tuple[int, bytes]]) -> bytes:
    """Deterministic in-memory tar: members sorted by key, metadata
    zeroed. ``rows`` is [(id, payload_bytes)]."""
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tar:
        for key, payload in sorted(rows):
            info = tarfile.TarInfo(name=f"{key:012d}.bin")
            info.size = len(payload)
            info.mtime = 0
            info.uid = info.gid = 0
            info.uname = info.gname = ""
            tar.addfile(info, io.BytesIO(payload))
    return buf.getvalue()


def write_webdataset_shards(
    df: DataFrame,
    out_dir: str,
    docs_per_shard: int = 1000,
    id_col: str = "id",
    payload_col: str = "payload",
) -> DataFrame:
    """Pack ``df`` into tar shards under ``out_dir`` and return the
    manifest (one row per shard: id, doc count, payload byte total,
    tar sha256). The write happens inside the returned plan's
    applyInPandas stage — call an action on the manifest (or write it
    somewhere) to execute, exactly like foreachBatch sinks. Shard
    files are ``shard-%09d.tar``; existing files are overwritten, so
    re-running after a partial failure converges to the same bytes
    (idempotent by determinism, the same exactly-once argument as
    write_swap)."""
    shard = (F.col(id_col).cast("long") / docs_per_shard).cast("long")

    def pack(pdf):
        import pandas as pd

        sid = int(pdf["_shard_id"].iloc[0])
        rows = [
            (int(i), bytes(p)) for i, p in zip(pdf[id_col], pdf[payload_col])
        ]
        blob = _build_tar(rows)
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, f".shard-{sid:09d}.tar.tmp")
        final = os.path.join(out_dir, f"shard-{sid:09d}.tar")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, final)  # atomic publish, posix rename
        return pd.DataFrame(
            {
                "shard_id": [sid],
                "n_docs": [len(rows)],
                "payload_bytes": [sum(len(p) for _, p in rows)],
                "tar_sha256": [hashlib.sha256(blob).hexdigest()],
            }
        )

    return (
        df.select(F.col(id_col), F.col(payload_col), shard.alias("_shard_id"))
        .groupBy("_shard_id")
        .applyInPandas(pack, schema=MANIFEST_SCHEMA)
    )
