"""Store-write file-layout probe (VERDICT r15 item 5): measure what the
§6 `hint("rebalance")`-before-partitionBy discipline actually does to
the persisted store — file count, bytes/file — and what the READ path
pays for each layout. Both code paths are exercised here directly
(with/without the hint on an identical frame), mirroring the dedup
store family / ingest-stream writes.

The frame mirrors a band-index store row (doc_id, band, bh, batch_id):
~50 B/row, partitioned by batch_id — the near-dedup ingest shape.

Usage: python tools/store_layout_probe_r16.py [--sf-dir ...] [--reps 3]
       [--out bench_artifacts/store_layout_probe_r16.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    banded_signatures,
    minhash_signature,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def layout(path: str) -> dict:
    files = []
    for root, _dirs, names in os.walk(path):
        for n in names:
            if n.endswith(".parquet"):
                files.append(os.path.getsize(os.path.join(root, n)))
    return {
        "n_files": len(files),
        "total_bytes": sum(files),
        "mean_bytes_per_file": int(sum(files) / max(1, len(files))),
        "min_bytes": min(files) if files else 0,
        "max_bytes": max(files) if files else 0,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--out", default="bench_artifacts/store_layout_probe_r16.json"
    )
    args = ap.parse_args()
    spark = get_session("store_layout_probe_r16")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    bands = (
        banded_signatures(
            minhash_signature(docs, "text", "doc_id", 32, 3), "doc_id", 32, 8
        )
        .withColumn("batch_id", (F.col("doc_id") % 4).cast("int"))
        .localCheckpoint()  # identical input rows for both arms
    )
    root = tempfile.mkdtemp(prefix="sparkgraft_store_probe_")
    result: dict = {"sf_dir": args.sf_dir, "arms": {}}
    try:
        for arm in ("no_hint", "rebalance"):
            path = os.path.join(root, arm)
            df = bands.hint("rebalance") if arm == "rebalance" else bands
            t0 = time.time()
            df.write.mode("overwrite").partitionBy("batch_id").parquet(path)
            write_wall = round(time.time() - t0, 3)
            reads = []
            for _ in range(args.reps):
                t0 = time.time()
                (
                    spark.read.parquet(path)
                    .groupBy("band")
                    .agg(F.count("*"), F.countDistinct("bh"))
                    .write.format("noop")
                    .mode("overwrite")
                    .save()
                )
                reads.append(round(time.time() - t0, 3))
            result["arms"][arm] = {
                "layout": layout(path),
                "write_wall": write_wall,
                "read_walls": reads,
                "read_best": min(reads),
            }
            print(arm, result["arms"][arm], flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
