"""Time the corpus-overlap ANSWERING path against a prebuilt sketch
store — the evidence that q178's production form never rescans the
corpora: build per-slice bottom-k sketches once (the ingest-time
cost, reported separately), then answer the overlap question from
the stored k-row tables and time THAT. At any SF the answering wall
should be scheduling floor + a few k-row jobs, flat in corpus size.

Usage: python tools/sketch_store_probe.py [--sf-dir /tmp/sparkgraft_sf10]
           [--out bench_artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

import synthea_etl_spark.operators.dedup as D  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10")
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--out", default="bench_artifacts/sketch_store_probe.json")
    args = ap.parse_args()

    spark = get_session("sketch-store-probe")
    docs = spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
    n_docs = docs.count()
    store = tempfile.mkdtemp(prefix="sketch_store_probe_")

    # ingest-time path: each slice publishes its k-row sketch once
    t0 = time.time()
    for name, corp in (
        ("a", docs.filter(F.col("doc_id") % 3 != 2)),
        ("b", docs.filter(F.col("doc_id") % 3 != 0)),
    ):
        for parity in (0, 1):
            D.corpus_sketch_store(
                corp.filter(F.col("doc_id") % 2 == parity),
                os.path.join(store, name),
                slice_id=f"{name}{parity}",
                k=args.k,
            )
    build_wall = round(time.time() - t0, 2)

    # answering path: k-row reads only — timed alone, best-of-N
    def answer():
        ska = D.merge_bottomk_sketches(
            spark.read.parquet(os.path.join(store, "a")), k=args.k
        )
        skb = D.merge_bottomk_sketches(
            spark.read.parquet(os.path.join(store, "b")), k=args.k
        )
        return D.corpus_overlap_from_sketches(ska, skb, k=args.k).collect()[0]

    answer()  # warm
    best = float("inf")
    last = None
    for _ in range(args.runs):
        t0 = time.time()
        last = answer()
        best = min(best, time.time() - t0)

    report = {
        "sf_dir": args.sf_dir,
        "n_docs": n_docs,
        "k": args.k,
        "store_rows": spark.read.parquet(
            os.path.join(store, "a")
        ).count()
        + spark.read.parquet(os.path.join(store, "b")).count(),
        "build_wall_sec": build_wall,
        "answer_wall_sec_best": round(best, 3),
        "estimate": dict(zip(last.__fields__, [int(v) for v in last])),
    }
    spark.stop()
    shutil.rmtree(store, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
