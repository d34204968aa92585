"""Interleaved A/B: expression MinHash pipeline vs the r16 Arrow pass.

Method (the r15 adjudication discipline — this box's cross-process
walls are too noisy to compare): ONE session, inputs pre-materialized
(localCheckpoint) so both arms read identical RDD blocks, arms
alternated per rep, noop sink, best + all walls recorded. Also verifies
bit-equality of the two arms' outputs on the bench corpus before
timing, and times the banded (signature -> lsh_candidates) composite
that q33/q209 actually run.

Usage: python tools/ab_minhash_r16.py [--sf-dir /root/testdata/sf0.1]
       [--reps 5] [--stack 10] [--out bench_artifacts/ab_minhash_r16.json]

--stack N unions the corpus N times with distinct ids (doc_id offset),
approximating a larger SF for CPU-bound per-shingle work without
changing text content.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    _minhash_signature_expr,
    lsh_candidates,
    minhash_signature,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def noop(df) -> float:
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--stack", type=int, default=1)
    ap.add_argument(
        "--out", default="bench_artifacts/ab_minhash_r16.json"
    )
    args = ap.parse_args()
    spark = get_session("ab_minhash_r16")
    docs = spark.read.parquet(f"{args.sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    if args.stack > 1:
        n = docs.agg(F.max("doc_id")).collect()[0][0] + 1
        parts = [
            docs.select(
                (F.col("doc_id") + F.lit(i * n)).alias("doc_id"), "text"
            )
            for i in range(args.stack)
        ]
        base = parts[0]
        for p in parts[1:]:
            base = base.unionByName(p)
        docs = base
    docs = docs.localCheckpoint()
    n_docs = docs.count()

    # bit-equality gate first (collect both, compare exactly)
    old_rows = {
        r["doc_id"]: tuple(r)[1:]
        for r in _minhash_signature_expr(docs, "text", "doc_id", 32, 3).collect()
    }
    new_rows = {
        r["doc_id"]: tuple(r)[1:]
        for r in minhash_signature(docs, "text", "doc_id", 32, 3).collect()
    }
    assert old_rows == new_rows, (
        f"MISMATCH: {len(old_rows)} old vs {len(new_rows)} new rows"
    )
    print(f"bit-equal on {len(old_rows)} signatures ({n_docs} docs)", flush=True)

    arms = {
        "sig_expr": lambda: _minhash_signature_expr(docs, "text", "doc_id", 32, 3),
        "sig_arrow": lambda: minhash_signature(docs, "text", "doc_id", 32, 3),
        "lsh_expr": lambda: lsh_candidates(
            _minhash_signature_expr(docs, "text", "doc_id", 32, 3), "doc_id", 32, 8
        ),
        "lsh_arrow": lambda: lsh_candidates(
            minhash_signature(docs, "text", "doc_id", 32, 3), "doc_id", 32, 8
        ),
    }
    walls: dict[str, list[float]] = {k: [] for k in arms}
    for rep in range(args.reps):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            walls[name].append(round(noop(fn()), 3))
    spark.sparkContext.setJobDescription(None)
    result = {
        "n_docs": n_docs,
        "stack": args.stack,
        "sf_dir": args.sf_dir,
        "walls": walls,
        "best": {k: min(v) for k, v in walls.items()},
        "bit_equal": True,
    }
    print(json.dumps(result, indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
