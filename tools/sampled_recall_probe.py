"""Run the SAMPLED recall evals at corpus scale (round-9 VERDICT ask
#2, second half): the exact-truth sides of q202/q203 are quadratic by
design, so at sf10 (500k docs / 200k vectors) the full report is the
measurement the indexes exist to avoid — but with the operator-bounded
``sample_fraction`` knob the QA report must actually RUN there. This
probe runs both evals on an sf10 replica at a small deterministic
fraction and records walls, report sizes, and the recall summary the
report exists to produce.

Run it against the ORGANIC replica (gen_sf.py --organic) so the
sampled truth pairs are genuine near-dups with a mixed cluster-size
distribution, not tiling cliques.

Usage: python tools/sampled_recall_probe.py
       [--sf-dir /tmp/sparkgraft_sf10_organic] [--fraction 0.01]
       [--out bench_artifacts/sampled_recall_sf10_r10.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.plans.common import load  # noqa: E402
from synthea_etl_spark.plans.llm12 import (  # noqa: E402
    embedding_recall_eval,
    minhash_recall_eval,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def summarize(df, sim_col: str) -> dict:
    row = df.agg(
        F.count(F.lit(1)).alias("n_truth_pairs"),
        F.sum(F.col("caught").cast("long")).alias("n_caught"),
    ).collect()[0]
    n, c = row.n_truth_pairs, row.n_caught or 0
    return {
        "n_truth_pairs": n,
        "n_caught": c,
        "recall": (c / n) if n else None,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10_organic")
    ap.add_argument("--fraction", type=float, default=0.01)
    ap.add_argument(
        "--out", default="bench_artifacts/sampled_recall_sf10_r10.json"
    )
    args = ap.parse_args()

    spark = get_session("sampled_recall_probe")
    report = {"sf_dir": args.sf_dir, "sample_fraction": args.fraction}

    docs = load(spark, args.sf_dir, "documents")
    t0 = time.time()
    mh = minhash_recall_eval(docs, sample_fraction=args.fraction)
    report["minhash"] = {
        **summarize(mh, "jaccard"),
        "wall_sec": round(time.time() - t0, 2),
        "n_corpus_docs": docs.count(),
    }
    print("minhash:", json.dumps(report["minhash"]))

    vecs = load(spark, args.sf_dir, "embeddings")
    t0 = time.time()
    em = embedding_recall_eval(vecs, sample_fraction=args.fraction)
    report["embedding"] = {
        **summarize(em, "sim"),
        "wall_sec": round(time.time() - t0, 2),
        "n_corpus_vecs": vecs.count(),
    }
    print("embedding:", json.dumps(report["embedding"]))
    spark.stop()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
