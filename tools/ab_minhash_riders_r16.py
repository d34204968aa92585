"""Interleaved A/B of the MinHash rider QUERIES under the expression
vs Arrow signature implementations (r16). One session, arms alternated
per rep (monkeypatching dedup.minhash_signature — every rider resolves
it through the module attribute), noop sink, all walls recorded.

Usage: python tools/ab_minhash_riders_r16.py [--sf-dir ...] [--reps 4]
       [--out bench_artifacts/ab_minhash_riders_r16.json] [names ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import synthea_etl_spark.operators.dedup as D  # noqa: E402
from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

RIDERS = [
    "q33_minhash_lsh_candidates",
    "q158_incremental_minhash",
    "q209_incremental_clusters",
    "q214_split_leakage_audit",
    "q235_memorization_risk",
    "q238_filter_threshold_sweep",
    "q244_dedup_axis_funnel",
    "q249_lsh_verified_pairs",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument(
        "--out", default="bench_artifacts/ab_minhash_riders_r16.json"
    )
    ap.add_argument("names", nargs="*", default=RIDERS)
    args = ap.parse_args()
    spark = get_session("ab_minhash_riders_r16")
    qs = all_queries()
    arrow_impl = D.minhash_signature
    expr_impl = D._minhash_signature_expr
    walls: dict[str, dict[str, list[float]]] = {
        n: {"expr": [], "arrow": []} for n in args.names
    }
    for rep in range(args.reps):
        for name in args.names:
            for arm, impl in (("expr", expr_impl), ("arrow", arrow_impl)):
                D.minhash_signature = impl
                spark.sparkContext.setJobDescription(f"{name} {arm} rep{rep}")
                t0 = time.time()
                qs[name].fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                walls[name][arm].append(round(time.time() - t0, 3))
            print(name, walls[name], flush=True)
    D.minhash_signature = arrow_impl
    spark.sparkContext.setJobDescription(None)
    result = {
        "sf_dir": args.sf_dir,
        "walls": walls,
        "best": {
            n: {a: min(v) for a, v in arms.items()}
            for n, arms in walls.items()
        },
    }
    print(json.dumps(result["best"], indent=1), flush=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
