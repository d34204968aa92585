"""Probe: q249's verify_sample_fraction knob on the DEGENERATE-CLIQUE
case (tiled sf1: near pairs are the majority, each paying near-full-
band Levenshtein DP — the round-13 honesty record measured 96.6 s).

Runs q249 at fraction 1.0 / 0.25 / 0.05 on a tiled replica and
records wall + verified-pair count per fraction, plus the subset
check (each sampled result must be a subset of the full one) — the
operator-bounded answer to "a pathological near-dup clique can't make
verification quadratic": coverage is stated, rows are a deterministic
hash-stable sample, cost scales with the fraction.

Usage: python tools/q249_verify_bound_probe.py \
           [--sf-dir /tmp/sparkgraft_sf1] [--out <json>]
(build the replica first: python tools/gen_sf.py)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from synthea_etl_spark.plans.llm27 import q249_lsh_verified_pairs  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf1")
    ap.add_argument(
        "--out", default="bench_artifacts/q249_verify_bound_probe.json"
    )
    args = ap.parse_args()

    spark = get_session("q249-verify-bound-probe")
    spark.range(1).collect()  # JVM warm

    results = {}
    pair_sets = {}
    for frac in (1.0, 0.25, 0.05):
        t0 = time.monotonic()
        rows = q249_lsh_verified_pairs(
            spark, args.sf_dir, verify_sample_fraction=frac
        ).collect()
        wall = time.monotonic() - t0
        pair_sets[frac] = {(r.id_a, r.id_b) for r in rows}
        results[str(frac)] = {
            "wall_s": round(wall, 2),
            "verified_pairs": len(rows),
        }

    subset_ok = (
        pair_sets[0.05] <= pair_sets[0.25] <= pair_sets[1.0]
    )
    full_n = len(pair_sets[1.0])
    report = {
        "sf_dir": args.sf_dir,
        "fractions": results,
        "sampled_are_subsets_of_full": subset_ok,
        "sample_rate_observed": {
            "0.25": round(len(pair_sets[0.25]) / full_n, 3) if full_n else None,
            "0.05": round(len(pair_sets[0.05]) / full_n, 3) if full_n else None,
        },
    }
    spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not subset_ok:
        raise SystemExit("sampled pair sets are not nested")


if __name__ == "__main__":
    main()
