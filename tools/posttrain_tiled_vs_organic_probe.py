"""Organic-vs-tiled honesty record for the post-training family
(the q253 pattern, round-13 VERDICT ask #8): q257 preference pairs
and q258 ICL ordering measured on BOTH sf10 replicas —

- tiled: suffix-shifted copies; prompt keys never collide across
  copies, so prompt groups are exactly the base corpus's (shifted
  100x) — group structure is all-or-nothing;
- organic: the seeded near-dup process now PRESERVES the 8-token
  prompt key inside a cluster (round-14 generator change), so
  clusters double as multi-response prompt groups with md5-spread
  rewards — plus the banner-host pathology (all banner docs on one
  host share the banner-led key: realistic boilerplate prompts with
  thousands of "responses").

Records walls plus the group/pair structure each replica actually
produces, so scale claims for q257/q258 stop riding on a replica
artifact.

Usage: python tools/posttrain_tiled_vs_organic_probe.py \
           [--tiled /tmp/sparkgraft_sf10_tiled] \
           [--organic /tmp/sparkgraft_sf10_organic] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.plans.llm30 import (  # noqa: E402
    q257_preference_pairs,
    q258_icl_order,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiled", default="/tmp/sparkgraft_sf10_tiled")
    ap.add_argument("--organic", default="/tmp/sparkgraft_sf10_organic")
    ap.add_argument(
        "--out",
        default="bench_artifacts/tiled_vs_organic_r14_posttrain.json",
    )
    args = ap.parse_args()

    spark = get_session("posttrain-tiled-vs-organic")
    spark.range(1).collect()

    report = {"sf": 10, "replicas": {}}
    for name, sf_dir in (("tiled", args.tiled), ("organic", args.organic)):
        t0 = time.monotonic()
        pairs = q257_preference_pairs(spark, sf_dir)
        p = pairs.agg(
            F.count("*").alias("n_pairs"),
            F.sum("n_responses").alias("grouped_responses"),
            F.max("n_responses").alias("max_group"),
            F.avg("margin_milli").alias("mean_margin"),
        ).collect()[0]
        w257 = time.monotonic() - t0
        t0 = time.monotonic()
        icl = q258_icl_order(spark, sf_dir)
        n258 = icl.count()
        w258 = time.monotonic() - t0
        report["replicas"][name] = {
            "q257": {
                "wall_s": round(w257, 2),
                "n_pairs": int(p["n_pairs"]),
                "grouped_responses": int(p["grouped_responses"] or 0),
                "max_group_size": int(p["max_group"] or 0),
                "mean_margin_milli": round(float(p["mean_margin"] or 0), 1),
            },
            "q258": {"wall_s": round(w258, 2), "rows": int(n258)},
        }
    spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
