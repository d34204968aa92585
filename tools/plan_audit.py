"""Physical-plan audit for a set of declared queries: counts the
plan nodes the 100 TB review cares about (exchanges, join
strategies, Python eval nodes, cartesians, codegen spans) from the
EXECUTED plan string at a small SF, and writes one JSON artifact.

BatchEvalPython (per-row Python UDF) is flagged; ArrowEvalPython is
counted separately — deliberate Arrow stages (the q217 RE2 pass, the
media decoders) are design choices, not smells, but they must be
visible.

Usage: python tools/plan_audit.py [--sf-dir /root/testdata/sf0.001]
       [--out bench_artifacts/plan_audit.json] q226... q227...
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def audit_one(df) -> dict:
    df.write.format("noop").mode("overwrite").save()  # realize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    count = plan.count
    return {
        "exchanges": count("Exchange hashpartitioning")
        + count("Exchange rangepartitioning")
        + count("Exchange SinglePartition"),
        "broadcast_exchanges": count("BroadcastExchange"),
        "bnlj": count("BroadcastNestedLoopJoin"),
        "sort_merge_joins": count("SortMergeJoin"),
        "broadcast_hash_joins": count("BroadcastHashJoin"),
        "shuffled_hash_joins": count("ShuffledHashJoin"),
        "wholestage_spans": count("WholeStageCodegen"),
        "arrow_eval_python": count("ArrowEvalPython"),
        "map_in_pandas": count("MapInPandas"),
        "per_row_python_udf": count("BatchEvalPython") > 0,
        "cartesian": "CartesianProduct" in plan,
        "windows": count("Window "),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default="bench_artifacts/plan_audit.json")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    spark = get_session()
    qs = all_queries()
    out = {}
    for name in args.names:
        out[name] = audit_one(qs[name].fn(spark, args.sf_dir))
        print(name, out[name], flush=True)
    spark.stop()
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
