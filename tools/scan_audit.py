"""Base-table scan-count audit: how many times does each query's
EXECUTED plan physically scan each base parquet table? A table
appearing N>1 times means the whole subtree above it runs N times
(Spark duplicates plan subtrees per consumer unless an exchange is
reused or the frame is checkpointed) — the duplicated-corpus-pass
smell the r15 optimization round hunts (guide §1.2).

Caveats, so the numbers are read honestly:
- ReusedExchange / ReusedSubquery subtrees print ONCE in the
  executed plan, so reused scans are (correctly) not double-counted.
- localCheckpoint'd frames appear as ExistingRDD with no upstream
  scan — a checkpointed corpus pass counts 1 at materialization and
  0 here. A query whose whole input is checkpointed shows 0 scans.
- InMemoryTableScan (persist) likewise hides its build subtree
  after the first materialization.

Usage: python tools/scan_audit.py [--sf-dir ...] [--out ...] [names ... | all]
(``names`` defaults to ``all``; the JSON is rewritten atomically after
every query so a hang or crash mid-sweep keeps all prior results.)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

TABLES = [
    "customer", "documents", "embeddings", "events", "lineitem",
    "nation", "orders", "part", "region", "supplier",
]


def audit_one(df) -> dict:
    df.write.format("noop").mode("overwrite").save()  # realize AQE plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = {}
    for t in TABLES:
        n = len(re.findall(rf"Scan parquet[^\n]*/{t}\.parquet", plan))
        if n:
            scans[t] = n
    return {
        "scans": scans,
        "total_file_scans": plan.count("Scan parquet"),
        "existing_rdd": plan.count("Scan ExistingRDD"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--out", default="bench_artifacts/scan_audit.json"
    )
    ap.add_argument("names", nargs="*", default=["all"])
    args = ap.parse_args()
    spark = get_session()
    qs = all_queries()
    names = list(qs) if args.names == ["all"] else args.names

    def dump(partial: dict) -> None:
        # atomic rewrite per query: a mid-sweep hang/kill loses at most
        # the in-flight query, never the accumulated results
        tmp = args.out + ".tmp"
        with open(tmp, "w") as f:
            json.dump(partial, f, indent=1)
        os.replace(tmp, args.out)

    out = {}
    for name in names:
        try:
            out[name] = audit_one(qs[name].fn(spark, args.sf_dir))
        except Exception as e:  # noqa: BLE001 - audit must not die mid-sweep
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], flush=True)
        dump(out)
    spark.stop()
    print("wrote", args.out)


if __name__ == "__main__":
    main()
