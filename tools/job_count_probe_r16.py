"""Count Spark JOBS a query runs (setJobGroup + statusTracker) plus its
wall — the evidence format for checkpoint-materialization cuts whose
static final plan is unchanged (the caller plan executes fewer times;
each eager materialization is a job).

Usage: python tools/job_count_probe_r16.py [--sf-dir D] [--reps 3] name...
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    spark = get_session("job_count_probe_r16")
    sc = spark.sparkContext
    qs = all_queries()
    out = {}
    for name in args.names:
        jobs, walls = [], []
        for rep in range(args.reps):
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            qs[name].fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            walls.append(round(time.time() - t0, 3))
            jobs.append(len(sc.statusTracker().getJobIdsForGroup(group)))
        sc.setJobGroup(None, None)
        out[name] = {"jobs": jobs, "walls": walls}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
