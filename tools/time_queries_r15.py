"""Time a list of declared queries through the noop sink (guide
§1.4) with a scheduling-floor canary — the minimal harness used for
the r15 old-vs-new sf1 A/B (run once from the pre-optimization
worktree, once from the working tree, alternating processes so host
drift spreads across both arms).

Usage: python tools/time_queries_r15.py <sf_dir> <reps> <q> [q ...]
Prints one JSON line {"canary": ..., "queries": {name: best_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.getcwd())

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir, reps, names = sys.argv[1], int(sys.argv[2]), sys.argv[3:]
    spark = get_session("time_queries_r15")
    reg = all_queries()
    reg["q18_groupby_count"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()  # warm codegen/classloading
    from pyspark.sql import functions as F

    cw = []
    for _ in range(5):
        t0 = time.time()
        spark.range(1).agg(F.count("*").alias("n")).write.format(
            "noop"
        ).mode("overwrite").save()
        cw.append(time.time() - t0)
    out: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"time {name}")
            t0 = time.time()
            reg[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}", file=sys.stderr, flush=True)
    print(json.dumps({"canary": round(min(cw), 4), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
