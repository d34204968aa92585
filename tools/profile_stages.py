"""Stage/task-metric profiler for the constant-factor-weak queries.

Wall clocks can't adjudicate WHERE a >2x-vs-DuckDB residual lives;
stage metrics can. For each query this tool does a warm run (codegen /
plan-cache), then a measured run, then pulls the completed stages of
that run from Spark's REST API (/api/v1/applications/<id>/stages) and
records per stage: task count, executor run/CPU time, JVM GC time,
input/shuffle volumes, and spill. The verdict rubric: a residual is
"probe CPU, irreducible" when CPU time ~= run time (no scheduler/IO
wait), spill is zero, GC is small, and no single stage holds
recoverable skew; anything else names the stage to fix.

Usage: python tools/profile_stages.py [--sf-dir /tmp/sparkgraft_sf1]
       [--out bench_artifacts/stage_profile.json] [q16... q105...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

# the five joins flagged constant-factor-weak in round 4's verdict
DEFAULT_QUERIES = [
    "q16_join_chain_revenue",
    "q27_star_mart",
    "q91_tpch_q18",
    "q105_tpch_q9",
    "q110_tpch_q21",
]

STAGE_FIELDS = (
    "stageId",
    "name",
    "submissionTime",
    "firstTaskLaunchedTime",
    "completionTime",
    "numCompleteTasks",
    "executorRunTime",  # ms, summed over tasks
    "executorCpuTime",  # ns, summed over tasks
    "jvmGcTime",  # ms
    "inputBytes",
    "outputBytes",
    "shuffleReadBytes",
    "shuffleWriteBytes",
    "memoryBytesSpilled",
    "diskBytesSpilled",
)


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.loads(r.read())


def completed_stages(base: str, app_id: str) -> dict[int, dict]:
    out = {}
    for st in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        row = {f: st.get(f) for f in STAGE_FIELDS}
        # normalize CPU to ms so run/CPU compare directly
        if row.get("executorCpuTime") is not None:
            row["executorCpuTimeMs"] = round(row.pop("executorCpuTime") / 1e6, 1)
        out[st["stageId"]] = row
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf1")
    ap.add_argument("--out", default="bench_artifacts/stage_profile.json")
    ap.add_argument("--runs", type=int, default=1, help="warm runs before the measured one")
    ap.add_argument(
        "--master",
        default=None,
        help="override master, e.g. local-cluster[4,8,8192] for "
        "multi-process profiling (default: env/local[*])",
    )
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    registry = all_queries()
    extra = {"spark.ui.enabled": "true"}
    if args.master and args.master.startswith("local-cluster"):
        # executor JVMs are separate processes: their python workers
        # need the repo on PYTHONPATH to unpickle engine closures
        extra["spark.executorEnv.PYTHONPATH"] = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        )
    spark = get_session("profile", master=args.master, extra_conf=extra)
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    report = {"sf_dir": args.sf_dir, "queries": {}}
    for name in names:
        fn = registry[name].fn
        for _ in range(args.runs):  # warm: JIT, plan cache, page cache
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        before = set(completed_stages(base, app_id))
        t0 = time.time()
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        wall = time.time() - t0
        stages = completed_stages(base, app_id)
        new = [v for k, v in sorted(stages.items()) if k not in before]
        total_run = sum(s["executorRunTime"] or 0 for s in new)
        total_cpu = sum(s.get("executorCpuTimeMs") or 0 for s in new)
        report["queries"][name] = {
            "wall_sec": round(wall, 3),
            "executor_run_ms": total_run,
            "executor_cpu_ms": round(total_cpu, 1),
            "cpu_over_run": round(total_cpu / total_run, 3) if total_run else None,
            "gc_ms": sum(s["jvmGcTime"] or 0 for s in new),
            "spilled_bytes": sum(
                (s["memoryBytesSpilled"] or 0) + (s["diskBytesSpilled"] or 0)
                for s in new
            ),
            "stages": new,
        }
        print(
            f"{name}: wall {wall:.2f}s run {total_run}ms cpu {total_cpu:.0f}ms "
            f"gc {report['queries'][name]['gc_ms']}ms "
            f"spill {report['queries'][name]['spilled_bytes']}B "
            f"({len(new)} stages)",
            flush=True,
        )

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    spark.stop()


if __name__ == "__main__":
    main()
