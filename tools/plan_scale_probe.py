"""Measure q199/q201 ABOVE the Spark floor (round-9 VERDICT ask #4).

Both queries are floor-class at every tiled replica scale (flat
sub-second walls at sf1 AND sf10 — the data-proportional cost sits
below the scheduling canary's spread), so their throughput story was
asserted, not measured. This probe manufactures the scale their
shapes need: a NARROW documents table (doc_id, source — the only two
columns either query reads; source uniform over 20 values exactly
like the real generator) at tens of millions of rows, where the
window sorts and the allocation join finally dominate the wall.

Records engine and DuckDB walls at two scales and the MARGINAL ratio
(delta_spark / delta_duck) — the floor-free data-proportional
comparison BASELINE.md uses everywhere else.

Usage: python tools/plan_scale_probe.py [--rows-a 10000000]
       [--rows-b 50000000] [--runs 2] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

NAMES = ["q199_train_order_manifest", "q201_epoch_repetition_plan"]


def gen(rows: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "documents.parquet")
    if os.path.exists(path):
        return
    con = duckdb.connect()
    con.sql(
        f"""COPY (SELECT range AS doc_id,
                        'src' || CAST(range % 20 AS VARCHAR) AS source
                 FROM range({rows}))
            TO '{path}' (FORMAT PARQUET, ROW_GROUP_SIZE 1048576)"""
    )
    con.close()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows-a", type=int, default=10_000_000)
    ap.add_argument("--rows-b", type=int, default=50_000_000)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--out", default="bench_artifacts/q199_q201_scale_probe_r10.json"
    )
    args = ap.parse_args()

    dirs = {}
    for tag, rows in (("a", args.rows_a), ("b", args.rows_b)):
        d = f"/tmp/sparkgraft_planscale_{tag}"
        gen(rows, d)
        dirs[tag] = d

    registry = all_queries()
    spark = get_session("plan_scale_probe")
    results: dict[str, dict] = {n: {} for n in NAMES}
    for tag, d in dirs.items():
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS"
            f" SELECT * FROM '{d}/documents.parquet'"
        )
        for n in NAMES:
            spec = registry[n]
            best_s = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                spec.fn(spark, d).write.format("noop").mode(
                    "overwrite"
                ).save()
                best_s = min(best_s, time.time() - t0)
            best_d = float("inf")
            for _ in range(args.runs):
                t0 = time.time()
                con.sql(
                    f"CREATE OR REPLACE TEMP TABLE _b AS ({spec.oracle})"
                )
                best_d = min(best_d, time.time() - t0)
            con.sql("DROP TABLE IF EXISTS _b")
            results[n][tag] = {"spark_sec": best_s, "duck_sec": best_d}
            print(f"{n} [{tag}] spark {best_s:.2f}s duck {best_d:.2f}s")
        con.close()
    spark.stop()

    report = {
        "rows_a": args.rows_a,
        "rows_b": args.rows_b,
        "runs": args.runs,
        "queries": {},
    }
    for n in NAMES:
        a, b = results[n]["a"], results[n]["b"]
        ds = b["spark_sec"] - a["spark_sec"]
        dd = b["duck_sec"] - a["duck_sec"]
        report["queries"][n] = {
            **{f"{k}_{t}": v[k] for t, v in results[n].items()
               for k in ("spark_sec", "duck_sec")},
            "raw_ratio_b": b["spark_sec"] / b["duck_sec"],
            "marginal_ratio": (ds / dd) if dd > 0 else None,
        }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
