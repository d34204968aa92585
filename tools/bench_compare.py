"""Engine-vs-DuckDB wall-clock comparison at an arbitrary scale dir.

For each declared query that has an oracle, times the Spark plan
(noop sink — full computation, no collect) and the DuckDB oracle
(CREATE TEMP TABLE AS — full materialization, no Python row
conversion), both best-of-N, on the SAME parquet files. Prints a
ratio table plus one machine-readable JSON line.

This is the evidence for BASELINE.md's fixed-overhead claim: at sf0.1
the Spark floor dominates; at sf1 (tools/gen_sf.py) data-proportional
work should, and the per-query ratios measure how close the engine's
throughput really is.

Usage: python tools/bench_compare.py [--sf-dir /tmp/sparkgraft_sf1]
       [--runs 3] [q01_pricing_summary ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from bench import HEADLINE, HEADLINE_OPT  # noqa: E402
from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402
from synthea_etl_spark.plans.common import TABLES  # noqa: E402


def time_spark(spark, fn, sf_dir: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return best


def time_duckdb(con, sql: str, runs: int) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.time()
        con.sql(f"CREATE OR REPLACE TEMP TABLE _bench AS ({sql})")
        best = min(best, time.time() - t0)
    con.sql("DROP TABLE IF EXISTS _bench")
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*")
    a = ap.parse_args()

    registry = all_queries()
    names = a.names or [
        n
        for n in HEADLINE + HEADLINE_OPT
        if n in registry and registry[n].oracle is not None
    ]
    con = duckdb.connect()
    # threads default = all cores, same hardware budget as local[32]
    for t in TABLES:
        p = f"{a.sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    spark = get_session("bench_compare")
    out = {}
    for n in names:
        spec = registry[n]
        try:
            s = time_spark(spark, spec.fn, a.sf_dir, a.runs)
        except Exception as e:
            print(f"{n}: SPARK ERROR {str(e).splitlines()[0][:90]}")
            continue
        try:
            d = time_duckdb(con, spec.oracle, a.runs) if spec.oracle else None
        except Exception as e:
            print(f"{n}: DUCKDB ERROR {str(e).splitlines()[0][:90]}")
            d = None
        ratio = (s / d) if d else None
        out[n] = {
            "spark_s": round(s, 3),
            "duckdb_s": round(d, 3) if d else None,
            "ratio": round(ratio, 2) if ratio else None,
        }
        r = f"{ratio:6.2f}x" if ratio else "   n/a"
        print(f"{n:34s} spark {s:7.3f}s  duckdb {d if d else float('nan'):7.3f}s  {r}")
    spark.stop()
    print(json.dumps({"sf_dir": a.sf_dir, "runs": a.runs, "results": out}))


if __name__ == "__main__":
    main()
