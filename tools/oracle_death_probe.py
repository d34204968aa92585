"""Generic engine-vs-oracle scale probe for queries whose DuckDB
twins are expected to die at scale (recursive-CTE transitive closure,
quadratic truth sides): record the engine wall at the target scale
and give the oracle a hard budget in a daemon thread; if the budget
expires the row is an ORACLE-DEATH record, not a ratio. Generalizes
tools/q269_scale_probe.py to any registered query.

Usage: python tools/oracle_death_probe.py q274_cluster_source_purity \
           [--sf-dir /tmp/sparkgraft_sf10_organic] \
           [--duck-budget-s 300] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402

from synthea_etl_spark.plans import all_queries  # noqa: E402
from synthea_etl_spark.plans.common import TABLES  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10_organic")
    ap.add_argument("--duck-budget-s", type=float, default=300.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    spec = all_queries()[args.name]
    spark = get_session(f"{args.name}-scale-probe")
    spark.range(1).collect()
    t0 = time.monotonic()
    rows = spec.fn(spark, args.sf_dir).collect()
    engine_wall = time.monotonic() - t0
    spark.stop()

    duck_wall = None
    duck_err = None
    if spec.oracle:
        con = duckdb.connect()
        for t in TABLES:
            p = f"{args.sf_dir}/{t}.parquet"
            if os.path.exists(p):
                con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        done = threading.Event()

        def _interrupt():
            if not done.wait(args.duck_budget_s):
                con.interrupt()

        threading.Thread(target=_interrupt, daemon=True).start()
        t0 = time.monotonic()
        try:
            con.sql(
                f"CREATE TEMP TABLE _probe AS ({spec.oracle})"
            )
            duck_wall = time.monotonic() - t0
        except Exception as e:  # noqa: BLE001 -- record, don't mask
            duck_err = f"{type(e).__name__}: {str(e).splitlines()[0][:120]}"
        finally:
            done.set()

    report = {
        "query": args.name,
        "sf_dir": args.sf_dir,
        "engine_wall_s": round(engine_wall, 2),
        "engine_rows": len(rows),
        "duck_budget_s": args.duck_budget_s,
        "duck_wall_s": round(duck_wall, 2) if duck_wall else None,
        "duck_died": duck_wall is None and duck_err is not None,
        "duck_err": duck_err,
    }
    out = args.out or f"bench_artifacts/{args.name}_scale_probe.json"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
