"""q269 scale probe (the q255 record pattern): the engine's
dedup-quality-shift at organic sf10 rides pointer-jumping connected
components (O(log d) rounds, banded candidates only), while the
DuckDB twin's transitive-closure `reach` CTE materializes id x label
pairs per component — already 89.8 s at sf1 (engine 29.0 s, 0.32x).
This probe records the engine wall at organic sf10 and gives the
DuckDB twin a hard budget; if the budget expires the row is an
oracle-death record, not a ratio.

Usage: python tools/q269_scale_probe.py \
           [--sf-dir /tmp/sparkgraft_sf10_organic] \
           [--duck-budget-s 600] [--out <json>]
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

from synthea_etl_spark.plans.common import TABLES  # noqa: E402
from synthea_etl_spark.plans.llm31 import (  # noqa: E402
    _oracle_q269,
    q269_dedup_quality_shift,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10_organic")
    ap.add_argument("--duck-budget-s", type=float, default=600.0)
    ap.add_argument(
        "--out", default="bench_artifacts/q269_scale_probe_r14.json"
    )
    args = ap.parse_args()

    spark = get_session("q269-scale-probe")
    spark.range(1).collect()
    t0 = time.monotonic()
    rows = q269_dedup_quality_shift(spark, args.sf_dir).collect()
    engine_wall = time.monotonic() - t0
    spark.stop()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'"
        )
    killer = threading.Timer(args.duck_budget_s, con.interrupt)
    killer.start()
    t0 = time.monotonic()
    duck_wall = None
    duck_died = False
    duck_err = None
    try:
        con.sql(f"CREATE TEMP TABLE _p AS ({_oracle_q269()})")
        duck_wall = time.monotonic() - t0
    except Exception as e:  # interrupt or OOM
        duck_died = True
        duck_err = f"{type(e).__name__}: {e}"[:200]
    finally:
        killer.cancel()

    report = {
        "sf_dir": args.sf_dir,
        "engine_wall_s": round(engine_wall, 2),
        "engine_rows": len(rows),
        "duck_budget_s": args.duck_budget_s,
        "duck_wall_s": round(duck_wall, 2) if duck_wall else None,
        "duck_died": duck_died,
        "duck_err": duck_err,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
