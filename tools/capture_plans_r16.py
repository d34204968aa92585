"""Capture .explain('formatted') for round-16-touched queries.

Usage:
    python tools/capture_plans_r16.py <out_dir> <suffix> [--sf-dir D] name...

Writes <out_dir>/<query>_<suffix>.txt for each name. Run from the repo
(or git worktree) whose code state should be captured: the "before"
run executes in a worktree pinned at the pre-optimization commit, the
"after" run in the working tree. Plans are captured at sf0.01 (plan
shape does not depend on row count; driver-loop queries stay cheap).
"""

from __future__ import annotations

import argparse
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.getcwd())

from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("suffix")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    spark = get_session("capture_plans_r16")
    from synthea_etl_spark.plans import all_queries

    qs = all_queries()
    for name in args.names:
        spec = qs.get(name)
        if spec is None:
            print(f"SKIP {name}: not declared")
            continue
        spark.sparkContext.setJobDescription(f"plan-capture {name}")
        df = spec.fn(spark, args.sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(args.out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} — {args.suffix} (sf_dir={args.sf_dir})\n")
            fh.write(buf.getvalue())
        print(f"WROTE {path}")
    spark.stop()


if __name__ == "__main__":
    main()
