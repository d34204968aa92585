"""Regenerate QUERIES.md from the live query registry.

Usage: python tools/gen_queries_md.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from synthea_etl_spark.plans import all_queries  # noqa: E402

HEADER = """# QUERIES — declared inventory

One row per `queries()` entry in `__spark_entry__.py`. Every operator
claimed in SURVEY.md §2 (and every beyond-reference extension) appears
here; `oracle` marks entries hash-checked against DuckDB at sf0.01 by
the driver gate (rows-only entries are approximate/stateful by design
and carry recall/tolerance tests in `tests/` instead).

Regenerate with `python tools/gen_queries_md.py`.

| query | oracle | tags | description |
|---|---|---|---|
"""


def main() -> None:
    lines = [HEADER]
    qs = all_queries()
    for name, spec in qs.items():
        oracle = "yes" if spec.oracle else "rows-only"
        tags = ",".join(spec.tags)
        lines.append(f"| {name} | {oracle} | {tags} | {spec.description} |\n")
    n_oracle = sum(1 for s in qs.values() if s.oracle)
    lines.append(
        f"\n{len(qs)} queries; {n_oracle} oracle-checked, "
        f"{len(qs) - n_oracle} rows-only (recall/tolerance-tested).\n"
    )
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "QUERIES.md")
    with open(out, "w") as f:
        f.writelines(lines)
    print(f"wrote {out}: {len(qs)} queries")


if __name__ == "__main__":
    main()
