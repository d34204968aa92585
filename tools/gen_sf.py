"""Scale-replicate TESTDATA to a larger scale factor (default sf1).

/root/testdata is read-only and tops out at sf0.1, where Spark's fixed
per-query floor (~150-400 ms of planning/scheduling) dominates most
runtimes. To measure the data-proportional regime the bench needs a
bigger input; this tool builds one deterministically by tiling the
sf0.1 tables K times with key offsets:

- fact/dim keys shift by ``i * (max key)`` per copy, so FK integrity
  (orders->customer, lineitem->part/supplier/orders) is preserved and
  join fan-outs match the base data exactly;
- region/nation stay fixed (they are fixed-size in TPC-H at every SF);
- events keep their user_id values (hot keys get 10x hotter — the
  realistic direction) with ts shifted i seconds per copy;
- document texts get a per-copy suffix so the corpus is not 90%
  byte-identical duplicates (which would turn every LSH bucket into a
  10x clique); near-dup structure is preserved — suffixed copies still
  share almost all shingles with their original.

Marginal value distributions are byte-for-byte those of the driver's
generator; only key ranges grow. Output goes OUTSIDE the repo (default
/tmp/sparkgraft_sf1) — ~200 MB of parquet has no business in git.

Usage: python tools/gen_sf.py [--base /root/testdata/sf0.1] [--mult 10]
       [--out /tmp/sparkgraft_sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SCALED = {
    # table -> list of (key_col, offset_source_table) to shift per copy
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}
COPY_AS_IS = ["region", "nation"]


def generate(base: str, out: str, mult: int) -> None:
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    maxes = {
        t: con.sql(
            f"SELECT MAX({KEY_OF[t]}) FROM '{base}/{t}.parquet'"
        ).fetchone()[0]
        for t in KEY_OF
    }
    for t in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{base}/{t}.parquet') TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")
    for t, shifts in SCALED.items():
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{base}/{t}.parquet'"
            ).fetchall()
        ]
        shifted = {k: f"{k} + i * {maxes[src]}" for k, src in shifts}
        exprs = []
        for c in cols:
            if c in shifted:
                exprs.append(f"{shifted[c]} AS {c}")
            elif t == "events" and c == "ts":
                exprs.append("ts + i * INTERVAL 1 SECOND AS ts")
            elif t == "documents" and c == "text":
                exprs.append(
                    "CASE WHEN i = 0 THEN text ELSE text || ' c' || i END AS text"
                )
            else:
                exprs.append(c)
        con.sql(
            f"COPY (SELECT {', '.join(exprs)} "
            f"FROM '{base}/{t}.parquet', (SELECT UNNEST(range({mult})) AS i)) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.sql(f"SELECT COUNT(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--out", default="/tmp/sparkgraft_sf1")
    a = ap.parse_args()
    generate(a.base, a.out, a.mult)
