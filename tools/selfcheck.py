"""Self-check harness mimicking the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at sf0.01, then compares row count, column names, and an
order-insensitive value hash (rows sorted, columns sorted by name).

Usage: python tools/selfcheck.py [query_name ...]
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def canon(v):
    """Canonicalize a cell for hashing (both engines -> same repr)."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def table_hash(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(names=None):
    import __spark_entry__ as ent
    from synthea_etl_spark.session import get_session

    spark = get_session("selfcheck", shuffle_partitions=8)
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = ent.queries(), ent.oracle_sql()
    todo = names or list(qs)
    n_pass = n_fail = 0
    for name in todo:
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(srows)} rows (no oracle)")
            n_pass += 1
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = [c for c in rel.columns]
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {str(e).splitlines()[0]}")
            n_fail += 1
            continue
        problems = []
        # HUGEINT (DuckDB's SUM(BIGINT) result) has no Spark twin and the
        # driver's hasher renders it differently from bigint even when the
        # values are identical — oracles must CAST sums back to BIGINT.
        huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t]
        if huge:
            problems.append(f"oracle HUGEINT cols (add CAST .. AS BIGINT): {huge}")
        if len(srows) != len(drows):
            problems.append(f"rowcount {len(srows)} vs {len(drows)}")
        if sorted(scols) != sorted(dcols):
            problems.append(f"cols {sorted(scols)} vs {sorted(dcols)}")
        if not problems:
            sh, dh = table_hash(scols, srows), table_hash(dcols, drows)
            if sh != dh:
                problems.append(f"hash {sh} vs {dh}")
                for a, b in list(
                    zip(
                        sorted(
                            "|".join(canon(r[i]) for i in sorted(range(len(scols)), key=lambda i: scols[i]))
                            for r in srows
                        ),
                        sorted(
                            "|".join(canon(r[i]) for i in sorted(range(len(dcols)), key=lambda i: dcols[i]))
                            for r in drows
                        ),
                    )
                )[:2000]:
                    if a != b:
                        problems.append(f"  first diff:\n   spark: {a}\n   duck : {b}")
                        break
        dt = time.time() - t0
        if problems:
            print(f"FAIL {name} ({dt:.1f}s): " + "; ".join(problems[:3]))
            n_fail += 1
        else:
            print(f"PASS {name} ({dt:.1f}s, {len(srows)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
