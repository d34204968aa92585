"""Multi-process execution evidence: run the engine under
``local-cluster[W,C,MB]`` — real driver/executor PROCESS boundaries
(serialized task closures, actual broadcast block shipping, shuffle
fetched over the wire, per-executor heaps) — and verify that

1. every checked query's result hash matches the DuckDB oracle
   EXACTLY as it does single-JVM (the correctness gate survives
   multi-process execution), and
2. headline walls stay comparable to ``local[32]`` (no hidden
   dependence on same-JVM shortcuts like shared memory or driver-side
   state).

``local[32]`` never exercises any of that: broadcasts are same-heap
references, closures never serialize, and the Python workers all hang
off one JVM. This tool is the 100 TB story's missing leg.

Usage:
  python tools/local_cluster_check.py --diff            # oracle hashes @ sf0.01
  python tools/local_cluster_check.py --bench           # walls @ $SPARK_GRAFT_SF_DIR
  python tools/local_cluster_check.py --diff --bench [q16... ]
Options: --master local-cluster[4,8,8192] (default), --out <json>.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from selfcheck import SF_DIR as DIFF_SF_DIR  # noqa: E402
from selfcheck import table_hash  # noqa: E402

from synthea_etl_spark.session import get_session  # noqa: E402

# the curated wall set: the verdict's profile quartet plus
# representatives of every execution shape (broadcast chain, big
# shuffle join, banded LSH, Arrow decode, streaming-ish agg)
BENCH_SET = [
    "q01_pricing_summary",
    "q16_join_chain_revenue",
    "q33_minhash_lsh_candidates",
    "q43_knn_ann_ivf",
    "q61_tpch_q3",
    "q91_tpch_q18",
    "q97_pack_sequences",
    "q105_tpch_q9",
    "q110_tpch_q21",
    "q127_jpeg_pixel_stats",
    "q146_bigram_familiarity",
    "q159_perceptual_near_dup",
    "q162_bm25_topk",
    "q163_duplicated_spans",
    "q164_remove_dup_spans",
]


def build_session(
    master: str,
    shuffle_partitions: int | None = None,
    broadcast_threshold: str | None = None,
):
    extra = {
        # executor JVMs are separate processes; python workers there
        # must import the engine package
        "spark.executorEnv.PYTHONPATH": REPO,
    }
    if broadcast_threshold is not None:
        extra["spark.sql.autoBroadcastJoinThreshold"] = broadcast_threshold
    return get_session(
        "local-cluster-check",
        master=master,
        shuffle_partitions=shuffle_partitions,
        extra_conf=extra,
    )


def run_diff(spark, names, oracles, qs) -> dict:
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{DIFF_SF_DIR}/{t}.parquet'"
        )
    out = {}
    for name in names:
        t0 = time.time()
        sdf = qs[name](spark, DIFF_SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        rec = {"rows": len(srows), "sec": round(time.time() - t0, 2)}
        if name in oracles:
            ores = con.sql(oracles[name])
            ocols = list(ores.columns)
            orows = ores.fetchall()
            sh, oh = table_hash(scols, srows), table_hash(ocols, orows)
            rec.update(
                hash_match=sh == oh,
                rows_match=len(srows) == len(orows),
                schema_match=sorted(scols) == sorted(ocols),
            )
            status = "PASS" if sh == oh else "HASH-MISMATCH"
        else:
            rec["hash_match"] = None
            status = "rows-only"
        out[name] = rec
        print(f"{status} {name} ({rec['sec']}s, {rec['rows']} rows)", flush=True)
    return out


def run_bench(spark, names, qs, sf_dir: str, repeats: int = 3) -> dict:
    out = {}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        best = min(
            _timed(fn, spark, sf_dir) for _ in range(repeats)
        )
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s", flush=True)
    return out


def _timed(fn, spark, sf_dir) -> float:
    t0 = time.time()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[4,8,8192]")
    ap.add_argument(
        "--broadcast-threshold",
        default=None,
        help="override spark.sql.autoBroadcastJoinThreshold. The "
        "engine default 64MB is sized for the single 32 GB local "
        "heap; a 64MB-on-disk build side deserializes to a "
        "10-30x-larger LongToUnsafeRowMap, which OOMs an 8 GB "
        "executor already running 8 sort/probe tasks (measured: "
        "q16 at sf10). On small executors pass ~10MB (Spark's own "
        "cluster default) -- the build side then shuffles instead.",
    )
    ap.add_argument(
        "--shuffle-partitions",
        type=int,
        default=None,
        help="override spark.sql.shuffle.partitions (the engine "
        "default 32 is sized for <= sf1; at sf10 the per-task "
        "partition no longer fits an 8-way-shared 8 GB executor "
        "heap -- pass 128+ so partitions shrink with scale, the "
        "same knob a real cluster job would set)",
    )
    ap.add_argument("--diff", action="store_true")
    ap.add_argument("--bench", action="store_true")
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default="bench_artifacts/local_cluster_check.json")
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    if not (args.diff or args.bench):
        args.diff = args.bench = True

    import __spark_entry__ as ent

    qs, oracles = ent.queries(), ent.oracle_sql()
    names = args.queries or BENCH_SET
    bad = [n for n in names if n not in qs]
    if bad:
        raise SystemExit(f"unknown queries: {bad}")

    spark = build_session(
        args.master, args.shuffle_partitions, args.broadcast_threshold
    )
    # force a distributed job so executors register before we count
    spark.range(0, 1000, 1, 8).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1
    report = {
        "master": args.master,
        "n_executors": n_exec,
        "shuffle_partitions": spark.conf.get("spark.sql.shuffle.partitions"),
        "broadcast_threshold": spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ),
        "diff_sf_dir": DIFF_SF_DIR,
        "bench_sf_dir": args.sf_dir,
    }
    print(f"master={args.master} executors={n_exec}", flush=True)
    if args.diff:
        report["diff"] = run_diff(spark, names, oracles, qs)
    if args.bench:
        report["bench"] = run_bench(spark, names, qs, args.sf_dir)
    spark.stop()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)
    if args.diff:
        fails = [
            n for n, r in report["diff"].items() if r.get("hash_match") is False
        ]
        if fails:
            raise SystemExit(f"hash mismatches under {args.master}: {fails}")


if __name__ == "__main__":
    main()
