"""Quantify (and try to shrink) the multi-process shuffle tax.

Round-8 evidence: q110/q158/q163 run +34-70% slower under
``local-cluster[4,8,8192]`` than single-JVM ``local[32]`` at sf10 —
the suspected cost is shuffle blocks crossing real process
boundaries (serialize + TCP + deserialize) instead of being same-heap
references. This tool runs a config matrix over those queries and
records BOTH walls and total shuffle bytes (from the driver REST API,
summed over the query's stages), so the verdict can say whether the
gap shrinks with less shuffled data (compressible tax) or is
irreducible wire cost at fixed bytes:

- baseline: the round-8 reproduction (engine defaults at
  shuffle_partitions=128 and the 10MB cluster broadcast threshold —
  both round-8 sizing rules)
- zstd: spark.io.compression.codec=zstd (smaller blocks over the
  wire for ~equal CPU on this data, vs the lz4 default)
- coalesce256: AQE advisoryPartitionSizeInBytes=256m (vs the 64m
  default) — fewer, bigger reducers = fewer fetch round trips per
  byte
- zstd_coalesce256: both

Usage: python tools/shuffle_tax_probe.py [--sf-dir /tmp/sparkgraft_sf10]
           [--queries q110_tpch_q21 ...] [--out bench_artifacts/...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from synthea_etl_spark.session import get_session  # noqa: E402

VARIANTS = {
    "baseline": {},
    "zstd": {"spark.io.compression.codec": "zstd"},
    "coalesce256": {
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m"
    },
    "zstd_coalesce256": {
        "spark.io.compression.codec": "zstd",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
    },
}


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=20) as r:
        return json.loads(r.read())


def shuffle_totals(spark) -> tuple[int, int]:
    """(shuffle_read_bytes, shuffle_write_bytes) summed over ALL
    completed stages of this application so far."""
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    rd = wr = 0
    for st in _api(base, f"/api/v1/applications/{app_id}/stages?status=complete"):
        rd += st.get("shuffleReadBytes", 0)
        wr += st.get("shuffleWriteBytes", 0)
    return rd, wr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[4,8,8192]")
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10")
    ap.add_argument("--shuffle-partitions", type=int, default=128)
    ap.add_argument(
        "--broadcast-threshold",
        default="10MB",
        help="round-8 sizing rule: broadcast threshold ∝ executor "
        "heap — 64MB-on-disk build sides deserialize 10-30x larger "
        "and OOM 8 GB executors (Spark's own cluster default is 10MB)",
    )
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument(
        "--queries",
        nargs="*",
        default=["q110_tpch_q21", "q158_incremental_minhash", "q163_duplicated_spans"],
    )
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--out", default="bench_artifacts/shuffle_tax_probe.json")
    args = ap.parse_args()

    import __spark_entry__ as ent

    qs = ent.queries()
    report = {
        "master": args.master,
        "sf_dir": args.sf_dir,
        "shuffle_partitions": args.shuffle_partitions,
        "broadcast_threshold": args.broadcast_threshold,
        "variants": {},
    }
    for vname in args.variants.split(","):
        vconf = VARIANTS[vname]
        extra = {
            "spark.executorEnv.PYTHONPATH": REPO,
            "spark.ui.enabled": "true",
            "spark.sql.autoBroadcastJoinThreshold": args.broadcast_threshold,
            **vconf,
        }
        spark = get_session(
            f"shuffle-tax-{vname}",
            master=args.master,
            shuffle_partitions=args.shuffle_partitions,
            extra_conf=extra,
        )
        spark.range(0, 1000, 1, 8).selectExpr("sum(id)").collect()
        res = {}
        for name in args.queries:
            fn = qs[name].fn if hasattr(qs[name], "fn") else qs[name]
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()  # warm
            rd0, wr0 = shuffle_totals(spark)
            best = float("inf")
            for _ in range(args.repeats):
                t0 = time.time()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            rd1, wr1 = shuffle_totals(spark)
            per_run = args.repeats
            res[name] = {
                "wall_sec": round(best, 2),
                "shuffle_read_mb": round((rd1 - rd0) / per_run / 1e6, 1),
                "shuffle_write_mb": round((wr1 - wr0) / per_run / 1e6, 1),
            }
            print(vname, name, json.dumps(res[name]), flush=True)
        report["variants"][vname] = res
        spark.stop()

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
