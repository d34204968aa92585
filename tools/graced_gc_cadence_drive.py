"""Drive the round-12-ADVICE graced-GC fix at system level: compact
a counting-slice store FASTER than its gc grace for many
generations and assert the two properties the per-flip sidecars
exist to give:

1. BOUNDED superseded dirs — generations whose superseding flip has
   aged past the grace are collected even though the LATEST flip is
   always younger than the grace (the old rule's permanent-no-op
   condition holds for the entire drive);
2. READER CORRECTNESS throughout — watermark-filtered totals equal
   the running batch ingest at every step (nothing a reader needs
   is ever deleted under it; grace > the longest read in this
   drive).

Usage: python tools/graced_gc_cadence_drive.py [--out <json>]
       [--batches 12] [--grace 3.0] [--cadence 0.8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    compact_counting_slices,
    compaction_watermark,
    counting_store_totals,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_artifacts/graced_gc_cadence_drive.json")
    ap.add_argument("--batches", type=int, default=12)
    ap.add_argument("--grace", type=float, default=3.0)
    ap.add_argument("--cadence", type=float, default=0.8)
    args = ap.parse_args()

    spark = get_session("graced-gc-cadence-drive", shuffle_partitions=4)
    store = tempfile.mkdtemp(prefix="graced_gc_drive_") + "/store"

    def dirs():
        return sorted(
            d for d in os.listdir(store) if d.startswith("slice_id=")
        )

    expected = 0
    dir_counts = []
    reader_ok = True
    t_start = time.time()
    for b in range(args.batches):
        (
            spark.createDataFrame([("k", 1)], "k string, n long")
            .withColumn("slice_id", F.lit(f"batch{b}"))
            .write.mode("append")
            .partitionBy("slice_id")
            .parquet(store)
        )
        expected += 1
        # compact EVERY batch with a grace longer than the cadence:
        # under the old latest-flip rule no superseded dir would ever
        # be deleted in this loop
        compact_counting_slices(
            spark, store, b, ["k"], "n", gc_grace_s=args.grace
        )
        got = {
            (r.k, r.n)
            for r in counting_store_totals(spark, store, ["k"], "n").collect()
        }
        reader_ok = reader_ok and got == {("k", expected)}
        dir_counts.append(len(dirs()))
        time.sleep(args.cadence)

    # steady state: superseded dirs from flips older than the grace
    # are gone; the survivors are bounded by grace/cadence + current
    bound = int(args.grace / args.cadence) + 3
    final_dirs = dirs()
    # one final graced GC after letting the tail age
    time.sleep(args.grace + 0.5)
    from synthea_etl_spark.operators.dedup import gc_counting_slices

    gc_counting_slices(store, grace_s=args.grace)
    drained_dirs = dirs()
    report = {
        "batches": args.batches,
        "grace_s": args.grace,
        "cadence_s": args.cadence,
        "elapsed_s": round(time.time() - t_start, 1),
        "watermark": compaction_watermark(store),
        "dir_counts_per_step": dir_counts,
        "steady_state_bound": bound,
        "bounded": max(dir_counts[args.batches // 2:]) <= bound,
        "final_dirs": final_dirs,
        "dirs_after_tail_gc": drained_dirs,
        "tail_gc_leaves_only_current": drained_dirs
        == [f"slice_id=compacted{args.batches - 1}"],
        "reader_correct_at_every_step": reader_ok,
        "old_rule_would_have_deleted": 0,
        "note": "latest flip was always younger than the grace at "
        "every graced-GC call in this drive (cadence < grace), so "
        "the pre-fix rule would have kept every superseded dir",
    }
    spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (report["bounded"] and reader_ok and report["tail_gc_leaves_only_current"]):
        raise SystemExit("graced-gc cadence drive diverged")


if __name__ == "__main__":
    main()
