"""Phase decomposition of q204_ivf_rollover_probe (VERDICT r15 item 3):
replicate the lifecycle inline and time each driver-blocking step, so
the §2.6 overlap (or any cut) targets the measured wall, not a guess.

Usage: python tools/phase_q204_r16.py [--sf-dir ...] [--reps 3]
       [--out bench_artifacts/phase_q204_r16.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

import synthea_etl_spark.operators.similarity as S  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="bench_artifacts/phase_q204_r16.json")
    args = ap.parse_args()
    spark = get_session("phase_q204_r16")
    e = spark.read.parquet(f"{args.sf_dir}/embeddings.parquet")
    runs = []
    for rep in range(args.reps):
        root = tempfile.mkdtemp(prefix="sparkgraft_phase204_")
        index_path = os.path.join(root, "index")
        cent_path = os.path.join(root, "centroids")
        t: dict[str, float] = {}

        def mark(name, t0):
            t[name] = round(time.time() - t0, 3)

        try:
            t0 = time.time()
            c1 = S.ivf_train_centroids(e, "vec_id", "embedding", 16, 0)
            mark("1_train_c1_seeds", t0)
            t0 = time.time()
            (
                S.ivf_index(e, c1)
                .withColumn("batch_id", (F.col("neighbor_id") % 2).cast("int"))
                .hint("rebalance", "batch_id")
                .write.partitionBy("batch_id")
                .parquet(index_path)
            )
            mark("2_index_write", t0)
            # rollover decomposed (same calls ivf_index_rollover makes)
            t0 = time.time()
            store = spark.read.parquet(index_path)
            mark("3_store_read_plan", t0)
            t0 = time.time()
            c2 = S.ivf_train_centroids(store, "neighbor_id", "cv", 12, 0)
            mark("4_train_c2_seeds", t0)
            t0 = time.time()
            from synthea_etl_spark.operators.scd2 import write_swap

            assign = S.make_assign_udf(c2)
            keep_cols = [c for c in store.columns if c != "cluster"]
            rolled = store.select(
                assign(F.col("cv")).alias("cluster"), *keep_cols
            ).hint("rebalance", "batch_id")
            write_swap(rolled, index_path, partition_by=["batch_id"])
            mark("5_reassign_swap", t0)
            t0 = time.time()
            S.save_centroids(spark, c2, cent_path)
            mark("6_save_centroids", t0)
            t0 = time.time()
            c2b = S.load_centroids(spark, cent_path)
            mark("7_load_centroids", t0)
            t0 = time.time()
            idx = spark.read.parquet(index_path)
            mark("8_index_read_plan", t0)
            t0 = time.time()
            out = S.knn_ann_ivf_probe(
                idx, c2b, e.filter(F.col("vec_id") < 10), k=5, n_probe=4
            )
            rows = out.collect()
            mark("9_probe_collect", t0)
            t["total"] = round(sum(t.values()), 3)
            t["n_rows"] = len(rows)
        finally:
            shutil.rmtree(root, ignore_errors=True)
        runs.append(t)
        print(rep, json.dumps(t), flush=True)
    with open(args.out, "w") as f:
        json.dump({"sf_dir": args.sf_dir, "runs": runs}, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
