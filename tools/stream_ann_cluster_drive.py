"""Drive the streaming IVF ANN-index maintenance under
``local-cluster`` — real executor processes running the foreachBatch
frozen-quantizer assignment, dynamic-partition-overwrite publication
crossing process boundaries — and verify the accumulated index equals
a batch ``ivf_index`` rebuild and answers probes identically (the
grouped BLAS scorer against streamed state). The vector-side twin of
tools/stream_index_cluster_drive.py.

Usage: python tools/stream_ann_cluster_drive.py \
           [--master local-cluster[2,4,4096]] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

import synthea_etl_spark.operators.similarity as S  # noqa: E402
from synthea_etl_spark.pipeline import ann_index_ingest_stream  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/stream_ann_cluster_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-ann-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_ann_drive_")
    landing = os.path.join(work, "landing")
    index_dir = os.path.join(work, "index")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    vecs = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .orderBy("vec_id")
        .limit(480)
        .collect()
    )
    # frozen quantizer: deterministic seed centroids (first 8 vectors)
    centroids = [list(r.embedding) for r in vecs[:8]]

    batches = [vecs[i : i + 160] for i in range(0, 480, 160)]
    for bi, rows in enumerate(batches):
        with open(os.path.join(landing, f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps(
                        {"vec_id": r.vec_id, "embedding": list(r.embedding)}
                    )
                    + "\n"
                )
        ann_index_ingest_stream(
            spark, landing, index_dir, ckpt, schema, centroids
        ).awaitTermination(180)

    streamed = spark.read.parquet(index_dir)
    full = spark.createDataFrame(vecs, schema)
    rebuilt = S.ivf_index(full, centroids)
    key = lambda r: (r.cluster, r.neighbor_id, tuple(r.cv))  # noqa: E731
    s_rows = sorted(map(key, streamed.drop("batch_id").collect()))
    r_rows = sorted(map(key, rebuilt.collect()))

    queries = full.filter(F.col("vec_id") < 10)
    rk = lambda df: sorted(  # noqa: E731
        (r.query_id, r.rank, r.neighbor_id, r.sim) for r in df.collect()
    )
    s_rank = rk(
        S.knn_ann_ivf_grouped_probe(
            streamed.drop("batch_id"), centroids, queries, k=5, n_probe=3
        )
    )
    r_rank = rk(
        S.knn_ann_ivf_grouped_probe(rebuilt, centroids, queries, k=5, n_probe=3)
    )
    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "index_rows": len(s_rows),
        "index_match": s_rows == r_rows,
        "probe_ranking_match": s_rank == r_rank,
        "committed_batch_ids": sorted(
            r.batch_id
            for r in streamed.select("batch_id").distinct().collect()
        ),
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (report["index_match"] and report["probe_ranking_match"]):
        raise SystemExit("streamed ANN index diverged from batch rebuild")


if __name__ == "__main__":
    main()
