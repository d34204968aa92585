"""Drive the streaming BM25-postings maintenance under
``local-cluster`` — real executor processes running the foreachBatch
tokenization, dynamic-partition-overwrite publication crossing process
boundaries — and verify the accumulated index equals a batch rebuild
and answers queries identically (the q167 path against streamed
state).

Usage: python tools/stream_index_cluster_drive.py \
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
    LongType,
    StringType,
    StructField,
    StructType,
)

from synthea_etl_spark.operators.retrieval import (  # noqa: E402
    bm25_topk_from_index,
    inverted_index,
)
from synthea_etl_spark.pipeline import retrieval_index_ingest_stream  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/stream_index_cluster_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-index-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_index_drive_")
    landing = os.path.join(work, "landing")
    index_dir = os.path.join(work, "index")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .limit(300)
        .collect()
    )
    # three landing batches of 100 docs each, streamed one at a time
    batches = [docs[i : i + 100] for i in range(0, 300, 100)]
    for bi, rows in enumerate(batches):
        with open(os.path.join(landing, f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n"
                )
        retrieval_index_ingest_stream(
            spark, landing, index_dir, ckpt, schema
        ).awaitTermination(180)

    streamed = spark.read.parquet(index_dir).drop("batch_id")
    full = spark.createDataFrame(docs, schema)
    rebuilt = inverted_index(full)
    s_rows = sorted(
        (r.t, r.doc_id, r.tf) for r in streamed.collect()
    )
    r_rows = sorted((r.t, r.doc_id, r.tf) for r in rebuilt.collect())
    queries = full.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    s_rank = sorted(
        tuple(r)
        for r in bm25_topk_from_index(streamed, queries, k=5).collect()
    )
    r_rank = sorted(
        tuple(r)
        for r in bm25_topk_from_index(rebuilt, queries, k=5).collect()
    )
    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "postings_rows": len(s_rows),
        "postings_match": s_rows == r_rows,
        "ranking_match": s_rank == r_rank,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (report["postings_match"] and report["ranking_match"]):
        raise SystemExit("streamed index diverged from batch rebuild")


if __name__ == "__main__":
    main()
