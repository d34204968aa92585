"""Drive the streaming curation funnel under ``local-cluster`` —
real executor processes running the foreachBatch dedup/quality/
repetition stages (including the Arrow dict-counting cov pass
crossing process boundaries) with dynamic-partition-overwrite
publication — and verify the accumulated per-doc verdicts equal the
batch q192 funnel's first three stages on the union corpus. The
curation-side sibling of tools/stream_ann_cluster_drive.py.

The comparison excludes the quota stage by construction: the stream
deliberately does not quota (corpus-wide state breaks replay
idempotence — see pipeline.curation_ingest_stream), so batch-side
'quota' and 'admitted' both count as stream-'admitted'. Dedup
winners may differ legitimately when a duplicate lands in an
EARLIER batch than the batch funnel's min-doc_id winner; the driver
feeds batches in doc_id order so first-landed == min-id and the
comparison is exact.

Usage: python tools/stream_curation_cluster_drive.py \
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

from synthea_etl_spark.pipeline import curation_ingest_stream  # noqa: E402
from synthea_etl_spark.plans.llm8 import q192_curation_funnel  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/stream_curation_cluster_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-curation-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_curation_drive_")
    landing = os.path.join(work, "landing")
    admitted_dir = os.path.join(work, "admitted")
    verdicts_dir = os.path.join(work, "verdicts")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("lang", StringType()),
            StructField("text", StringType()),
        ]
    )

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "lang", "text")
        .orderBy("doc_id")
        .collect()
    )
    # doc_id-ordered batches => first-landed == min-id dup winner
    third = (len(docs) + 2) // 3
    batches = [docs[i : i + third] for i in range(0, len(docs), third)]
    for bi, rows in enumerate(batches):
        with open(os.path.join(landing, f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps(
                        {"doc_id": r.doc_id, "lang": r.lang, "text": r.text}
                    )
                    + "\n"
                )
        curation_ingest_stream(
            spark, landing, admitted_dir, verdicts_dir, ckpt, schema
        ).awaitTermination(300)

    streamed = {
        r.doc_id: r.stage
        for r in spark.read.parquet(verdicts_dir).collect()
    }
    batch_stage = {
        r.doc_id: ("admitted" if r.stage == "quota" else r.stage)
        for r in q192_curation_funnel(spark, args.sf_dir).collect()
    }
    mismatches = {
        d: (streamed.get(d), batch_stage.get(d))
        for d in set(streamed) | set(batch_stage)
        if streamed.get(d) != batch_stage.get(d)
    }
    admitted_ids = sorted(
        r.doc_id for r in spark.read.parquet(admitted_dir).collect()
    )
    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "verdicts_match_batch_funnel": not mismatches,
        "n_mismatches": len(mismatches),
        "sample_mismatches": dict(list(mismatches.items())[:5]),
        "n_admitted": len(admitted_ids),
        "stage_histogram": {
            s: sum(1 for v in streamed.values() if v == s)
            for s in sorted(set(streamed.values()))
        },
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if mismatches:
        raise SystemExit("streamed verdicts diverged from the batch funnel")


if __name__ == "__main__":
    main()
