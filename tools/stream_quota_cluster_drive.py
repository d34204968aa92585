"""Drive the FULL curation pipeline — streaming funnel + batch quota
— under ``local-cluster`` and assert parity with the all-batch
composition (round-9 VERDICT ask #7).

The per-language quota is deliberately a batch PLANNING-TIME pass
(corpus-wide admission counts break stream replay idempotence — see
pipeline.curation_ingest_stream). This drive runs the production
shape end to end as ONE pipeline:

1. funnel-stream: curation_ingest_stream ingests the corpus in
   doc_id-ordered batches on real executor processes
   (local-cluster), accumulating the per-doc verdicts table and the
   admitted table;
2. quota-batch: the q192 quota stage (per-language rank by
   md5(doc_id), cap _Q192_QUOTA) runs over the ACCUMULATED admitted
   table — reading only funnel survivors, never the corpus;
3. admitted manifest: the post-quota keep set.

Parity asserted against the all-batch q192 funnel on the union
corpus: the manifest must equal q192's 'admitted' set exactly, and
the stream-admitted-but-quota-cut remainder must equal q192's
'quota' set — i.e. composing the stream with the planning pass is
the batch funnel, doc for doc.

Usage: python tools/stream_quota_cluster_drive.py \
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

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from synthea_etl_spark.pipeline import curation_ingest_stream  # noqa: E402
from synthea_etl_spark.plans.llm8 import (  # noqa: E402
    _Q192_QUOTA,
    q192_curation_funnel,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def quota_plan(admitted, quota: int):
    """The batch planning pass over the stream's accumulated admitted
    table: q192's quota stage verbatim — per-language rank by
    (md5(doc_id), doc_id), keep rank <= quota. Reads funnel
    survivors only (the admitted table), never the corpus."""
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    return (
        admitted.select("doc_id", "lang")
        .withColumn("_qrn", F.row_number().over(w))
        .filter(F.col("_qrn") <= quota)
        .select("doc_id", "lang")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/stream_quota_cluster_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-quota-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_quota_drive_")
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

    # --- the batch quota planning pass over the accumulated table ---
    stream_admitted = spark.read.parquet(admitted_dir)
    manifest = {
        r.doc_id for r in quota_plan(stream_admitted, _Q192_QUOTA).collect()
    }
    stream_admitted_ids = {
        r.doc_id for r in stream_admitted.select("doc_id").collect()
    }
    quota_cut = stream_admitted_ids - manifest

    # --- all-batch reference: q192 on the union corpus ---
    batch_stage = {
        r.doc_id: r.stage
        for r in q192_curation_funnel(spark, args.sf_dir).collect()
    }
    batch_admitted = {d for d, s in batch_stage.items() if s == "admitted"}
    batch_quota = {d for d, s in batch_stage.items() if s == "quota"}

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "quota_per_lang": _Q192_QUOTA,
        "n_stream_admitted": len(stream_admitted_ids),
        "n_manifest": len(manifest),
        "n_quota_cut": len(quota_cut),
        "manifest_matches_batch_admitted": manifest == batch_admitted,
        "quota_cut_matches_batch_quota": quota_cut == batch_quota,
        "sample_manifest_diff": sorted(manifest ^ batch_admitted)[:5],
        "sample_quota_diff": sorted(quota_cut ^ batch_quota)[:5],
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if manifest != batch_admitted or quota_cut != batch_quota:
        raise SystemExit(
            "stream+quota composition diverged from the batch funnel"
        )


if __name__ == "__main__":
    main()
