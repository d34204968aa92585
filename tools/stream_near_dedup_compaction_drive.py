"""Drive the near-dedup ingest stream under ``local-cluster`` with a
MID-STREAM COMPACTION of both stores (corpus + band index) and prove
compaction is invisible to dedup semantics: a TWIN pipeline ingesting
the identical batches WITHOUT compaction must end with exactly the
same surviving documents and the same band-index content.

This is the subtle family for compaction: the stream's history probe
reads ``batch_id < current`` and the compacted partition must keep
riding that filter (it lands at the versioned negative id) while
folded batch dirs — including crash leftovers — stay invisible. The
pytest covers local mode; this drive crosses real executor process
boundaries and uses the sf0.01 corpus (which carries planted
duplicates).

Usage: python tools/stream_near_dedup_compaction_drive.py \
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

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    batch_watermark_filter,
    compact_batch_partitions,
    compaction_watermark,
)
from synthea_etl_spark.pipeline import near_dedup_ingest_stream  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_near_dedup_compaction_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "near-dedup-compaction-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    quarter = (len(docs) + 3) // 4
    batches = [docs[i : i + quarter] for i in range(0, len(docs), quarter)]
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def make_pipeline(tag):
        work = tempfile.mkdtemp(prefix=f"near_dedup_{tag}_")
        paths = {
            "work": work,
            "landing": os.path.join(work, "landing"),
            "corpus": os.path.join(work, "corpus"),
            "index": os.path.join(work, "index"),
            "ckpt": os.path.join(work, "ckpt"),
        }
        os.makedirs(paths["landing"])
        return paths

    def land_and_run(paths, bi, rows):
        with open(os.path.join(paths["landing"], f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n"
                )
        near_dedup_ingest_stream(
            spark,
            paths["landing"],
            paths["corpus"],
            paths["index"],
            paths["ckpt"],
            schema,
        ).awaitTermination(600)

    compacted = make_pipeline("compacted")
    plain = make_pipeline("plain")

    for bi, rows in enumerate(batches):
        land_and_run(compacted, bi, rows)
        land_and_run(plain, bi, rows)
        if bi == 1:
            # mid-stream fold of batches 0..1 in BOTH stores of the
            # compacted pipeline only
            compact_batch_partitions(spark, compacted["corpus"], 1)
            compact_batch_partitions(spark, compacted["index"], 1)

    def corpus_ids(paths):
        return sorted(
            r.doc_id
            for r in batch_watermark_filter(
                spark.read.parquet(paths["corpus"]), paths["corpus"]
            )
            .select("doc_id")
            .collect()
        )

    def index_rows(paths):
        return sorted(
            (r.doc_id, r.band, r.bh)
            for r in batch_watermark_filter(
                spark.read.parquet(paths["index"]), paths["index"]
            )
            .select("doc_id", "band", "bh")
            .collect()
        )

    ids_c, ids_p = corpus_ids(compacted), corpus_ids(plain)
    idx_c, idx_p = index_rows(compacted), index_rows(plain)

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(compacted["corpus"]),
        "n_survivors_compacted": len(ids_c),
        "n_survivors_plain": len(ids_p),
        "survivors_match": ids_c == ids_p,
        "index_rows_match": idx_c == idx_p,
    }
    spark.stop()
    for p in (compacted, plain):
        shutil.rmtree(p["work"], ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (report["survivors_match"] and report["index_rows_match"]):
        raise SystemExit("compaction changed near-dedup semantics")


if __name__ == "__main__":
    main()
