"""Drive the BM25 postings ingest stream under ``local-cluster`` with
a MID-STREAM COMPACTION and prove it is invisible to retrieval: a
TWIN pipeline ingesting the identical batches WITHOUT compaction must
produce the same postings rows and the same BM25 top-k rankings
through the watermark-filtered reader (``postings_from_store``), and
a full checkpoint-wipe replay over the compacted store must not
double any row (the stream-side watermark skip). NOTE the wipe leg's
scope: it re-delivers exactly the already-ingested file set, proving
folded content is not double-published; it is NOT a general
checkpoint-loss recovery claim — if NEW files had landed before the
wiped restart they could be renumbered under the watermark and
dropped (the checkpoint-loss contract in
pipeline.retrieval_index_ingest_stream's docstring).

Round-11 VERDICT #6 close — the eighth store family to get the
compaction lifecycle. The pytest (test_llm19) covers local mode; this
drive crosses real executor process boundaries on the sf0.01 corpus.

Usage: python tools/stream_postings_compaction_drive.py \
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
    compact_batch_partitions,
    compaction_watermark,
)
from synthea_etl_spark.operators.retrieval import (  # noqa: E402
    bm25_topk_from_index,
)
from synthea_etl_spark.pipeline import (  # noqa: E402
    postings_from_store,
    retrieval_index_ingest_stream,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_postings_compaction_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "postings-compaction-drive",
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
    queries = spark.createDataFrame(
        [(i, docs[i * 37 % len(docs)].text) for i in range(8)],
        "query_id long, query_text string",
    ).localCheckpoint()

    def make_pipeline(tag):
        work = tempfile.mkdtemp(prefix=f"postings_{tag}_")
        paths = {
            "work": work,
            "landing": os.path.join(work, "landing"),
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
        retrieval_index_ingest_stream(
            spark, paths["landing"], paths["index"], paths["ckpt"], schema
        ).awaitTermination(600)

    compacted = make_pipeline("compacted")
    plain = make_pipeline("plain")

    mid_rank_pre = mid_rank_post = None
    for bi, rows in enumerate(batches):
        land_and_run(compacted, bi, rows)
        land_and_run(plain, bi, rows)
        if bi == 1:
            mid_rank_pre = ranking(spark, compacted, queries)
            compact_batch_partitions(spark, compacted["index"], 1)
            mid_rank_post = ranking(spark, compacted, queries)

    def rows_of(paths):
        return sorted(
            (r.t, r.doc_id, r.tf)
            for r in postings_from_store(spark, paths["index"]).collect()
        )

    rows_c, rows_p = rows_of(compacted), rows_of(plain)
    rank_c = ranking(spark, compacted, queries)
    rank_p = ranking(spark, plain, queries)

    # checkpoint-wipe replay: every batch replays against the
    # compacted store; folded ones must hit the watermark skip
    shutil.rmtree(compacted["ckpt"])
    retrieval_index_ingest_stream(
        spark,
        compacted["landing"],
        compacted["index"],
        compacted["ckpt"],
        schema,
    ).awaitTermination(600)
    rows_replay = rows_of(compacted)

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(compacted["index"]),
        "n_postings_rows": len(rows_c),
        "postings_rows_match": rows_c == rows_p,
        "mid_compaction_ranking_unchanged": mid_rank_pre == mid_rank_post,
        "final_rankings_match": rank_c == rank_p,
        "replay_after_ckpt_wipe_is_noop": rows_replay == rows_c,
    }
    spark.stop()
    for p in (compacted, plain):
        shutil.rmtree(p["work"], ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not all(
        report[k]
        for k in (
            "postings_rows_match",
            "mid_compaction_ranking_unchanged",
            "final_rankings_match",
            "replay_after_ckpt_wipe_is_noop",
        )
    ):
        raise SystemExit("compaction changed retrieval semantics")


def ranking(spark, paths, queries):
    return sorted(
        (r.query_id, r.rank, r.doc_id)
        for r in bm25_topk_from_index(
            postings_from_store(spark, paths["index"]), queries, k=5
        ).collect()
    )


if __name__ == "__main__":
    main()
