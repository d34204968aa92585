"""Drive the prompt-key cluster store end to end under
``local-cluster``: stream-ingest the corpus in batches on real
executor processes, COMPACT mid-stream, keep ingesting, and assert:

1. dedup parity — the per-doc frame reassembled from
   ``prompt_clusters_from_store`` equals the all-batch q233 report
   row for row (mergeable SUM/MIN partials re-merge across the
   compaction boundary);
2. replay safety across compaction — re-publishing a folded batch
   is invisible to the watermark-filtered reader and a live batch
   idempotent (dynamic overwrite);
3. the store stays store-sized — row count is distinct-prompt-ish,
   never corpus-shaped.

Usage: python tools/stream_prompt_dedup_cluster_drive.py \
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

import synthea_etl_spark.operators.text as T  # noqa: E402
from synthea_etl_spark.operators.dedup import (  # noqa: E402
    PROMPT_KEY_AGGS,
    compact_agg_slices,
    compaction_watermark,
    prompt_clusters_from_store,
    prompt_key_store,
)
from synthea_etl_spark.pipeline import prompt_key_ingest_stream  # noqa: E402
from synthea_etl_spark.plans.llm22 import (  # noqa: E402
    _PROMPT_TOKENS,
    q233_prompt_dedup,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_prompt_dedup_cluster_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-prompt-dedup-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_promptkey_drive_")
    landing = os.path.join(work, "landing")
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("text", StringType()),
        ]
    )

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )
    quarter = (len(docs) + 3) // 4
    batches = [docs[i : i + quarter] for i in range(0, len(docs), quarter)]

    def land_and_run(bi, rows):
        with open(os.path.join(landing, f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps({"doc_id": r.doc_id, "text": r.text}) + "\n"
                )
        prompt_key_ingest_stream(
            spark, landing, store, ckpt, schema
        ).awaitTermination(300)

    land_and_run(0, batches[0])
    land_and_run(1, batches[1])
    compact_agg_slices(spark, store, 1, ["pkey"], PROMPT_KEY_AGGS)
    for bi in range(2, len(batches)):
        land_and_run(bi, batches[bi])

    def from_store():
        keyed = (
            spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
            .filter(T.token_count("text") > 0)
            .select(
                "doc_id",
                F.md5(
                    F.concat_ws(
                        " ", F.slice(T.tokens("text"), 1, _PROMPT_TOKENS)
                    )
                ).alias("pkey"),
            )
        )
        joined = keyed.join(prompt_clusters_from_store(spark, store), "pkey")
        return {
            (r.doc_id, r.pkey, r.cluster_n, r.doc_id == r.rep_doc_id,
             r.rep_doc_id)
            for r in joined.collect()
        }

    want = {tuple(r) for r in q233_prompt_dedup(spark, args.sf_dir).collect()}
    dedup_match = from_store() == want

    # replay a FOLDED batch (invisible below the watermark) and a
    # LIVE batch (idempotent dynamic overwrite)
    b0 = spark.createDataFrame(
        [(r.doc_id, r.text) for r in batches[0]],
        "doc_id long, text string",
    )
    prompt_key_store(b0, store, slice_id="batch0")
    last = spark.createDataFrame(
        [(r.doc_id, r.text) for r in batches[-1]],
        "doc_id long, text string",
    )
    prompt_key_store(last, store, slice_id=f"batch{len(batches) - 1}")
    replay_match = from_store() == want

    store_rows = spark.read.parquet(store).count()
    report_out = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(store),
        "store_rows": store_rows,
        "dedup_matches_batch_q233": dedup_match,
        "replay_after_compaction_is_noop": replay_match,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report_out, f, indent=1)
    print(json.dumps(report_out))
    if not (dedup_match and replay_match):
        raise SystemExit("prompt-key stream drive diverged")


if __name__ == "__main__":
    main()
