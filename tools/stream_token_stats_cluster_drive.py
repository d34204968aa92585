"""Drive the token-distribution store end to end under
``local-cluster``: stream-ingest the corpus in batches on real
executor processes, COMPACT mid-stream, keep ingesting, and assert:

1. drift parity — ``drift_from_token_store`` over the accumulated
   store equals the all-batch q222 report row for row;
2. replay safety across compaction — re-publishing a folded batch
   is a no-op (watermark) and a live batch idempotent (dynamic
   overwrite);
3. the store stays store-sized — row count is (sources x vocab)-ish,
   never corpus-shaped.

Usage: python tools/stream_token_stats_cluster_drive.py \
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

from pyspark.sql.types import (  # noqa: E402
    LongType,
    StringType,
    StructField,
    StructType,
)

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    compact_counting_slices,
    compaction_watermark,
    drift_from_token_store,
    token_stats_store,
)
from synthea_etl_spark.pipeline import token_stats_ingest_stream  # noqa: E402
from synthea_etl_spark.plans.llm18 import (  # noqa: E402
    _DRIFT_THRESHOLD_MICRO,
    q222_token_drift_monitor,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_token_stats_cluster_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-token-stats-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_tokstats_drive_")
    landing = os.path.join(work, "landing")
    store = os.path.join(work, "store")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )

    docs = (
        spark.read.parquet(os.path.join(args.sf_dir, "documents.parquet"))
        .select("doc_id", "source", "text")
        .orderBy("doc_id")
        .collect()
    )
    quarter = (len(docs) + 3) // 4
    batches = [docs[i : i + quarter] for i in range(0, len(docs), quarter)]

    def land_and_run(bi, rows):
        with open(os.path.join(landing, f"b{bi}.json"), "w") as fh:
            for r in rows:
                fh.write(
                    json.dumps(
                        {"doc_id": r.doc_id, "source": r.source, "text": r.text}
                    )
                    + "\n"
                )
        token_stats_ingest_stream(
            spark, landing, store, ckpt, schema
        ).awaitTermination(300)

    land_and_run(0, batches[0])
    land_and_run(1, batches[1])
    compact_counting_slices(spark, store, 1, ["source", "t"], "c")
    for bi in range(2, len(batches)):
        land_and_run(bi, batches[bi])

    def report(df):
        return {
            (r.source, r.n_tokens, r.kl_micro, r.drifted)
            for r in df.collect()
        }

    want = report(q222_token_drift_monitor(spark, args.sf_dir))
    got = report(
        drift_from_token_store(spark, store, _DRIFT_THRESHOLD_MICRO)
    )
    drift_match = got == want

    # replay a FOLDED batch and a LIVE batch
    b0 = spark.createDataFrame(
        [(r.doc_id, r.source, r.text) for r in batches[0]],
        "doc_id long, source string, text string",
    )
    token_stats_store(b0, store, slice_id="batch0")
    last = spark.createDataFrame(
        [(r.doc_id, r.source, r.text) for r in batches[-1]],
        "doc_id long, source string, text string",
    )
    token_stats_store(last, store, slice_id=f"batch{len(batches) - 1}")
    replay_match = (
        report(drift_from_token_store(spark, store, _DRIFT_THRESHOLD_MICRO))
        == want
    )

    store_rows = spark.read.parquet(store).count()
    report_out = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(store),
        "store_rows": store_rows,
        "drift_matches_batch_q222": drift_match,
        "replay_after_compaction_is_noop": replay_match,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report_out, f, indent=1)
    print(json.dumps(report_out))
    if not (drift_match and replay_match):
        raise SystemExit("token-stats stream drive diverged")


if __name__ == "__main__":
    main()
