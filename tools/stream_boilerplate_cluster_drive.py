"""Drive the boilerplate line-frequency store end to end under
``local-cluster``: stream-ingest the corpus in batches on real
executor processes, COMPACT mid-stream, keep ingesting, and assert:

1. store-frequency parity — sum-over-slices (compacted + live
   batches) equals the one-shot corpus line frequency;
2. verdict parity — cleaning every document against
   ``boilerplate_from_store`` reproduces q212's inline
   (n_removed, tokens_removed) per doc exactly;
3. replay safety across compaction — re-publishing a folded batch
   after compaction is a no-op (watermark), and re-publishing a
   live batch is idempotent (dynamic overwrite).

The mid-stream compaction is the point: a year of 5-minute ingest
batches is ~100k slice partitions, and this drive proves the fold
is transparent to both the readers and the resumed stream.

Usage: python tools/stream_boilerplate_cluster_drive.py \
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
    boilerplate_from_store,
    compact_line_frequency_store,
    compaction_watermark,
    line_frequency_slice,
    line_frequency_store,
)
from synthea_etl_spark.pipeline import boilerplate_ingest_stream  # noqa: E402
from synthea_etl_spark.plans.llm16 import (  # noqa: E402
    _MIN_DOCS,
    q212_boilerplate_line_removal,
)
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_boilerplate_cluster_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-boilerplate-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_boiler_drive_")
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
        boilerplate_ingest_stream(
            spark, landing, store, ckpt, schema
        ).awaitTermination(300)

    # ingest 2 batches, compact, ingest the rest
    land_and_run(0, batches[0])
    land_and_run(1, batches[1])
    compact_line_frequency_store(spark, store, upto_batch=1)
    for bi in range(2, len(batches)):
        land_and_run(bi, batches[bi])

    corpus = spark.createDataFrame(
        [(r.doc_id, r.text) for r in docs], "doc_id long, text string"
    )
    batch_freq = {
        (r.fp, r.n_docs) for r in line_frequency_slice(corpus).collect()
    }
    store_freq = {
        (r.fp, r.n_docs)
        for r in boilerplate_from_store(spark, store, min_docs=1).collect()
    }
    freq_match = store_freq == batch_freq

    # replay a FOLDED batch (must be invisible) and a LIVE batch
    # (must be idempotent)
    b0 = spark.createDataFrame(
        [(r.doc_id, r.text) for r in batches[0]], "doc_id long, text string"
    )
    line_frequency_store(b0, store, slice_id="batch0")
    last = spark.createDataFrame(
        [(r.doc_id, r.text) for r in batches[-1]], "doc_id long, text string"
    )
    line_frequency_store(last, store, slice_id=f"batch{len(batches) - 1}")
    replay_freq = {
        (r.fp, r.n_docs)
        for r in boilerplate_from_store(spark, store, min_docs=1).collect()
    }
    replay_match = replay_freq == batch_freq

    # verdict parity: store-driven cleaning == q212's inline verdict
    boiler = boilerplate_from_store(spark, store, min_docs=_MIN_DOCS)
    from synthea_etl_spark.plans.llm16 import _lines

    marked = _lines(spark, args.sf_dir).join(
        boiler.select("fp"), "fp", "left_semi"
    )
    store_removed = {
        (r.doc_id, r.n_removed, r.tokens_removed)
        for r in marked.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_removed"),
            F.sum("line_tokens").cast("long").alias("tokens_removed"),
        )
        .collect()
    }
    inline = {
        (r.doc_id, r.n_removed, r.tokens_removed)
        for r in q212_boilerplate_line_removal(spark, args.sf_dir)
        .filter(F.col("n_removed") > 0)
        .collect()
    }
    verdict_match = store_removed == inline

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(store),
        "freq_matches_batch": freq_match,
        "replay_after_compaction_is_noop": replay_match,
        "store_verdicts_match_inline_q212": verdict_match,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (freq_match and replay_match and verdict_match):
        raise SystemExit("boilerplate stream drive diverged")


if __name__ == "__main__":
    main()
