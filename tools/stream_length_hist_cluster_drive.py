"""Drive the length-quantile histogram store (10th stream family)
end to end under ``local-cluster``: stream-ingest the corpus in
batches on real executor processes, COMPACT mid-stream, keep
ingesting, and assert:

1. quantile parity — ``quantiles_from_hist_store`` over the
   accumulated store equals the quantiles computed from a one-shot
   histogram of the whole corpus (merge-exactness across slices AND
   the compaction boundary);
2. the one-bin error bound holds per (source, q) against the exact
   order statistic;
3. replay safety across compaction — re-publishing a folded batch is
   a no-op (watermark) and a live batch idempotent (dynamic
   overwrite);
4. the store stays store-sized — (sources x ~bins), never
   corpus-shaped.

Usage: python tools/stream_length_hist_cluster_drive.py \
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

from synthea_etl_spark.operators.dedup import (  # noqa: E402
    compact_counting_slices,
    compaction_watermark,
    length_hist_store,
    quantiles_from_hist_store,
)
from synthea_etl_spark.operators.text import token_count  # noqa: E402
from synthea_etl_spark.pipeline import length_hist_ingest_stream  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402

QS = [500, 900, 990]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out",
        default="bench_artifacts/stream_length_hist_cluster_drive.json",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-length-hist-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_lenhist_drive_")
    landing = os.path.join(work, "landing")
    store = os.path.join(work, "store")
    oneshot = os.path.join(work, "oneshot")
    ckpt = os.path.join(work, "ckpt")
    os.makedirs(landing)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("source", StringType()),
            StructField("text", StringType()),
        ]
    )

    docs_df = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).select("doc_id", "source", "text")
    docs = docs_df.orderBy("doc_id").collect()
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
        length_hist_ingest_stream(
            spark, landing, store, ckpt, schema
        ).awaitTermination(300)

    land_and_run(0, batches[0])
    land_and_run(1, batches[1])
    compact_counting_slices(spark, store, 1, ["source", "b"], "c")
    for bi in range(2, len(batches)):
        land_and_run(bi, batches[bi])

    def quants(path):
        return {
            (r.source, r.q_permille): (r.n_docs, r.approx)
            for r in quantiles_from_hist_store(spark, path, QS).collect()
        }

    got = quants(store)
    length_hist_store(docs_df, oneshot, "batch1")
    want = quants(oneshot)
    merge_match = got == want

    # one-bin bound vs exact order statistics
    base = docs_df.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", "source", token_count("text").cast("long").alias("n")
    ).filter(F.col("n") > 0)
    w = Window.partitionBy("source").orderBy("n", "doc_id")
    ranked = base.select(
        "source", "n", F.row_number().over(w).alias("rn")
    ).collect()
    by_src: dict[str, list[int]] = {}
    for r in sorted(ranked, key=lambda r: (r.source, r.rn)):
        by_src.setdefault(r.source, []).append(r.n)
    bound_ok = True
    for (src, q), (n_docs, approx) in got.items():
        vals = by_src[src]
        k = (q * n_docs + 999) // 1000
        exact = vals[k - 1]
        if not (approx <= exact <= approx + approx // 8):
            bound_ok = False

    # replay a FOLDED batch and a LIVE batch
    b0 = spark.createDataFrame(
        [(r.doc_id, r.source, r.text) for r in batches[0]],
        "doc_id long, source string, text string",
    )
    length_hist_store(b0, store, slice_id="batch0")
    last = spark.createDataFrame(
        [(r.doc_id, r.source, r.text) for r in batches[-1]],
        "doc_id long, source string, text string",
    )
    length_hist_store(last, store, slice_id=f"batch{len(batches) - 1}")
    replay_match = quants(store) == want

    store_rows = spark.read.parquet(store).count()
    report_out = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(store),
        "store_rows": store_rows,
        "quantiles_match_oneshot": merge_match,
        "one_bin_bound_holds": bound_ok,
        "replay_after_compaction_is_noop": replay_match,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report_out, f, indent=1)
    print(json.dumps(report_out))
    if not (merge_match and bound_ok and replay_match):
        raise SystemExit("length-hist stream drive diverged")


if __name__ == "__main__":
    main()
