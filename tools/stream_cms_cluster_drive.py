"""Drive the frequency-sandwich pair (12th stream family: Count-Min
upper store + candidate lower store) end to end under
``local-cluster``: stream-ingest the corpus in batches on real
executor processes via ``cms_sandwich_ingest_stream``, COMPACT the
CMS store mid-stream, keep ingesting, and assert:

1. merge parity — streamed+compacted CMS cells equal a ONE-SHOT
   store of the whole corpus (linear sketch), and the candidate
   totals equal a manual rebuild with the SAME batch axis (candidate
   slices are batch-relative by design);
2. sandwich bounds — est >= exact for every corpus term, lower <=
   exact for every candidate, against exact corpus counts;
3. erasure — publish both deletion slices for an erased doc set:
   the CMS answers bit-identically to a rebuild from survivors
   (immediately AND post-compaction) and candidate nets stay a
   valid lower bound of the true surviving counts;
4. replay safety — re-publishing a folded batch is a no-op;
5. bounded state — live CMS rows <= D*W regardless of corpus size,
   live candidate rows <= k per live slice.

Usage: python tools/stream_cms_cluster_drive.py \
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
    CMS_D,
    CMS_W,
    HH_K,
    batch_term_counts,
    cms_estimate_from_store,
    cms_slice_from_counts,
    cms_store,
    compact_counting_slices,
    compaction_watermark,
    counting_store_totals,
    deletion_slice,
    hh_candidate_store,
    hh_lower_from_store,
    publish_counting_slice,
)
from synthea_etl_spark.pipeline import cms_sandwich_ingest_stream  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/stream_cms_cluster_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    spark = get_session(
        "stream-cms-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    work = tempfile.mkdtemp(prefix="stream_cms_drive_")
    landing = os.path.join(work, "landing")
    cms = os.path.join(work, "cms")
    cand = os.path.join(work, "cand")
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
        cms_sandwich_ingest_stream(
            spark, landing, cms, cand, ckpt, schema
        ).awaitTermination(300)

    land_and_run(0, batches[0])
    land_and_run(1, batches[1])
    compact_counting_slices(spark, cms, 1, ["d", "b"], "c")
    for bi in range(2, len(batches)):
        land_and_run(bi, batches[bi])

    def cms_cells(path):
        return {
            (r.d, r.b): r.c
            for r in counting_store_totals(
                spark, path, ["d", "b"], "c"
            ).collect()
        }

    def cand_net(path):
        return {
            r.t: r.c
            for r in counting_store_totals(spark, path, ["t"], "c").collect()
        }

    # 1. merge parity
    oneshot = os.path.join(work, "oneshot_cms")
    cms_store(docs_df, oneshot, "batch0")
    cms_match = cms_cells(cms) == cms_cells(oneshot)
    cand_manual = os.path.join(work, "manual_cand")
    for bi, rows in enumerate(batches):
        bdf = spark.createDataFrame(
            [(r.doc_id, r.source, r.text) for r in rows], schema
        )
        hh_candidate_store(bdf, cand_manual, f"batch{bi}")
    cand_match = cand_net(cand) == cand_net(cand_manual)

    # 2. sandwich bounds vs exact corpus counts
    exact = {r.t: r.c for r in batch_term_counts(docs_df).collect()}
    est = {
        r.t: r.est
        for r in cms_estimate_from_store(
            spark,
            cms,
            spark.createDataFrame([(t,) for t in exact], "t string"),
        ).collect()
    }
    upper_ok = all(est[t] >= c for t, c in exact.items())
    lower = {r.t: r.lower for r in hh_lower_from_store(spark, cand).collect()}
    lower_ok = all(exact[t] >= lo for t, lo in lower.items())
    n = sum(exact.values())
    complete_ok = all(
        t in lower for t, c in exact.items() if c * HH_K > n
    )

    # 3. erasure (docs %11==3), both stores, vs survivors rebuild
    erase = docs_df.filter(F.col("doc_id") % 11 == 3)
    survivors = docs_df.join(erase.select("doc_id"), "doc_id", "left_anti")
    ec = batch_term_counts(erase)
    publish_counting_slice(
        deletion_slice(cms_slice_from_counts(ec), ["c"]), cms, "batch9"
    )
    publish_counting_slice(deletion_slice(ec, ["c"]), cand, "batch9")
    cms_rebuilt = os.path.join(work, "rebuilt_cms")
    cms_store(survivors, cms_rebuilt, "batch0")
    erase_immediate = cms_cells(cms) == cms_cells(cms_rebuilt)
    compact_counting_slices(spark, cms, 9, ["d", "b"], "c")
    compact_counting_slices(spark, cand, 9, ["t"], "c")
    erase_post_compact = cms_cells(cms) == cms_cells(cms_rebuilt)
    # post-erasure candidate nets stay a VALID LOWER BOUND of the
    # true surviving counts (a survivor-rebuilt store's credits are
    # a *different* valid lower bound — batch thresholds are
    # relative, so the two are incomparable; the contract is the
    # bound, not slice-for-slice parity)
    exact_surv = {r.t: r.c for r in batch_term_counts(survivors).collect()}
    cand_erase_ok = all(
        c <= exact_surv.get(t, 0)
        for t, c in cand_net(cand).items()
        if c > 0
    )

    # 4. replay a FOLDED batch is a no-op
    b0 = spark.createDataFrame(
        [(r.doc_id, r.source, r.text) for r in batches[0]], schema
    )
    cms_store(b0, cms, slice_id="batch0")
    hh_candidate_store(b0, cand, slice_id="batch0")
    replay_match = cms_cells(cms) == cms_cells(cms_rebuilt)

    # 5. bounded state
    cms_rows = counting_store_totals(spark, cms, ["d", "b"], "c").count()
    cand_rows = counting_store_totals(spark, cand, ["t"], "c").count()
    bounded_ok = cms_rows <= CMS_D * CMS_W and cand_rows <= HH_K * (
        len(batches) + 2
    )

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_batches": len(batches),
        "n_docs": len(docs),
        "compacted_upto": compaction_watermark(cms),
        "cms_rows": cms_rows,
        "cand_rows": cand_rows,
        "cms_matches_oneshot": cms_match,
        "cand_matches_same_axis_rebuild": cand_match,
        "upper_bound_holds": upper_ok,
        "lower_bound_holds": lower_ok,
        "heavy_candidates_complete": complete_ok,
        "erasure_immediate_match": erase_immediate,
        "erasure_post_compaction_match": erase_post_compact,
        "cand_erasure_valid_lower_bound": cand_erase_ok,
        "replay_after_compaction_is_noop": replay_match,
        "state_bounded": bounded_ok,
    }
    spark.stop()
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not all(
        v for k, v in report.items()
        if isinstance(v, bool)
    ):
        raise SystemExit("cms sandwich stream drive diverged")


if __name__ == "__main__":
    main()
