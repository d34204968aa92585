"""Round-12 VERDICT #4 close, cluster leg: drive the VERSIONED IVF
lifecycle under ``local-cluster`` — publish an (index, centroids)
pair, resolve it from a reader, roll the quantizer over (new version
+ single pointer flip), prune with a grace, and prove:

1. the reader's PRE-FLIP plan (index scan + probe against the old
   centroids) still executes to completion AFTER the rollover and
   the grace-respecting prune (zero failures mid-probe),
2. a fresh resolve sees the new pair, and rollover == fresh rebuild
   row-for-row (the q204-class invariant on the versioned layout),
3. after the grace elapses, prune removes exactly the superseded
   version and the current one keeps serving.

Usage: python tools/ivf_versioned_rollover_drive.py
       [--master local-cluster[2,4,4096]] [--out <json>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import synthea_etl_spark.operators.similarity as S  # noqa: E402
from synthea_etl_spark.operators.scd2 import prune_versions  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--master", default="local-cluster[2,4,4096]")
    ap.add_argument(
        "--out", default="bench_artifacts/ivf_versioned_rollover_drive.json"
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = get_session(
        "ivf-versioned-rollover-drive",
        master=args.master,
        shuffle_partitions=8,
        extra_conf={"spark.executorEnv.PYTHONPATH": REPO},
    )
    spark.range(0, 100, 1, 4).selectExpr("sum(id)").collect()
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size() - 1

    corpus = spark.read.parquet(
        os.path.join(args.sf_dir, "embeddings.parquet")
    ).select("vec_id", "embedding")
    work = tempfile.mkdtemp(prefix="ivf_versioned_")
    root = os.path.join(work, "ivf")

    c1 = S.ivf_train_centroids(
        corpus, "vec_id", "embedding", n_centroids=8, lloyd_iters=0
    )
    S.ivf_publish_versioned(spark, S.ivf_index(corpus, c1), c1, root)

    # reader resolves v=1 and PLANS a probe (lazy — executes later)
    old_index, old_cents = S.ivf_read_current(spark, root)
    queries = corpus.limit(16).withColumnRenamed("vec_id", "qid")
    planned = S.knn_ann_ivf_probe(
        old_index, old_cents, queries,
        id_col="qid", vec_col="embedding", k=5, n_probe=3,
    )

    # rollover publishes v=2; prune with a long grace keeps v=1
    new_c = S.ivf_index_rollover_versioned(
        spark, root, n_centroids=5, lloyd_iters=1, prune_grace_s=3600
    )
    v1_alive_after_rollover = os.path.isdir(os.path.join(root, "v=1"))

    # the pre-flip plan executes across executor processes, post-prune
    pre_flip_rows = len(planned.collect())

    new_index, new_cents = S.ivf_read_current(spark, root)
    fresh = S.ivf_index(corpus, new_c)
    rollover_equals_rebuild = sorted(
        (r.cluster, r.neighbor_id, tuple(r.cv))
        for r in new_index.collect()
    ) == sorted(
        (r.cluster, r.neighbor_id, tuple(r.cv)) for r in fresh.collect()
    )

    # grace elapses (judged by the superseding version's age) ->
    # prune collects exactly v=1; current keeps serving
    past = time.time() - 100
    os.utime(os.path.join(root, "_CURRENT"), (past, past))
    os.utime(os.path.join(root, "v=1"), (past, past))
    os.utime(os.path.join(root, "v=2"), (past, past))
    pruned = [os.path.basename(p) for p in prune_versions(root, 50)]
    post_prune_probe_rows = len(
        S.knn_ann_ivf_probe(
            new_index, new_cents, queries,
            id_col="qid", vec_col="embedding", k=5, n_probe=3,
        ).collect()
    )

    report = {
        "master": args.master,
        "n_executors": n_exec,
        "n_vectors": corpus.count(),
        "v1_alive_after_rollover_with_grace": v1_alive_after_rollover,
        "pre_flip_plan_rows_after_rollover_and_prune": pre_flip_rows,
        "rollover_equals_fresh_rebuild": rollover_equals_rebuild,
        "pruned_after_grace": pruned,
        "post_prune_probe_rows": post_prune_probe_rows,
        "zero_reader_failures": True,
    }
    spark.stop()
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not (
        report["v1_alive_after_rollover_with_grace"]
        and report["rollover_equals_fresh_rebuild"]
        and report["pre_flip_plan_rows_after_rollover_and_prune"] > 0
        and report["pruned_after_grace"] == ["v=1"]
        and report["post_prune_probe_rows"] > 0
    ):
        raise SystemExit("versioned rollover drive failed")


if __name__ == "__main__":
    main()
