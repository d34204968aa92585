"""Recall-vs-n_probe curve for the grouped IVF ANN path at scale —
the one ANN quality metric not pinned by the correctness gate (which
certifies determinism and exactness-within-probed-cells, not how many
true neighbors the coarse quantizer's probe set covers).

For each n_probe in the sweep: run ``knn_ann_ivf_grouped`` (trained
centroids, per-cluster BLAS scoring) and score recall@k against the
exact ``knn_bruteforce`` truth on the same corpus/queries. Centroids
follow the SCALE.md O(√n) sizing rule by default. Also records each
setting's wall time so the recall/latency trade is one table.

Usage: python tools/ivf_recall_curve.py \
          [--sf-dir /tmp/sparkgraft_sf10] [--n-queries 100] [--k 10] \
          [--probes 1,2,3,4,6,8] [--out bench_artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import synthea_etl_spark.operators.similarity as S  # noqa: E402
from synthea_etl_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/tmp/sparkgraft_sf10")
    ap.add_argument("--n-queries", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--probes", default="1,2,3,4,6,8")
    ap.add_argument("--n-centroids", type=int, default=0, help="0 = O(sqrt n)")
    ap.add_argument("--lloyd-iters", type=int, default=1)
    ap.add_argument(
        "--jitter",
        type=float,
        default=0.0,
        help="deterministic per-id gaussian perturbation, relative to "
        "each vector's norm. The sf10 replica tiles sf0.1 vectors as "
        "EXACT copies (gen_sf.py), so every query's true top-k are "
        "its own clones sharing its cell and recall saturates at 1.0 "
        "for any n_probe — a replica artifact, not quantizer "
        "quality. Jitter spreads the copies into genuine near-"
        "neighbors (applied identically to truth and index, so the "
        "measurement stays self-consistent).",
    )
    ap.add_argument("--out", default="bench_artifacts/ivf_recall_curve.json")
    args = ap.parse_args()

    spark = get_session("ivf-recall-curve")
    emb = (
        spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet"))
        .select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
    )
    if args.jitter > 0:
        from pyspark.sql.functions import pandas_udf

        eps = args.jitter

        @pandas_udf("array<double>")
        def jitter(ids: pd.Series, vs: pd.Series) -> pd.Series:
            out = []
            for i, v in zip(ids, vs):
                x = np.asarray(v, dtype="float64")
                g = np.random.default_rng(int(i)).standard_normal(len(x))
                out.append(
                    (x + eps * np.linalg.norm(x) * g / max(
                        np.linalg.norm(g), 1e-12
                    )).tolist()
                )
            return pd.Series(out)

        emb = emb.select(
            "vec_id", jitter(F.col("vec_id"), F.col("embedding")).alias("embedding")
        )
    emb = emb.localCheckpoint()
    n = emb.count()
    n_centroids = args.n_centroids or max(4, int(math.sqrt(n)))
    queries = emb.filter(F.col("vec_id") % 97 == 0).limit(args.n_queries)
    queries = spark.createDataFrame(queries.collect(), emb.schema)
    nq = queries.count()

    truth = {}
    t0 = time.time()
    for r in S.knn_bruteforce(emb, queries, k=args.k).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    brute_wall = round(time.time() - t0, 2)

    t0 = time.time()
    centroids = S.ivf_train_centroids(
        emb, n_centroids=n_centroids, lloyd_iters=args.lloyd_iters
    )
    train_wall = round(time.time() - t0, 2)
    index = S.ivf_index(emb, centroids).localCheckpoint()

    curve = []
    for n_probe in [int(x) for x in args.probes.split(",")]:
        t0 = time.time()
        got = {}
        for r in S.knn_ann_ivf_grouped_probe(
            index, centroids, queries, k=args.k, n_probe=n_probe
        ).collect():
            got.setdefault(r.query_id, set()).add(r.neighbor_id)
        wall = round(time.time() - t0, 2)
        hits = sum(len(truth[q] & got.get(q, set())) for q in truth)
        total = sum(len(v) for v in truth.values())
        curve.append(
            {
                "n_probe": n_probe,
                "recall_at_k": round(hits / total, 4),
                "wall_sec": wall,
                "probed_fraction": round(n_probe / n_centroids, 4),
            }
        )
        print(json.dumps(curve[-1]))

    report = {
        "sf_dir": args.sf_dir,
        "jitter": args.jitter,
        "n_vectors": n,
        "n_queries": nq,
        "k": args.k,
        "n_centroids": n_centroids,
        "lloyd_iters": args.lloyd_iters,
        "bruteforce_wall_sec": brute_wall,
        "train_wall_sec": train_wall,
        "curve": curve,
    }
    spark.stop()
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
