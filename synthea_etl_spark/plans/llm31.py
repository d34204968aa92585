"""Round-14 LLM-pipeline queries, batch 1: production-shape eval.

- q259 ranking metrics over the IVF ANN path: the q239 MRR/NDCG
  plumbing with its candidate source swapped from the brute-force
  O(n*q) scan to the seeded IVF quantizer (q160's exactly-checkable
  machinery: md5-seeded centroids, first-max assignment, top-4 probe)
  — the gated embodiment of q239's production story. q239 stays as
  the exact measurement twin (the by-design brute-force truth side);
  THIS is the shape a 100 TB eval harness actually runs: each query
  scores n_probe/n_centroids of the corpus, assignment is one Arrow
  matmul pass, and every metric aggregate lives on the query grain.

Reference scope: beyond-reference extension surface; methods public
(Jarvelin & Kekalainen 2002 for NDCG; IVF coarse quantization per
Jegou et al. 2011).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm23 import (
    MICRO,
    _RANK_K,
    _RANK_QUERIES,
    ranking_metrics_from_topk,
)

# q259 IVF geometry — q160's certified parameters (16 md5-seeded
# centroids, 4-cell probe) so the quantizer is closed-form and the
# DuckDB twin is exact
_IVF_CENTROIDS = 16
_IVF_PROBE = 4


# ---------------------------------------------------------------------------
# q259 ranking metrics over the ANN production path
# ---------------------------------------------------------------------------

def q259_ranking_metrics_ann(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MRR + NDCG@{k} per query over the IVF-ANN ranking instead of
    q239's brute force: candidates come from knn_ann_ivf with the
    seed-only quantizer (lloyd_iters=0 — q160's exact-twin
    discipline), metrics from the shared plumbing
    (llm23.ranking_metrics_from_topk). n_rel stays corpus-global, so
    the NDCG measured here IS the ANN path's retrieval quality
    against the ideal — the eval a production corpus runs nightly.

    100 TB shape: corpus assignment is a narrow per-row Arrow matmul
    (no shuffle), candidates are an equi-join on the cell id touching
    n_probe/n_centroids of the corpus per query, and the metric
    aggregates live on the fixed query grain. Contrast q239 (2.47x
    DuckDB at sf10, brute-force measurement class): this variant
    rides the q160 path measured at 0.41x marginal sf10."""
    e = load(spark, sf_dir, "embeddings")
    topk = S.knn_ann_ivf(
        e,
        e.filter(F.col("vec_id") < _RANK_QUERIES),
        k=_RANK_K,
        n_centroids=_IVF_CENTROIDS,
        n_probe=_IVF_PROBE,
        lloyd_iters=0,
    )
    return ranking_metrics_from_topk(spark, topk, e)


# DuckDB twin: ORACLE_Q160's seeded-IVF CTEs (seeds / first-max
# assignment / top-4 probe / in-cell scoring) parameterized to the
# q239 panel (queries < _RANK_QUERIES, k = _RANK_K), composed with
# ORACLE_Q239's metric CTEs verbatim.
ORACLE_Q259 = f"""
WITH c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv,
                  label
           FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(neighbor_id AS VARCHAR))) - 1
           AS cid
  FROM c
  ORDER BY md5(CAST(neighbor_id AS VARCHAR))
  LIMIT {_IVF_CENTROIDS}
),
asg AS (
  SELECT neighbor_id, cv, label, cid FROM (
    SELECT neighbor_id, cv, label, cid,
           row_number() OVER (PARTITION BY neighbor_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cid ASC) AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv,
             label AS qlabel
      FROM embeddings WHERE vec_id < {_RANK_QUERIES}),
probe AS (
  SELECT query_id, qv, qlabel, cid FROM (
    SELECT query_id, qv, qlabel, cid,
           row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, sv), 9) DESC,
                        cid ASC) AS rn
    FROM q CROSS JOIN seeds
  ) WHERE rn <= {_IVF_PROBE}
),
scored AS (
  SELECT p.query_id, p.qlabel, a.neighbor_id, a.label,
         round(list_cosine_similarity(p.qv, a.cv), 6) AS sim
  FROM probe p JOIN asg a USING (cid)
  WHERE a.neighbor_id <> p.query_id
),
topk AS (
  SELECT query_id, neighbor_id, qlabel = label AS rel, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= {_RANK_K}
),
wdim AS (
  SELECT r,
         CAST(floor(round(1.0 / log2(r + 1), 6) * {MICRO} + 0.5) AS BIGINT)
           AS w_micro,
         CAST(SUM(CAST(floor(round(1.0 / log2(r + 1), 6) * {MICRO} + 0.5)
                  AS BIGINT)) OVER (ORDER BY r) AS BIGINT) AS cum_w_micro
  FROM (SELECT UNNEST(generate_series(1, {_RANK_K})) AS r)
),
lbl_n AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_lbl
          FROM embeddings GROUP BY label),
qrel AS (
  SELECT q.query_id, q.qlabel, l.n_lbl - 1 AS n_rel
  FROM q JOIN lbl_n l ON q.qlabel = l.label
),
per_q AS (
  SELECT query_id,
         MIN(CASE WHEN rel THEN rank END) AS first_rank,
         CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_topk,
         CAST(SUM(CASE WHEN rel THEN
               (SELECT w_micro FROM wdim w WHERE w.r = topk.rank)
               ELSE 0 END) AS BIGINT) AS dcg_micro
  FROM topk GROUP BY query_id
)
SELECT qr.query_id,
       CAST(qr.n_rel AS BIGINT) AS n_rel,
       COALESCE(p.n_rel_topk, 0) AS n_rel_topk,
       CAST(COALESCE(p.first_rank, 0) AS BIGINT) AS first_rel_rank,
       CAST(CASE WHEN p.first_rank IS NOT NULL
                 THEN {MICRO} // p.first_rank ELSE 0 END AS BIGINT)
         AS mrr_micro,
       COALESCE(p.dcg_micro, 0) AS dcg_micro,
       CAST(COALESCE(
           (SELECT cum_w_micro FROM wdim w
            WHERE w.r = least(qr.n_rel, {_RANK_K})), 0) AS BIGINT)
         AS idcg_micro,
       CAST(CASE WHEN least(qr.n_rel, {_RANK_K}) >= 1
                 THEN COALESCE(p.dcg_micro, 0) * {MICRO} //
                      (SELECT cum_w_micro FROM wdim w
                       WHERE w.r = least(qr.n_rel, {_RANK_K}))
                 ELSE 0 END AS BIGINT) AS ndcg_micro
FROM qrel qr LEFT JOIN per_q p USING (query_id)
"""


QUERIES: dict[str, QuerySpec] = {
    "q259_ranking_metrics_ann": QuerySpec(
        q259_ranking_metrics_ann,
        ORACLE_Q259,
        "MRR + NDCG@10 per query over the seeded-IVF ANN ranking —"
        " q239's metric plumbing on the production candidate path",
        ("llm", "similarity", "eval"),
    ),
}
