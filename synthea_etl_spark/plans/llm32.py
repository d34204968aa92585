"""Round-15 LLM-pipeline queries: ANN index health monitoring.

- q272 closes the ANN maintenance loop (the r14 VERDICT ask): q183
  reports per-cell occupancy/coherence, q204 proves index rollover,
  q202/q203 measure candidate recall — q272 is the NIGHTLY MONITOR
  that reads all three signals off one seeded quantizer and emits a
  single retrain verdict row: recall@k of the probed-IVF path vs the
  exact truth panel, hot-cell fraction, occupancy skew, and mean
  cell coherence, each thresholded with pure-integer arithmetic so
  the verdict (not just the metrics) is hash-exact against the
  DuckDB twin.

Reference scope: beyond-reference extension surface; methods public
(IVF coarse quantization per Jegou et al. 2011; recall-based index
health checks are standard ANN operations practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm23 import MICRO

# q160/q183's certified geometry: 16 md5-seeded centroids (seed-only,
# lloyd_iters=0 -- closed-form, so the DuckDB twin is exact), 4-cell
# probe, a 20-query panel, top-10.
_Q272_CELLS = 16
_Q272_PROBE = 4
_Q272_PANEL = 20
_Q272_K = 10

# Retrain thresholds (micro units). Values are policy constants; the
# gate hashes the BOOLEANS too, so both engines must derive them from
# the same integer metrics -- they do, by construction.
_Q272_RECALL_MIN = 500_000   # recall@k < 0.50 -> retrain
_Q272_HOT_MAX = 250_000      # >25% of cells hot -> retrain
_Q272_SKEW_MAX = 4_000_000   # max/mean occupancy > 4x -> retrain
_Q272_COH_MIN = 100_000      # mean member-centroid cosine < 0.10 -> retrain


def q272_ann_health_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The nightly ANN index health monitor: one seeded IVF quantizer
    (q160's exact-twin discipline), three health signals, one verdict
    row. Signals: (1) recall@k of the probed path against the exact
    brute-force truth on a fixed query panel (the q202/q203 recall
    methodology applied to the SERVING path, not the candidate
    generator); (2) occupancy balance -- hot-cell fraction (q183's
    2x-mean rule in integer form: n_vecs * n_cells > 2 * total) and
    max/mean skew; (3) mean cell coherence (member-to-centroid cosine,
    micro-quantized before summing so the mean is order-independent).
    ``retrain_needed`` fires when any thresholded signal breaches --
    the column an operations pager keys on.

    100 TB shape: corpus assignment is one narrow Arrow matmul pass
    (no shuffle); per-cell stats are a cell-keyed aggregate with
    map-side combine; the probe side touches n_probe/n_centroids of
    the corpus per panel query via an equi-join on the cell id; the
    exact truth panel is the MEASUREMENT cost, paid on a fixed-size
    panel (q37 class) -- at 100 TB the panel stays a few hundred
    queries while the index scales, so monitor cost is flat. All
    comparisons are integer micro arithmetic: the verdict row hashes
    identically on any engine.

    Cites: q183 (plans/llm5.py) cell telemetry, q202/q203
    (plans/llm12.py) recall methodology, q259 (plans/llm31.py) seeded
    ANN panel discipline."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    centroids = S.ivf_train_centroids(
        e, n_centroids=_Q272_CELLS, lloyd_iters=0
    )
    index = S.ivf_index(e, centroids)
    cframe = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)],
        "cluster int, sv array<double>",
    )
    cos = S.make_cosine_udf()
    sim_micro = F.floor(
        F.round(cos(F.col("cv"), F.col("sv")), 6) * F.lit(MICRO)
        + F.lit(0.5)
    ).cast("long")
    per_cell = (
        index.join(F.broadcast(cframe), "cluster")
        .select("cluster", sim_micro.alias("_sm"))
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.floor(F.sum("_sm") / F.count("*")).cast("long")
            .alias("mean_sim_micro"),
        )
    )
    cell_tot = per_cell.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("n_vecs").cast("long").alias("_total"),
        F.max("n_vecs").cast("long").alias("_max_occ"),
        F.floor(F.sum("mean_sim_micro") / F.count("*")).cast("long")
        .alias("coherence_micro"),
    )
    hot = (
        per_cell.crossJoin(F.broadcast(cell_tot.select("n_cells", "_total")))
        .select(
            (F.col("n_vecs") * F.col("n_cells") > 2 * F.col("_total"))
            .cast("long")
            .alias("_h")
        )
        .agg(F.sum("_h").cast("long").alias("hot_cells"))
    )
    panel = e.filter(F.col("vec_id") < _Q272_PANEL)
    ann = S.knn_ann_ivf_probe(
        index, centroids, panel, k=_Q272_K, n_probe=_Q272_PROBE
    )
    exact = S.knn_bruteforce(e, panel, k=_Q272_K)
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n_hits"))
    )
    truth = exact.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("_n_truth"),
    )
    return (
        truth.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(cell_tot))
        .crossJoin(F.broadcast(hot))
        .select(
            "n_queries",
            F.lit(_Q272_K).cast("int").alias("k"),
            F.expr(f"_n_hits * {MICRO} div _n_truth").cast("long")
            .alias("recall_micro"),
            "n_cells",
            "hot_cells",
            F.expr(f"hot_cells * {MICRO} div n_cells").cast("long")
            .alias("hot_frac_micro"),
            F.expr(f"_max_occ * n_cells * {MICRO} div _total")
            .cast("long")
            .alias("occ_skew_micro"),
            "coherence_micro",
        )
        .select(
            "*",
            (F.col("recall_micro") < _Q272_RECALL_MIN).alias("recall_low"),
            (F.col("hot_frac_micro") > _Q272_HOT_MAX).alias("hot_high"),
            (F.col("occ_skew_micro") > _Q272_SKEW_MAX).alias("skew_high"),
            (F.col("coherence_micro") < _Q272_COH_MIN).alias(
                "coherence_low"
            ),
        )
        .select(
            "*",
            (
                F.col("recall_low")
                | F.col("hot_high")
                | F.col("skew_high")
                | F.col("coherence_low")
            ).alias("retrain_needed"),
        )
    )


ORACLE_Q272 = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cluster
  FROM c
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {_Q272_CELLS}
),
asg AS (
  SELECT vec_id AS neighbor_id, cv, cluster FROM (
    SELECT c.vec_id, c.cv, seeds.cluster,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cluster ASC)
             AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
pc AS (
  SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(floor(SUM(CAST(floor(
             round(list_cosine_similarity(a.cv, s.sv), 6) * {MICRO} + 0.5)
           AS BIGINT)) / count(*)) AS BIGINT) AS mean_sim_micro
  FROM asg a JOIN seeds s USING (cluster)
  GROUP BY a.cluster
),
ct AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(SUM(n_vecs) AS BIGINT) AS total,
         CAST(MAX(n_vecs) AS BIGINT) AS max_occ,
         CAST(floor(SUM(mean_sim_micro) / count(*)) AS BIGINT)
           AS coherence_micro
  FROM pc
),
hot AS (
  SELECT CAST(SUM(CASE WHEN pc.n_vecs * ct.n_cells > 2 * ct.total
                       THEN 1 ELSE 0 END) AS BIGINT) AS hot_cells
  FROM pc CROSS JOIN ct
),
q AS (SELECT vec_id AS query_id, cv AS qv FROM c
      WHERE vec_id < {_Q272_PANEL}),
probe AS (
  SELECT query_id, qv, cluster FROM (
    SELECT query_id, qv, seeds.cluster,
           row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, sv), 9) DESC,
                        cluster ASC) AS rn
    FROM q CROSS JOIN seeds
  ) WHERE rn <= {_Q272_PROBE}
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
               ORDER BY round(list_cosine_similarity(p.qv, a.cv), 6) DESC,
                        a.neighbor_id) AS rank
    FROM probe p JOIN asg a USING (cluster)
    WHERE a.neighbor_id <> p.query_id
  ) WHERE rank <= {_Q272_K}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                        c.vec_id) AS rank
    FROM q CROSS JOIN c
    WHERE c.vec_id <> q.query_id
  ) WHERE rank <= {_Q272_K}
),
truth AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM exact
),
hits AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ann JOIN exact USING (query_id, neighbor_id)
),
m AS (
  SELECT truth.n_queries, CAST({_Q272_K} AS INTEGER) AS k,
         CAST(hits.n_hits * {MICRO} // truth.n_truth AS BIGINT)
           AS recall_micro,
         ct.n_cells, hot.hot_cells,
         CAST(hot.hot_cells * {MICRO} // ct.n_cells AS BIGINT)
           AS hot_frac_micro,
         CAST(ct.max_occ * ct.n_cells * {MICRO} // ct.total AS BIGINT)
           AS occ_skew_micro,
         ct.coherence_micro
  FROM truth CROSS JOIN hits CROSS JOIN ct CROSS JOIN hot
)
SELECT *,
       (recall_low OR hot_high OR skew_high OR coherence_low)
         AS retrain_needed
FROM (
  SELECT *,
         recall_micro < {_Q272_RECALL_MIN} AS recall_low,
         hot_frac_micro > {_Q272_HOT_MAX} AS hot_high,
         occ_skew_micro > {_Q272_SKEW_MAX} AS skew_high,
         coherence_micro < {_Q272_COH_MIN} AS coherence_low
  FROM m
)
"""


QUERIES: dict[str, QuerySpec] = {
    "q272_ann_health_verdict": QuerySpec(
        q272_ann_health_verdict,
        ORACLE_Q272,
        "nightly ANN index health monitor: probed-path recall@k vs"
        " exact truth + occupancy/coherence thresholds -> one"
        " integer-exact retrain verdict row",
        ("llm", "similarity", "governance"),
    ),
}
