"""Round-13 LLM-pipeline queries, batch 8: split governance
closures.

- q255 cluster-grain leakage-free split: q211 splits by CONTENT
  hash, which pins exact dups to one side but lets near-dups
  straddle the boundary — exactly what q214's audit then finds.
  This query closes the loop: assign train/val/test at NEAR-DUP
  CLUSTER grain (q71's connected components over the banded-MinHash
  candidate graph; singletons key by their own doc_id) and verify
  the guarantee inside the same result — the cross-split candidate-
  pair count is zero BY CONSTRUCTION, and the oracle recomputes the
  zero independently (Lee et al. 2021 §5 / Lewis et al. 2021 both
  document near-dup test-train overlap as the failure this split
  prevents).
- q256 contamination rate with uncertainty: q98's benchmark 3-gram
  screen rolled up per source as a contamination RATE with a
  Poisson-bootstrap 95% CI (q254's one-pass machinery, per-source)
  — the difference between "src7 is 4% contaminated" and "src7 is
  4% +/- 3% on 25 docs" decides whether a source gets dropped or
  re-measured (Brown et al. 2020 appendix C run exactly this
  per-source overlap accounting; Chamandy et al. 2012 for the
  weighted bootstrap).

Reference scope: beyond-reference extension surface; methods public
(Lee et al. 2021; Lewis et al. 2021; Brown et al. 2020; Chamandy et
al. 2012).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm import (
    _sql_clusters_oracle,
    q33_minhash_lsh_candidates,
)
from synthea_etl_spark.plans.llm2 import BENCH_DOCS
from synthea_etl_spark.plans.llm28 import _BOOT_R, _POIS_CUM

MICRO = 1_000_000

# q256: a doc is contaminated when >= 20% of its distinct 3-grams
# appear in the benchmark set (n_overlap * 5 >= n_shingles — exact
# integer rule, no float threshold)
_CONTAM_NUM = 5


def _split_of(gid: str) -> F.Column:
    """80/10/10 split from the md5 of a cluster key (the q211
    bucketing, salted 'csp' for the cluster-grain variant)."""
    hv = F.expr(
        f"CAST(conv(substring(md5(concat('csp', CAST({gid} AS STRING))),"
        f" 1, 8), 16, 10) AS BIGINT) % 100"
    )
    return (
        F.when(hv < 80, F.lit("train"))
        .when(hv < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )


def q255_cluster_grain_split(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Train/val/test assignment at near-dup-cluster grain with the
    leakage guarantee verified in-result: per split, doc count,
    group (cluster/singleton) count, and the number of banded-
    MinHash candidate pairs whose endpoints landed in DIFFERENT
    splits — zero by construction, because both endpoints of every
    candidate edge share a connected component and the split hashes
    the component key. q211's content-hash split gives this
    guarantee only for byte-identical dups; this one extends it to
    everything the near-dup index can see (what q214 audits, closed
    at the source).

    100 TB shape: rides the certified band machinery once — the
    SAME pairs frame feeds the bounded CC label propagation
    (connected_components, q71/q209's audited loop) and the
    cross-split verification join; assignment is one left join of
    the doc projection against the cluster labels + a zero-shuffle
    hash expression; stats are split-sized aggregates. No text is
    touched after the signature pass."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    # lineage cuts (the q226/q242 discipline): the candidate-pair
    # frame feeds BOTH the CC loop and the leak-verification join,
    # and the assignment frame has three consumers — without the
    # cuts each consumer replays the full banding pass
    pairs = q33_minhash_lsh_candidates(spark, sf_dir).localCheckpoint()
    cc = D.connected_components(pairs)
    assign = (
        docs.join(cc, docs.doc_id == cc.id, "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("_gid"),
        )
        .withColumn("split", _split_of("_gid"))
        .localCheckpoint()
    )
    stats = assign.groupBy("split").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("_gid").cast("long").alias("n_groups"),
    )
    a = assign.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("_sa")
    )
    b = assign.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("_sb")
    )
    leaks = (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .filter(F.col("_sa") != F.col("_sb"))
        .groupBy(F.col("_sa").alias("split"))
        .agg(F.count("*").cast("long").alias("cross_split_pairs"))
    )
    return (
        stats.join(leaks, "split", "left")
        .select(
            "split",
            "n_docs",
            "n_groups",
            F.coalesce("cross_split_pairs", F.lit(0))
            .cast("long")
            .alias("cross_split_pairs"),
        )
    )


def _oracle_q255() -> str:
    cc = _sql_clusters_oracle().strip()
    return f"""
WITH cc AS ({cc}),
assign AS (
  SELECT d.doc_id,
         COALESCE(cc.cluster_id, d.doc_id) AS gid,
         CASE WHEN CAST(concat('0x', substr(md5('csp' ||
                  COALESCE(cc.cluster_id, d.doc_id)), 1, 8)) AS BIGINT)
                  % 100 < 80 THEN 'train'
              WHEN CAST(concat('0x', substr(md5('csp' ||
                  COALESCE(cc.cluster_id, d.doc_id)), 1, 8)) AS BIGINT)
                  % 100 < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM documents d LEFT JOIN cc ON cc.id = d.doc_id
),
stats AS (
  SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT gid) AS BIGINT) AS n_groups
  FROM assign GROUP BY split
),
pairs2 AS ({_sql_minhash_pairs_cte()}),
leaks AS (
  SELECT a.split, CAST(COUNT(*) AS BIGINT) AS cross_split_pairs
  FROM pairs2 p
  JOIN assign a ON a.doc_id = p.id_a
  JOIN assign b ON b.doc_id = p.id_b
  WHERE a.split <> b.split
  GROUP BY a.split
)
SELECT s.split, s.n_docs, s.n_groups,
       CAST(COALESCE(l.cross_split_pairs, 0) AS BIGINT)
         AS cross_split_pairs
FROM stats s LEFT JOIN leaks l USING (split)
"""


def _sql_minhash_pairs_cte() -> str:
    from synthea_etl_spark.plans.llm import _sql_minhash_oracle

    return _sql_minhash_oracle().strip()


def q256_contamination_ci(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source benchmark-contamination rate with a 95%
    Poisson-bootstrap CI: q98's distinct-3-gram overlap screen
    (contaminated = overlap >= 20% of the doc's shingles, exact
    integer rule), rolled up per source, with q254's one-pass
    weighted bootstrap run WITHIN each source. Returns (source,
    n_docs, n_contaminated, rate_micro, lo_micro, hi_micro).

    100 TB shape: the shingle screen is the audited q98 plan
    (benchmark shingles broadcast); everything after is doc-grain —
    the x100 replicate explode collapses map-side into (source,
    rep) partial sums, the percentile window runs per source on a
    <=100-row frame. Replicates where a source draws all-zero
    weights are dropped before ranking — for a 1-doc source that is
    ~37% of replicates (0.3679^n_docs), so the percentile ranks are
    ADAPTIVE: ceil(0.025 * R_eff) / ceil(0.975 * R_eff) over the
    retained replicates (3/98 exactly when all 100 survive),
    integer-computed in both engines."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "source")
    ov = D.contamination_overlap(
        load(spark, sf_dir, "documents").filter(
            F.col("doc_id") >= BENCH_DOCS
        ),
        load(spark, sf_dir, "documents").filter(
            F.col("doc_id") < BENCH_DOCS
        ),
        "text",
        "doc_id",
    ).select(
        "doc_id",
        (F.col("n_overlap") * _CONTAM_NUM >= F.col("n_shingles"))
        .cast("long")
        .alias("_contam"),
    )
    # doc-grain lineage cut: base feeds the per-source rollup AND
    # the x100 replicate branch — without it the q98 shingle screen
    # runs twice (measured 32.3 s -> 7.4 s at sf1)
    base = ov.join(docs, "doc_id").localCheckpoint()
    per_source = base.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_contam").cast("long").alias("n_contaminated"),
    )
    c = _POIS_CUM
    mult = (
        f"CASE WHEN _hv < {c[0]} THEN 0 WHEN _hv < {c[1]} THEN 1"
        f" WHEN _hv < {c[2]} THEN 2 WHEN _hv < {c[3]} THEN 3 ELSE 4 END"
    )
    reps = (
        base.select(
            "doc_id",
            "source",
            "_contam",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias(
                "rep"
            ),
        )
        .withColumn(
            "_hv",
            F.expr(
                "CAST(conv(substring(md5(concat('cb', CAST(doc_id AS"
                " STRING), ':', CAST(rep AS STRING))), 1, 8), 16, 10)"
                " AS BIGINT) % 10000"
            ),
        )
        .withColumn("_m", F.expr(mult).cast("long"))
        .groupBy("source", "rep")
        .agg(
            F.sum(F.col("_m") * F.col("_contam")).cast("long").alias("_sc"),
            F.sum("_m").cast("long").alias("_st"),
        )
        .filter(F.col("_st") > 0)
        .select(
            "source",
            "rep",
            F.expr(f"_sc * {MICRO} div _st").alias("_rate"),
        )
    )
    w = Window.partitionBy("source").orderBy("_rate", "rep")
    wc = Window.partitionBy("source")
    bounds = (
        reps.select(
            "source",
            "_rate",
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wc).alias("_reff"),
        )
        .groupBy("source")
        .agg(
            F.min(
                F.when(
                    F.col("_rn")
                    == F.expr("(25 * _reff + 999) div 1000"),
                    F.col("_rate"),
                )
            ).alias("lo_micro"),
            F.min(
                F.when(
                    F.col("_rn")
                    == F.expr("(975 * _reff + 999) div 1000"),
                    F.col("_rate"),
                )
            ).alias("hi_micro"),
        )
    )
    return (
        per_source.join(bounds, "source")
        .select(
            "source",
            "n_docs",
            "n_contaminated",
            F.expr(f"n_contaminated * {MICRO} div n_docs").alias(
                "rate_micro"
            ),
            "lo_micro",
            "hi_micro",
        )
    )


def _oracle_q256() -> str:
    c = _POIS_CUM
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, len(w)-2)) AS i) u
  WHERE len(w) >= 3
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_DOCS}),
ov AS (
  SELECT c.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_shingles,
         CAST(COALESCE(SUM(CASE WHEN b.s IS NOT NULL THEN 1 END), 0)
              AS BIGINT) AS n_overlap
  FROM sh c LEFT JOIN bench b ON c.s = b.s
  WHERE c.doc_id >= {BENCH_DOCS}
  GROUP BY c.doc_id
),
base AS (
  SELECT d.source, o.doc_id,
         CASE WHEN o.n_overlap * {_CONTAM_NUM} >= o.n_shingles
              THEN 1 ELSE 0 END AS contam
  FROM ov o JOIN documents d USING (doc_id)
),
per_source AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(contam) AS BIGINT) AS n_contaminated
  FROM base GROUP BY source
),
reps AS (
  SELECT source, rep,
         CASE WHEN hv < {c[0]} THEN 0 WHEN hv < {c[1]} THEN 1
              WHEN hv < {c[2]} THEN 2 WHEN hv < {c[3]} THEN 3
              ELSE 4 END AS m,
         contam
  FROM (
    SELECT source, doc_id, contam, rep,
           CAST(concat('0x', substr(md5('cb' || doc_id || ':' || rep),
                1, 8)) AS BIGINT) % 10000 AS hv
    FROM base,
         LATERAL (SELECT UNNEST(generate_series(0, {_BOOT_R - 1}))
                  AS rep) u
  )
),
mrep AS (
  SELECT source, rep,
         CAST(SUM(m * contam) AS BIGINT) AS sc,
         CAST(SUM(m) AS BIGINT) AS st
  FROM reps GROUP BY source, rep
  HAVING SUM(m) > 0
),
ranked AS (
  SELECT source, sc * {MICRO} // st AS rate,
         row_number() OVER (PARTITION BY source
             ORDER BY sc * {MICRO} // st, rep) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS reff
  FROM mrep
),
bounds AS (
  SELECT source,
         MIN(CASE WHEN rn = (25 * reff + 999) // 1000 THEN rate END)
           AS lo_micro,
         MIN(CASE WHEN rn = (975 * reff + 999) // 1000 THEN rate END)
           AS hi_micro
  FROM ranked GROUP BY source
)
SELECT p.source, p.n_docs, p.n_contaminated,
       CAST(p.n_contaminated * {MICRO} // p.n_docs AS BIGINT)
         AS rate_micro,
       CAST(b.lo_micro AS BIGINT) AS lo_micro,
       CAST(b.hi_micro AS BIGINT) AS hi_micro
FROM per_source p JOIN bounds b USING (source)
"""


QUERIES: dict[str, QuerySpec] = {
    "q255_cluster_grain_split": QuerySpec(
        q255_cluster_grain_split,
        _oracle_q255(),
        "train/val/test at near-dup-cluster grain with the zero"
        " cross-split-pair guarantee verified in-result",
        ("llm", "dedup", "governance"),
    ),
    "q256_contamination_ci": QuerySpec(
        q256_contamination_ci,
        _oracle_q256(),
        "per-source benchmark-contamination rate with Poisson-"
        "bootstrap 95% CI",
        ("llm", "quality", "governance"),
    ),
}
