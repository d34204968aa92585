"""Round-13 LLM-pipeline queries, batch 5: dedup governance
reports.

- q244 cross-axis dedup survival funnel: the same corpus scored by
  THREE independent dedup axes — exact content (q30's fingerprint),
  prompt key (q233's first-turn md5), and shared winnowed spans
  (q48's MOSS fingerprints, shared-with-an-earlier-doc) — one
  (source, axis) survival row each. This is the comparison table a
  curation run reads to decide WHICH dedup axis to enforce, and how
  much each one costs per source (Lee et al. 2021 compare exactly
  these axes).
- q245 LSH operating curve: the exact candidate-probability
  S-curve P(candidate | jaccard=j) = 1 - (1 - j^r)^b for the
  CONFIGURED index geometry (num_hashes=32, b=8, r=4 — the
  banded_signatures defaults q33/q151/q158 run with), tabulated on
  a j-grid in int64 micro. q207 measures the index's recall
  empirically; this is the theoretical curve it is tuned against
  (Leskovec/Rajaraman/Ullman ch. 3) — published side by side they
  form the index's tuning sheet.

Reference scope: beyond-reference extension surface; methods public
(Lee et al. 2021; MMDS ch. 3; Schleimer et al. 2003 winnowing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.dedup import (
    PROMPT_KEY_TOKENS,
    winnow_fingerprints,
)
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# q245 grid + the configured index geometry (banded_signatures
# defaults; q33/q151/q158 all run 32 hashes in 8 bands of 4 rows)
_LSH_BANDS = 8
_LSH_ROWS = 4
_J_GRID_STEP = 5  # j = 5%, 10%, ..., 95%


def q244_dedup_axis_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (source, axis) dedup survival: n_docs, n_kept and the
    kept fraction under three independent axes — 'exact' (min-doc_id
    keeper of the full-text md5 cluster), 'prompt' (q233's first-{8}
    -token key, same keeper rule), and 'span' (a doc is DROPPED when
    any of its winnowed fingerprints was already produced by an
    earlier doc — the MOSS shared-span axis; docs too short to
    fingerprint survive by definition). Returns one row per
    (source, axis).

    100 TB shape: three window passes, each on its own key exchange
    — fp, pkey, winnow-fp — followed by source-sized aggregates; no
    joins between the axes (the union is of three tiny aggregate
    frames). The span axis reuses winnow_fingerprints' single-
    exchange plan (hash-partitioned by doc before the explode)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")

    def survival(flagged: DataFrame, axis: str) -> DataFrame:
        return (
            flagged.groupBy("source")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.sum((~F.col("_drop")).cast("long"))
                .cast("long")
                .alias("n_kept"),
            )
            .select(
                "source",
                F.lit(axis).alias("axis"),
                "n_docs",
                "n_kept",
                F.expr(f"n_kept * {MICRO} div n_docs").alias("kept_micro"),
            )
        )

    # r15 optimization (guide §1.2, §8): the exact/prompt axes and
    # the span rollup each re-scanned the corpus text. One narrow
    # key proxy (ids + two md5 keys + token count — text dropped)
    # now feeds all three; only the winnow explode (fp grain) keeps
    # its own text pass. Same expressions, same filters — the
    # prompt axis filter moves AFTER key computation (md5 of an
    # empty slice is computed then discarded, never aggregated).
    keys = d.select(
        "doc_id",
        "source",
        T.fingerprint("text").alias("_fp"),
        T.token_count("text").cast("long").alias("_nt"),
        F.md5(
            F.concat_ws(
                " ", F.slice(T.tokens("text"), 1, PROMPT_KEY_TOKENS)
            )
        ).alias("_pk"),
    ).localCheckpoint()

    wfp = Window.partitionBy("_k")
    exact = survival(
        keys.select(
            "source", "doc_id", F.col("_fp").alias("_k")
        ).select(
            "source",
            (F.col("doc_id") != F.min("doc_id").over(wfp)).alias("_drop"),
        ),
        "exact",
    )
    prompt = survival(
        keys.filter(F.col("_nt") > 0)
        .select("source", "doc_id", F.col("_pk").alias("_k"))
        .select(
            "source",
            (F.col("doc_id") != F.min("doc_id").over(wfp)).alias("_drop"),
        ),
        "prompt",
    )
    # span axis: flagged iff ANY winnow fp was first produced by an
    # earlier doc; aggregate the per-fp verdicts back to one row per
    # doc before the source rollup
    wf = Window.partitionBy("fp")
    span_flags = (
        winnow_fingerprints(d.select("doc_id", "text"), "text", "doc_id")
        .select(
            "doc_id",
            (F.col("doc_id") > F.min("doc_id").over(wf)).alias("_shared"),
        )
        .groupBy("doc_id")
        .agg(F.max("_shared").alias("_drop"))
    )
    span = survival(
        keys.select("doc_id", "source")
        .join(span_flags, "doc_id", "left")
        .select("source", F.coalesce("_drop", F.lit(False)).alias("_drop")),
        "span",
    )
    return exact.unionByName(prompt).unionByName(span)


def _oracle_q244() -> str:
    from synthea_etl_spark.plans.llm import WINNOW_W

    h = "CAST(concat('0x', substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 8)) AS BIGINT)"
    return f"""
WITH exact_k AS (
  SELECT source, doc_id, md5(text) AS k FROM documents
),
exact_f AS (
  SELECT source,
         doc_id <> MIN(doc_id) OVER (PARTITION BY k) AS drop_it
  FROM exact_k
),
toks AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
prompt_f AS (
  SELECT source,
         doc_id <> MIN(doc_id) OVER (
           PARTITION BY md5(array_to_string(w[1:{PROMPT_KEY_TOKENS}], ' '))
         ) AS drop_it
  FROM toks
),
grams AS (
  SELECT doc_id, i, {h} AS hh, len(w) - 2 AS m
  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, len(w)-2)) AS i) u
  WHERE len(w) >= 3
),
wins AS (
  SELECT doc_id, i, m,
         MIN(hh) OVER (PARTITION BY doc_id ORDER BY i
              ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM grams
),
wfp AS (SELECT DISTINCT doc_id, fp FROM wins WHERE i <= m - {WINNOW_W - 1}),
span_shared AS (
  SELECT doc_id,
         doc_id > MIN(doc_id) OVER (PARTITION BY fp) AS shared
  FROM wfp
),
span_doc AS (
  SELECT doc_id, MAX(shared) AS drop_it FROM span_shared GROUP BY doc_id
),
span_f AS (
  SELECT d.source, COALESCE(s.drop_it, FALSE) AS drop_it
  FROM documents d LEFT JOIN span_doc s USING (doc_id)
),
u AS (
  SELECT source, 'exact' AS axis, drop_it FROM exact_f
  UNION ALL
  SELECT source, 'prompt' AS axis, drop_it FROM prompt_f
  UNION ALL
  SELECT source, 'span' AS axis, drop_it FROM span_f
)
SELECT source, axis,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN drop_it THEN 0 ELSE 1 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN drop_it THEN 0 ELSE 1 END) * {MICRO} // COUNT(*)
            AS BIGINT) AS kept_micro
FROM u GROUP BY source, axis
"""


def q245_lsh_operating_curve(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The banded-MinHash candidate S-curve for the configured
    geometry, exact in int64 micro: p = 1 - (1 - j^r)^b on a j-grid,
    quantized ONCE per grid row (round 6 dp then micro — the q220
    dim discipline, cross-engine exact because both engines compute
    the same double expression and round before quantizing). Also
    emits each row's candidate-vs-miss verdict at the j where the
    curve crosses 1/2 — the threshold the (b, r) choice positions
    (~(1/b)^(1/r) = 0.595 for 8x4). A 19-row dim: zero shuffles
    beyond the trivial range partitioning; sf_dir is unused (the
    curve is pure index geometry) but kept for the uniform query
    signature."""
    j = (F.col("id") * _J_GRID_STEP).cast("long")
    jf = j.cast("double") / 100.0
    p = 1.0 - F.pow(1.0 - F.pow(jf, float(_LSH_ROWS)), float(_LSH_BANDS))
    pq = F.floor(F.round(p, 6) * MICRO + F.lit(0.5)).cast("long")
    return (
        spark.range(1, 100 // _J_GRID_STEP)
        .select(
            j.alias("j_pct"),
            pq.alias("p_candidate_micro"),
            (pq >= MICRO // 2).alias("above_half"),
        )
    )


ORACLE_Q245 = f"""
SELECT CAST(g * {_J_GRID_STEP} AS BIGINT) AS j_pct,
       CAST(floor(round(1 - pow(1 - pow(g * {_J_GRID_STEP} / 100.0,
                {_LSH_ROWS}), {_LSH_BANDS}), 6) * {MICRO} + 0.5) AS BIGINT)
         AS p_candidate_micro,
       CAST(floor(round(1 - pow(1 - pow(g * {_J_GRID_STEP} / 100.0,
                {_LSH_ROWS}), {_LSH_BANDS}), 6) * {MICRO} + 0.5) AS BIGINT)
         >= {MICRO // 2} AS above_half
FROM (SELECT UNNEST(generate_series(1, {100 // _J_GRID_STEP - 1})) AS g)
"""


QUERIES: dict[str, QuerySpec] = {
    "q244_dedup_axis_funnel": QuerySpec(
        q244_dedup_axis_funnel,
        _oracle_q244(),
        "per-(source, axis) dedup survival across exact / prompt /"
        " shared-span axes",
        ("llm", "dedup", "governance"),
    ),
    "q245_lsh_operating_curve": QuerySpec(
        q245_lsh_operating_curve,
        ORACLE_Q245,
        "exact banded-MinHash candidate S-curve for the configured"
        " (b, r) geometry",
        ("llm", "dedup", "governance"),
    ),
}
