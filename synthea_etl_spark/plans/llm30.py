"""Round-13 LLM-pipeline queries, batch 9: post-training data
assembly.

- q257 preference-pair assembly: RLHF reward-model training data
  from prompt-grouped responses — per prompt key (q232/q233's
  first-turn key), pick the highest- and lowest-reward response,
  keep pairs whose reward margin clears a confidence floor (the
  pair-construction step of Stiennon et al. 2020 / Ouyang et al.
  2022; low-margin pairs are label noise and get dropped). Rewards
  are synthesized deterministically from doc_id (the q213
  discipline) — the MACHINERY (prompt grouping, extreme selection,
  margin denoising) is the real operator.
- q258 in-context-pretraining order: a training-order manifest
  where consecutive documents are SEMANTICALLY RELATED (Shi et al.
  2023, In-Context Pretraining): hyperplane-LSH buckets (q39's
  certified deterministic planes) approximate the similarity graph,
  and within each bucket documents are ordered by distance to the
  bucket's sampled-anchor centroid — the scalable stand-in for
  greedy nearest-neighbor chaining (which is inherently sequential;
  bucket-local ordering parallelizes while keeping neighbors
  adjacent).

Reference scope: beyond-reference extension surface; methods public
(Stiennon et al. 2020; Ouyang et al. 2022; Shi et al. 2023).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.similarity as S
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.dedup import PROMPT_KEY_TOKENS
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm import _sql_lsh_planes

# q257: drop pairs whose reward margin is below this (milli-units;
# rewards are in [-1000, 1000]) — the confident-pair rule
_MIN_MARGIN_MILLI = 100

# q258 geometry: 4 md5-seeded hyperplanes -> 16 buckets
_ICL_PLANES = 4
_EMB_DIM = 64
# per-dim squared-difference terms quantized at 9 dp (values are
# O(1); 64 terms * 1e9 scale stays far inside int64), summed exactly
_NANO = 1_000_000_000
# centroids are ANCHORS, not statistics: estimate them from the
# deterministic 1-in-8 sample (vec_id % 8 == 0) — the q205/q206
# sampled-measurement knob; full-corpus decimal means cost 8x the
# aggregate for an ordering that only needs a stable per-bucket
# anchor
_CENT_SAMPLE_MOD = 8


# ---------------------------------------------------------------------------
# q257 preference pairs
# ---------------------------------------------------------------------------

def q257_preference_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per prompt key with >= 2 responses: (chosen, rejected) =
    (max-reward, min-reward) response with deterministic tie-breaks
    (reward desc, doc_id asc / reward asc, doc_id desc), margin in
    exact milli-units, pairs below the confidence floor dropped.
    Returns (prompt_key, n_responses, chosen_id, rejected_id,
    chosen_reward_milli, rejected_reward_milli, margin_milli).

    100 TB shape: ONE prompt-key exchange into ONE hash aggregate —
    max_by/min_by over a (reward, -doc_id) struct comparator carry
    both extreme selections and the group count with NO sort (the
    round-14 reshape: the original three-window form sorted every
    group; on the organic replica's heavy-tailed prompt groups —
    banner hosts put thousands of responses under one key — the
    sort-free aggregate halves the wall and removes the skewed-
    partition sort entirely). Rewards are a zero-shuffle expression;
    text is read once."""
    from synthea_etl_spark.operators.util import rebalance_by_key

    d = rebalance_by_key(
        load(spark, sf_dir, "documents"), "doc_id"
    ).filter(T.token_count("text") > 0)
    reward = (
        F.expr(
            "CAST(conv(substring(md5(concat('rw', CAST(doc_id AS"
            " STRING))), 1, 8), 16, 10) AS BIGINT) % 2001"
        )
        - 1000
    )
    keyed = d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.slice(T.tokens("text"), 1, PROMPT_KEY_TOKENS))
        ).alias("prompt_key"),
        reward.alias("_r"),
    )
    # extreme selection with deterministic tie-breaks as struct
    # comparators: chosen = max (r, -doc_id) -> max reward, min id;
    # rejected = min (r, -doc_id) -> min reward, max id — exactly
    # the original window orderings, without the per-group sort
    agg = keyed.groupBy("prompt_key").agg(
        F.count("*").cast("long").alias("n_responses"),
        F.expr(
            "max_by(named_struct('id', doc_id, 'r', _r),"
            " named_struct('r', _r, 'negid', -doc_id))"
        ).alias("_c"),
        F.expr(
            "min_by(named_struct('id', doc_id, 'r', _r),"
            " named_struct('r', _r, 'negid', -doc_id))"
        ).alias("_j"),
    )
    return (
        agg.filter(F.col("n_responses") >= 2)
        .select(
            "prompt_key",
            "n_responses",
            F.col("_c.id").alias("chosen_id"),
            F.col("_j.id").alias("rejected_id"),
            F.col("_c.r").cast("long").alias("chosen_reward_milli"),
            F.col("_j.r").cast("long").alias("rejected_reward_milli"),
        )
        .withColumn(
            "margin_milli",
            F.col("chosen_reward_milli") - F.col("rejected_reward_milli"),
        )
        .filter(F.col("margin_milli") >= _MIN_MARGIN_MILLI)
    )


ORACLE_Q257 = f"""
WITH keyed AS (
  SELECT doc_id,
         md5(array_to_string(
             string_split_regex(trim(text), '\\s+')[1:{PROMPT_KEY_TOKENS}],
             ' ')) AS prompt_key,
         CAST(concat('0x', substr(md5('rw' || doc_id), 1, 8)) AS BIGINT)
           % 2001 - 1000 AS r
  FROM documents WHERE length(trim(text)) > 0
),
flagged AS (
  SELECT doc_id, prompt_key, r,
         CAST(COUNT(*) OVER (PARTITION BY prompt_key) AS BIGINT)
           AS n_responses,
         row_number() OVER (PARTITION BY prompt_key
             ORDER BY r DESC, doc_id ASC) AS rn_hi,
         row_number() OVER (PARTITION BY prompt_key
             ORDER BY r ASC, doc_id DESC) AS rn_lo
  FROM keyed
),
chosen AS (
  SELECT prompt_key, n_responses, doc_id AS chosen_id,
         r AS chosen_reward_milli
  FROM flagged WHERE rn_hi = 1 AND n_responses >= 2
),
rejected AS (
  SELECT prompt_key, doc_id AS rejected_id, r AS rejected_reward_milli
  FROM flagged WHERE rn_lo = 1 AND n_responses >= 2
)
SELECT c.prompt_key, c.n_responses, c.chosen_id, r.rejected_id,
       CAST(c.chosen_reward_milli AS BIGINT) AS chosen_reward_milli,
       CAST(r.rejected_reward_milli AS BIGINT) AS rejected_reward_milli,
       CAST(c.chosen_reward_milli - r.rejected_reward_milli AS BIGINT)
         AS margin_milli
FROM chosen c JOIN rejected r USING (prompt_key)
WHERE c.chosen_reward_milli - r.rejected_reward_milli
      >= {_MIN_MARGIN_MILLI}
"""


# ---------------------------------------------------------------------------
# q258 in-context-pretraining order
# ---------------------------------------------------------------------------

def q258_icl_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order manifest with semantic locality: each vector's
    LSH bucket (4 md5-seeded hyperplanes, q39's certified plane
    derivation), its distance to the bucket's anchor centroid (the
    exact-decimal mean of the deterministic 1-in-8 sample; a bucket
    with no sampled member anchors at the zero vector), and its
    position within the bucket (distance asc, vec_id tie-break).
    Consecutive positions in a bucket are near in embedding space — the parallelizable approximation of ICLM's
    greedy similarity chains. Distances are exact int64: per-dim
    squared differences quantized at 9 dp and summed (never a float
    reduction over dims).

    100 TB shape (the audited IVF recipe, q43/q160's): buckets are
    the 4-plane sign expression in pure codegen on the
    vec_id-rebalanced scan (the Arrow bucket pass is the LARGE-plane
    path; at 4x64 the literal tree is cheaper — measured 1.41 s vs
    0.29 s at sf1); bucket centroids are ONE posexplode aggregate
    with decimal partials COLLECTED to the driver (16 x 64 rows —
    bounded by geometry, the ivf_train_centroids precedent) and
    re-entered as literals, so the distance pass is a zero-join
    explode + codegen quantize + a per-vec sum riding the vec_id
    partitioning. Shape ladder at sf1: zip_with fold 6.1x DuckDB
    (interpreted lambdas, the q246 lesson) -> explode + broadcast
    cent join 5.1x -> literal centroids in codegen 2.5 s -> this
    Arrow distance pass (one numpy broadcast-subtract per batch,
    :func:`_dist_nano_arrow`) 2.2 s. The sf1 ratio (5.3x of
    DuckDB's 0.42 s native-list-kernel wall) is FIXED overhead —
    two jobs (bounded centroid collect, the ivf_train_centroids
    precedent) + Arrow init; at sf10 it amortizes to 1.35x raw,
    marginal 0.73x (the engine wins on the data-proportional part).
    The only later exchange is the bucket window for positions (at
    production scale the manifest writer shards by bucket anyway)."""
    from synthea_etl_spark.operators.util import rebalance_by_key

    e = rebalance_by_key(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    planes = S._hyperplanes(_ICL_PLANES, _EMB_DIM)
    bucketed = e.withColumn(
        "bucket",
        S._bucket_expr(F.col("embedding").cast("array<double>"), planes),
    )
    ex = bucketed.filter(
        F.col("vec_id") % _CENT_SAMPLE_MOD == 0
    ).select(
        "vec_id",
        "bucket",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        ),
    )
    cent_rows = (
        ex.groupBy("bucket", "pos")
        .agg(
            (
                F.sum(F.col("x").cast("decimal(25,6)")).cast("double")
                / F.count("x").cast("double")
            ).alias("m")
        )
        .collect()
    )
    by_bucket: dict[int, dict[int, float]] = {}
    for r in cent_rows:
        by_bucket.setdefault(r.bucket, {})[r.pos] = r.m
    scored = bucketed.select(
        "vec_id",
        "bucket",
        _dist_nano_arrow(by_bucket)(
            F.col("bucket"), F.col("embedding")
        ).alias("dist_nano"),
    )
    w = Window.partitionBy("bucket").orderBy("dist_nano", "vec_id")
    return scored.select(
        "vec_id",
        "bucket",
        F.row_number().over(w).cast("int").alias("position"),
        "dist_nano",
    )


def _dist_nano_arrow(by_bucket: dict):
    """One vectorized Arrow pass computing every vector's quantized
    distance to its bucket centroid: the whole (vecs x dims) batch
    is ONE numpy broadcast-subtract + row sum — no 64-row explode
    per vector (the codegen explode tail alone costs more than
    DuckDB's entire native list kernel; measured ladder in
    q258_icl_order's docstring). Quantization (round 9 dp -> nano
    int) happens per dim in float64 exactly as the JVM/SQL forms
    write it; a divergent tie needs (x-m)^2 to sit within one ulp of
    a 5e-10 decimal boundary — and the gate pins the full fixed
    value set at sf0.01, so any such tie would be caught, not
    silent."""
    import numpy as np
    import pandas as pd

    cmat = np.zeros((2 ** _ICL_PLANES, _EMB_DIM), dtype=np.float64)
    for bk, dims in by_bucket.items():
        for p, m in dims.items():
            cmat[bk][p] = m

    def dist(bucket, emb):
        if len(emb) == 0:  # Arrow may deliver an empty batch
            return pd.Series([], dtype="int64")
        v = np.vstack(
            [np.asarray(x, dtype=np.float64) for x in emb.values]
        )
        d = v - cmat[bucket.values.astype(np.int64)]
        terms = np.floor(np.round(d * d, 9) * _NANO + 0.5).astype(
            np.int64
        )
        return pd.Series(terms.sum(axis=1))

    dist.__annotations__ = {
        "bucket": pd.Series,
        "emb": pd.Series,
        "return": pd.Series,
    }
    return F.pandas_udf(dist, "long")


ORACLE_Q258 = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
{_sql_lsh_planes(_ICL_PLANES)},
ex AS (
  SELECT b.b0 AS bucket, e.vec_id, i - 1 AS pos, e.v[i] AS x
  FROM e JOIN buckets b USING (vec_id),
       LATERAL (SELECT UNNEST(generate_series(1, len(e.v))) AS i) u
  WHERE e.vec_id % {_CENT_SAMPLE_MOD} = 0
),
cent_dims AS (
  SELECT bucket, pos,
         CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS m
  FROM ex GROUP BY bucket, pos
),
cent AS (
  SELECT bucket, ARRAY_AGG(m ORDER BY pos) AS c
  FROM cent_dims GROUP BY bucket
),
scored AS (
  -- LEFT join + zero-vector anchor: a bucket with no sampled
  -- member still orders deterministically (matching the engine's
  -- zero-initialized centroid matrix)
  SELECT j.vec_id, j.bucket,
         CAST(list_sum(list_transform(generate_series(1, {_EMB_DIM}),
              i -> CAST(floor(round((j.v[i] - j.cc[i])
                   * (j.v[i] - j.cc[i]), 9) * {_NANO} + 0.5)
                   AS BIGINT))) AS BIGINT) AS dist_nano
  FROM (
    SELECT e.vec_id, e.v, b.b0 AS bucket,
           COALESCE(c.c, list_transform(generate_series(1, {_EMB_DIM}),
                    i -> 0.0)) AS cc
    FROM e JOIN buckets b USING (vec_id)
    LEFT JOIN cent c ON c.bucket = b.b0
  ) j
)
SELECT vec_id, bucket,
       CAST(row_number() OVER (PARTITION BY bucket
            ORDER BY dist_nano, vec_id) AS INTEGER) AS position,
       dist_nano
FROM scored
"""


QUERIES: dict[str, QuerySpec] = {
    "q257_preference_pairs": QuerySpec(
        q257_preference_pairs,
        ORACLE_Q257,
        "RLHF preference pairs: per-prompt reward extremes with"
        " margin denoising",
        ("llm", "posttraining"),
    ),
    "q258_icl_order": QuerySpec(
        q258_icl_order,
        ORACLE_Q258,
        "in-context-pretraining order: LSH-bucket-local"
        " similarity ordering, exact int64 distances",
        ("llm", "similarity", "posttraining"),
    ),
}
