"""Round-9 LLM-pipeline additions — hybrid retrieval fusion and
dedup/mixture governance compositions:

- q179: hybrid retrieval — BM25 (indexed, q167's machinery) and
  exact dense cosine (q37's) fused with reciprocal-rank fusion in
  exact integer micro-units.
- q180: canonical near-dup representatives — connected components
  over MinHash-LSH pairs (q71's machinery) with the best-quality
  member (q170's integer heuristic) elected per cluster instead of
  min-id.
- q181: language-quota curation — language ID (q32's stopword
  scorer) + a deterministic md5 per-language admission rank, the
  multilingual analog of q157's domain quota.
- q182: temperature-scaled (alpha=0.5) mixture allocation — the
  mT5/XLM-R low-resource boosting rule, all-integer arithmetic.
- q183: IVF index health report — per-cluster occupancy and
  coherence under the q160 seed-only quantizer, the monitoring
  query behind the index-rollover maintenance contract.

All of these are COMPOSITIONS of individually hash-certified stages —
the round-9 theme: certify that certified parts compose without
re-deriving anything. Beyond-reference surface (the reference has no
retrieval/dedup engine); public knowledge only (RRF: Cormack et al.
SIGIR'09; bottom-k/minhash citations in operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.similarity as S
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.util import bucketed_rank
from synthea_etl_spark.plans.common import QuerySpec, load

# ---------------------------------------------------------------------------
# q179 hybrid retrieval: BM25 ∪ dense cosine, RRF-fused
# ---------------------------------------------------------------------------

_RRF_K0 = 60
_ARM_K = 20  # per-arm candidate depth
_FUSE_K = 10  # fused top-k served


def q179_hybrid_rrf_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid search, the production RAG retrieval shape: a lexical
    arm (BM25 top-20 answered from the persisted inverted index —
    q167's certified machinery) and a dense arm (exact cosine top-20
    over the aligned embeddings table — q37's), combined with
    reciprocal-rank fusion (operators/retrieval.rrf_fuse):
    fused(d) = Σ floor(1e12/(60 + rank_arm(d))). Integer micro-unit
    contributions make the fusion sum exact and order-independent,
    so the gate is hash-checked, not tolerance-based. Queries are
    docs 0-2 (text side) = vectors 0-2 (dense side); the corpus is
    every document/embedding. Each arm is itself certified; this
    gate certifies the fusion composes them bit-exactly."""
    from synthea_etl_spark.operators.retrieval import (
        bm25_topk_from_index,
        inverted_index,
        rrf_fuse,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    index = inverted_index(docs)
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    lexical = bm25_topk_from_index(index, queries, k=_ARM_K).select(
        "query_id", "doc_id", "rank"
    )

    emb = load(spark, sf_dir, "embeddings")
    dense = S.knn_bruteforce(
        emb, emb.filter(F.col("vec_id") < 3), k=_ARM_K
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lexical, dense], k0=_RRF_K0, topk=_FUSE_K)


def _sql_hybrid_rrf_oracle() -> str:
    from synthea_etl_spark.operators.retrieval import (
        BM25_B,
        BM25_K1,
        MICRO,
        RRF_MICRO,
    )

    k1p1, k1 = repr(BM25_K1 + 1.0), repr(BM25_K1)
    omb, b = repr(1.0 - BM25_B), repr(BM25_B)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT doc_id, UNNEST(w) AS t FROM toks),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM dl) AS n_docs,
         (SELECT SUM(dl) FROM dl) AS total_len
),
dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
qt AS (SELECT DISTINCT doc_id AS query_id, t FROM tok WHERE doc_id < 3),
term_scores AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(floor(
           ((n_docs - df + 0.5) / (df + 0.5))
           * ((tf * {k1p1}) / (tf + {k1} * ({omb} + ({b} * dl)
               / (CAST(total_len AS DOUBLE) / n_docs))))
           * {MICRO} + 0.5) AS BIGINT) AS m
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dft USING (t)
  JOIN qt USING (t)
  CROSS JOIN stats
),
per_doc AS (
  SELECT query_id, doc_id, SUM(m) AS micro_score
  FROM term_scores GROUP BY query_id, doc_id
),
lex AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY micro_score DESC, doc_id) AS rank
    FROM per_doc
  ) WHERE rank <= {_ARM_K}
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 3),
c AS (SELECT vec_id AS doc_id, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings),
dense_scored AS (
  SELECT query_id, doc_id,
         round(list_cosine_similarity(qv, cv), 6) AS sim
  FROM q, c WHERE doc_id <> query_id
),
dense AS (
  SELECT query_id, doc_id, rank FROM (
    SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY sim DESC, doc_id) AS rank
    FROM dense_scored
  ) WHERE rank <= {_ARM_K}
),
contrib AS (
  SELECT query_id, doc_id,
         CAST(floor({RRF_MICRO}.0 / ({_RRF_K0} + rank)) AS BIGINT) AS c
  FROM lex
  UNION ALL
  SELECT query_id, doc_id,
         CAST(floor({RRF_MICRO}.0 / ({_RRF_K0} + rank)) AS BIGINT) AS c
  FROM dense
),
fused AS (
  SELECT query_id, doc_id, SUM(c) AS rrf_micro,
         CAST(count(*) AS INTEGER) AS n_arms
  FROM contrib GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro, n_arms,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY rrf_micro DESC, doc_id) AS rank
  FROM fused
) WHERE rank <= {_FUSE_K}
"""


# ---------------------------------------------------------------------------
# q180 canonical near-dup representatives (quality-argmax per cluster)
# ---------------------------------------------------------------------------

# integer quality heuristic shared with q170 (n_tokens + distinct
# tokens - punctuation marks): deterministic, oracle-expressible
def _int_quality_score(text_col: str) -> F.Column:
    t = T.tokens(text_col)
    return F.coalesce(
        (
            F.size(t)
            + F.size(F.array_distinct(t))
            - F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]"))
        ).cast("long"),
        F.lit(0).cast("long"),
    )


def q180_canonical_near_dup_reps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative election for near-dup clusters: instead of
    q71's min-id label, each MinHash-LSH connected component keeps
    its BEST-QUALITY member (the curation rule real pipelines use —
    drop the mirror copies, keep the cleanest) under the q170
    integer heuristic, ties to the smaller doc_id. Composition of
    three certified stages: LSH candidate pairs (q33) → connected
    components (q71) → quality argmax (q170's scorer). Returns one
    row per cluster: (cluster_id, rep_doc_id, rep_score, n_members).

    Scale: pairs and components are the certified bucketed paths;
    the election adds one join of the (id, cluster) frame against
    per-doc scores and one per-cluster window — all keyed shuffles
    on cluster_id, no corpus blow-up."""
    from pyspark.sql import Window

    from synthea_etl_spark.plans.llm import q33_minhash_lsh_candidates

    pairs = q33_minhash_lsh_candidates(spark, sf_dir)
    clusters = D.connected_components(pairs)  # (id, cluster_id)
    docs = load(spark, sf_dir, "documents")
    scores = docs.select(
        F.col("doc_id").alias("id"), _int_quality_score("text").alias("score")
    )
    members = clusters.join(scores, "id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("score"), F.asc("id")
    )
    wc = Window.partitionBy("cluster_id")
    return (
        members.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc).cast("long"))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col("id").alias("rep_doc_id"),
            F.col("score").alias("rep_score"),
            "n_members",
        )
    )


def _sql_canonical_reps_oracle() -> str:
    from synthea_etl_spark.plans.llm import _sql_clusters_oracle

    clusters = _sql_clusters_oracle().strip()
    return rf"""
WITH cl AS ({clusters}),
t AS (
  SELECT doc_id AS id,
         COALESCE(CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END
           + CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(list_distinct(string_split_regex(trim(text), '\s+')))
             END
           - len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT), 0) AS score
  FROM documents
),
m AS (SELECT cl.cluster_id, cl.id, t.score FROM cl JOIN t USING (id))
SELECT cluster_id, id AS rep_doc_id, score AS rep_score,
       CAST(n_members AS BIGINT) AS n_members
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY cluster_id ORDER BY score DESC, id) AS rn,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM m
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# q181 language-quota curation (multilingual mixture governance)
# ---------------------------------------------------------------------------

_LANG_QUOTA = 40


def q181_language_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language admission quota — the multilingual analog of
    q157's domain quota, the mixture-governance step that stops one
    dominant language from swamping a multilingual corpus: language
    ID via the q32 stopword scorer, then a deterministic md5
    admission rank within each language (ties to doc_id) and
    keep = rank <= quota. Deterministic end to end, so re-runs and
    engines agree doc by doc. Returns (doc_id, lang_guess,
    lang_rank, keep).

    Scale: one narrow per-row language expression (no UDF), one
    shuffle on the language key for the window — and the window's
    per-partition state is a counter, not a buffer. Skew note: at
    100 TB one language dominating is the NORM (English ~half of
    crawl corpora); for that shape swap the window for the q170
    decile trick on the hash value (aggregate per-language hash
    quantiles, broadcast thresholds) — same result, no single-task
    language partition. The window form gated here is correct at
    any scale; the threshold form is the throughput optimization."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    lang = docs.select(
        "doc_id",
        T.lang_guess("text").alias("lang_guess"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("lq"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    )
    # skew-free rank: ~20 language keys over the corpus would make a
    # plain window ~20 giant sort tasks; the bucketed form is exact
    # (util.bucketed_rank) and keeps this gate hash byte-identical
    ranked = bucketed_rank(
        lang.withColumn("_b", F.expr("_h div 4194304").cast("int")),
        ["lang_guess"],
        "_b",
        [F.asc("_h"), F.asc("doc_id")],
        "_lr",
    )
    return ranked.select(
        "doc_id",
        "lang_guess",
        F.col("_lr").cast("int").alias("lang_rank"),
        (F.col("_lr") <= _LANG_QUOTA).alias("keep"),
    )


def _sql_language_quota_oracle() -> str:
    from synthea_etl_spark.plans.llm import _sql_lang_oracle

    lang_sql = _sql_lang_oracle().strip()
    return f"""
WITH lg AS ({lang_sql}),
h AS (
  SELECT doc_id, lang_guess,
         CAST(concat('0x', substr(md5('lq' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) AS hh
  FROM lg
)
SELECT doc_id, lang_guess, CAST(lang_rank AS INTEGER) AS lang_rank,
       lang_rank <= {_LANG_QUOTA} AS keep
FROM (
  SELECT doc_id, lang_guess, row_number() OVER (
      PARTITION BY lang_guess ORDER BY hh, doc_id) AS lang_rank
  FROM h
)
"""




# ---------------------------------------------------------------------------
# q182 temperature-scaled mixture sampling (alpha-sampling)
# ---------------------------------------------------------------------------

_TEMP_MICRO = 1_000_000
_MIX_BUDGET = 200  # documents the curated mix admits


def q182_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha = 0.5) mixture sampling -- the
    multilingual balancing rule mT5/XLM-R-style pipelines apply:
    language l's share of the curated budget is proportional to
    count_l^alpha, boosting low-resource languages relative to raw
    frequency while never exceeding a language's own supply. All
    allocation arithmetic is INTEGER: w_l = floor(sqrt(count_l)*1e6
    + 0.5) (one correctly-rounded IEEE sqrt, then micro-quantized),
    n_keep_l = min(count_l, (w_l * budget) div sum(w)) -- exact
    integer multiply/divide, so the allocation is bit-identical on
    any engine and any summation order (a float share sum over
    languages would be order-dependent). Admission within a language
    is the deterministic md5 rank (salt 'tm'). Returns (doc_id,
    lang_guess, lang_rank, keep).

    Scale: one narrow language expression per row, one tiny
    per-language aggregate (broadcast back), one window per language
    for ranks -- same skew note as q181 (SCALE.md): for one dominant
    language swap the rank window for aggregated hash thresholds."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    lang = docs.select(
        "doc_id",
        T.lang_guess("text").alias("lang_guess"),
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tm"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    ).localCheckpoint()
    # ^ r15 (guide §1.2, §8): the narrow (doc_id, lang, hash) proxy
    # fed the per-language counts AND the rank window — the
    # lang_guess regex tower ran over the corpus 3x. per_lang below
    # is lang-sized and feeds the wq->total/alloc chain twice.
    per_lang = lang.groupBy("lang_guess").agg(
        F.count("*").cast("long").alias("_cnt")
    ).localCheckpoint()
    wq = per_lang.select(
        "lang_guess",
        "_cnt",
        F.floor(F.sqrt(F.col("_cnt")) * _TEMP_MICRO + F.lit(0.5))
        .cast("long")
        .alias("_w"),
    )
    total = wq.agg(F.sum("_w").alias("_tw"))
    alloc = wq.crossJoin(F.broadcast(total)).select(
        "lang_guess",
        F.least(
            F.col("_cnt"),
            # integer div, matching the oracle's `//`: the float-/
            # form loses low bits once w*budget clears 2^53 and the
            # docstring's exactness claim with it
            F.expr(f"(_w * {_MIX_BUDGET}) div _tw"),
        ).alias("_n_keep"),
    )
    w = Window.partitionBy("lang_guess").orderBy(F.asc("_h"), F.asc("doc_id"))
    return (
        lang.withColumn("lang_rank", F.row_number().over(w).cast("int"))
        .join(F.broadcast(alloc), "lang_guess")
        .select(
            "doc_id",
            "lang_guess",
            "lang_rank",
            (F.col("lang_rank") <= F.col("_n_keep")).alias("keep"),
        )
    )


def _sql_temperature_mixture_oracle() -> str:
    from synthea_etl_spark.plans.llm import _sql_lang_oracle

    lang_sql = _sql_lang_oracle().strip()
    return f"""
WITH lg AS ({lang_sql}),
h AS (
  SELECT doc_id, lang_guess,
         CAST(concat('0x', substr(md5('tm' || CAST(doc_id AS VARCHAR)), 1, 8))
           AS BIGINT) AS hh
  FROM lg
),
pl AS (SELECT lang_guess, count(*) AS cnt FROM h GROUP BY lang_guess),
wq AS (
  SELECT lang_guess, cnt,
         CAST(floor(sqrt(cnt) * {_TEMP_MICRO} + 0.5) AS BIGINT) AS w
  FROM pl
),
alloc AS (
  SELECT lang_guess,
         least(cnt, CAST((w * {_MIX_BUDGET})
             // (SELECT SUM(w) FROM wq) AS BIGINT)) AS n_keep
  FROM wq
),
ranked AS (
  SELECT doc_id, lang_guess, row_number() OVER (
      PARTITION BY lang_guess ORDER BY hh, doc_id) AS lang_rank
  FROM h
)
SELECT doc_id, ranked.lang_guess,
       CAST(lang_rank AS INTEGER) AS lang_rank,
       lang_rank <= n_keep AS keep
FROM ranked JOIN alloc USING (lang_guess)
"""


# ---------------------------------------------------------------------------
# q183 IVF index health stats (per-cluster occupancy + coherence)
# ---------------------------------------------------------------------------

_Q183_CELLS = 16


def q183_ivf_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-operations telemetry for the persisted IVF ANN table:
    per cluster, how many vectors it holds, the mean similarity of
    its members to the centroid (micro-quantized before summing --
    order-independent), and a hot flag (occupancy > 2x the mean
    cell) -- the monitoring query that tells an operator when the
    quantizer has drifted and a retrain/rollover is due (the
    documented maintenance contract of ivf_index). Seed-only
    centroids (q160's md5-min rule) keep the whole report
    closed-form, so the gate is hash-exact. Returns (cluster,
    n_vecs, mean_sim_micro, hot)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    centroids = S.ivf_train_centroids(
        emb, n_centroids=_Q183_CELLS, lloyd_iters=0
    )
    index = S.ivf_index(emb, centroids)
    cframe = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)],
        "cluster int, sv array<double>",
    )
    cos = S.make_cosine_udf()
    sim_micro = F.floor(
        F.round(cos(F.col("cv"), F.col("sv")), 6) * F.lit(1_000_000)
        + F.lit(0.5)
    ).cast("long")
    per_cell = (
        index.join(F.broadcast(cframe), "cluster")
        .select(F.col("cluster"), sim_micro.alias("_sm"))
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.floor(F.sum("_sm") / F.count("*")).cast("long")
            .alias("mean_sim_micro"),
        )
    )
    avg_occ = per_cell.agg(
        (F.sum("n_vecs") / F.count("*")).alias("_avg")
    )
    return (
        per_cell.crossJoin(F.broadcast(avg_occ))
        .select(
            "cluster",
            "n_vecs",
            "mean_sim_micro",
            (F.col("n_vecs") > 2 * F.col("_avg")).alias("hot"),
        )
    )


ORACLE_Q183 = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cluster
  FROM c
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {_Q183_CELLS}
),
asg AS (
  SELECT vec_id, cv, cluster FROM (
    SELECT c.vec_id, c.cv, seeds.cluster, seeds.sv,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cluster ASC)
             AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
pc AS (
  SELECT a.cluster, count(*) AS n_vecs,
         CAST(floor(SUM(CAST(floor(
             round(list_cosine_similarity(a.cv, s.sv), 6) * 1000000 + 0.5)
           AS BIGINT)) / count(*)) AS BIGINT) AS mean_sim_micro
  FROM asg a JOIN seeds s USING (cluster)
  GROUP BY a.cluster
)
SELECT CAST(cluster AS INTEGER) AS cluster,
       CAST(n_vecs AS BIGINT) AS n_vecs, mean_sim_micro,
       n_vecs > 2 * (SELECT SUM(n_vecs) / count(*) FROM pc) AS hot
FROM pc
"""




QUERIES: dict[str, QuerySpec] = {
    "q179_hybrid_rrf_retrieval": QuerySpec(
        q179_hybrid_rrf_retrieval,
        _sql_hybrid_rrf_oracle(),
        "hybrid BM25 + dense retrieval fused with exact-integer RRF",
        ("llm", "retrieval", "similarity"),
    ),
    "q180_canonical_near_dup_reps": QuerySpec(
        q180_canonical_near_dup_reps,
        _sql_canonical_reps_oracle(),
        "quality-argmax canonical representative per near-dup cluster",
        ("llm", "dedup", "quality"),
    ),
    "q181_language_quota": QuerySpec(
        q181_language_quota,
        _sql_language_quota_oracle(),
        "per-language admission quota (multilingual mixture governance)",
        ("llm", "text", "quality"),
    ),
    "q182_temperature_mixture": QuerySpec(
        q182_temperature_mixture,
        _sql_temperature_mixture_oracle(),
        "alpha=0.5 temperature-scaled mixture allocation, exact integers",
        ("llm", "text", "quality"),
    ),
    "q183_ivf_index_stats": QuerySpec(
        q183_ivf_index_stats,
        ORACLE_Q183,
        "per-cluster IVF index occupancy/coherence health report",
        ("llm", "similarity"),
    ),
}
