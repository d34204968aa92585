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

All three are COMPOSITIONS of individually hash-certified stages —
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
    w = Window.partitionBy("lang_guess").orderBy(
        F.asc("_h"), F.asc("doc_id")
    )
    return (
        lang.withColumn("lang_rank", F.row_number().over(w).cast("int"))
        .select(
            "doc_id",
            "lang_guess",
            "lang_rank",
            (F.col("lang_rank") <= _LANG_QUOTA).alias("keep"),
        )
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
}
