"""Training-data pipeline operators, fourth batch (round 8):

- q167: BM25 over a PERSISTED inverted index — the retrieval analog
  of the q151/q158/`ivf_index` incremental indexes: a (t, doc_id,
  tf) postings table replaces per-call corpus re-tokenization, and
  every statistic BM25 needs (df, dl, corpus totals) derives from
  the index itself by narrow aggregates, so incremental maintenance
  is append-only with no side tables to sync.

Beyond-reference surface (BASELINE.json north star); all reference
citations for the shared machinery live in operators/retrieval.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, load


# ---------------------------------------------------------------------------
# q167 BM25 top-k from the persisted inverted index
# ---------------------------------------------------------------------------


def q167_bm25_index_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The standing-index retrieval shape: build the (t, doc_id, tf)
    postings table once (operators/retrieval.inverted_index — in
    production written bucketed by term; tests cover the parquet
    round trip and the index(A) ∪ index(B) == index(A ∪ B)
    incremental invariant), then answer queries from the INDEX
    alone: df/dl/corpus totals are three narrow aggregates over the
    postings, no corpus rescan, no re-tokenization
    (operators/retrieval.bm25_topk_from_index). Docs 3-5 serve as
    queries, top-5 each — disjoint from q162's query set so the two
    retrieval gates exercise different probe terms."""
    from synthea_etl_spark.operators.retrieval import (
        bm25_topk_from_index,
        inverted_index,
    )

    docs = load(spark, sf_dir, "documents")
    index = inverted_index(docs)
    queries = docs.filter(
        (F.col("doc_id") >= 3) & (F.col("doc_id") < 6)
    ).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    return bm25_topk_from_index(index, queries, k=5)


def _sql_bm25_index_oracle() -> str:
    from synthea_etl_spark.operators.retrieval import BM25_B, BM25_K1, MICRO

    # interpolate the EXACT Python float literals the engine uses so
    # both expression trees are the same IEEE computation. Unlike
    # q162, n_docs is the INDEX's document count (docs with >= 1
    # token) — the only corpus a standing index can see.
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
qt AS (SELECT DISTINCT doc_id AS query_id, t FROM tok
       WHERE doc_id >= 3 AND doc_id < 6),
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
)
SELECT query_id, doc_id,
       CAST(micro_score AS BIGINT) / {MICRO} AS score,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY micro_score DESC, doc_id) AS rank
  FROM per_doc
) WHERE rank <= 5
"""


QUERIES: dict[str, QuerySpec] = {
    "q167_bm25_index_topk": QuerySpec(
        q167_bm25_index_topk,
        _sql_bm25_index_oracle(),
        "BM25 top-k answered from the persisted inverted index",
        ("llm", "retrieval"),
    ),
}
