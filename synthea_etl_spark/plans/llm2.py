"""Training-data pipeline operators, second batch: sequence packing,
benchmark-contamination screening, and embedding quantization — the
remaining first-class LLM-pipeline stages (BASELINE.json north star)
beyond dedup/similarity/text-analysis in plans/llm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.packing as P
import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.plans.common import QuerySpec, load

PACK_BUDGET = 2048
BENCH_DOCS = 20  # doc_id < 20 stands in for an eval benchmark set


def q97_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence packing: concatenate tokens in doc_id order,
    cut every PACK_BUDGET tokens, assign each doc the pack where it
    starts. The global running offset uses operators/util.
    distributed_cumsum (deterministic range shards + shard-total
    prefix), NOT a single-partition window."""
    return P.pack_sequences(
        load(spark, sf_dir, "documents"), "text", "doc_id", budget=PACK_BUDGET
    )


# DuckDB's window cumsum is the semantic spec the distributed version
# must match exactly.
ORACLE_Q97 = f"""
SELECT doc_id,
       CAST(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END
            AS BIGINT) AS n_tokens,
       CAST(COALESCE(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END)
            OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) AS BIGINT) AS start_offset,
       CAST(COALESCE(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END)
            OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) // {PACK_BUDGET} AS BIGINT) AS pack_id,
       CAST(COALESCE(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                 ELSE len(string_split_regex(trim(text), '\\s+')) END)
            OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
                  AND 1 PRECEDING), 0) % {PACK_BUDGET} AS BIGINT) AS pack_offset
FROM documents
"""


def q98_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination screen: distinct 3-gram overlap of every
    corpus doc (doc_id >= BENCH_DOCS) against the benchmark set
    (doc_id < BENCH_DOCS), benchmark shingles broadcast."""
    docs = load(spark, sf_dir, "documents")
    return D.contamination_overlap(
        docs.filter(F.col("doc_id") >= BENCH_DOCS),
        docs.filter(F.col("doc_id") < BENCH_DOCS),
        "text",
        "doc_id",
    )


ORACLE_Q98 = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM toks, LATERAL (SELECT UNNEST(generate_series(1, len(w)-2)) AS i) u
  WHERE len(w) >= 3
),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < {BENCH_DOCS})
SELECT c.doc_id,
       COUNT(*) AS n_shingles,
       CAST(COALESCE(SUM(CASE WHEN b.s IS NOT NULL THEN 1 END), 0) AS BIGINT)
         AS n_overlap,
       CAST(COALESCE(SUM(CASE WHEN b.s IS NOT NULL THEN 1 END), 0) AS DOUBLE)
         / CAST(COUNT(*) AS DOUBLE) AS overlap_ratio
FROM sh c LEFT JOIN bench b ON c.s = b.s
WHERE c.doc_id >= {BENCH_DOCS}
GROUP BY c.doc_id
"""


def q99_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-dimension int8 quantization of the embedding
    corpus: one 64-group scale aggregate broadcast back over the
    exploded values."""
    return S.quantize_embeddings_int8(load(spark, sf_dir, "embeddings"))


ORACLE_Q99 = """
WITH ex AS (
  SELECT vec_id, i - 1 AS pos, CAST(e[i] AS DOUBLE) AS x
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       LATERAL (SELECT UNNEST(generate_series(1, len(e))) AS i) u
),
scales AS (SELECT pos, MAX(ABS(x)) AS scale FROM ex GROUP BY pos)
SELECT ex.vec_id, CAST(ex.pos AS INTEGER) AS pos,
       CAST(CASE WHEN s.scale = 0 THEN 0
                 ELSE round(ex.x * 127.0 / s.scale) END AS INTEGER) AS q,
       s.scale
FROM ex JOIN scales s ON ex.pos = s.pos
"""


QUERIES: dict[str, QuerySpec] = {
    "q97_pack_sequences": QuerySpec(
        q97_pack_sequences,
        ORACLE_Q97,
        "GPT-style sequence packing via distributed cumsum",
        ("llm", "packing"),
    ),
    "q98_contamination": QuerySpec(
        q98_contamination,
        ORACLE_Q98,
        "benchmark contamination n-gram screen",
        ("llm", "dedup", "quality"),
    ),
    "q99_embed_quantize": QuerySpec(
        q99_embed_quantize,
        ORACLE_Q99,
        "per-dimension int8 embedding quantization",
        ("llm", "similarity"),
    ),
}
