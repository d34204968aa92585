"""Round-9 LLM-pipeline additions, part 8 — index QUALITY
monitoring (the QA reports run against the approximate-index
families, completing q183's health-report direction):

- q202: MinHash-LSH recall evaluation — every exact-Jaccard >= 0.3
  truth pair labeled with whether the banded LSH candidate
  generation (q33's certified machinery) caught it. The offline QA
  report behind the bands/rows trade: at production scale it runs
  on a SAMPLE of the corpus (exact truth is quadratic by nature —
  that is WHY the LSH index exists); the gate corpus is its own
  sample.
- q203: embedding-LSH recall evaluation — the vector-side twin:
  exact cosine >= 0.4 truth pairs (q38's blocked-pair machinery)
  labeled with whether the hyperplane-LSH multiprobe path (q123)
  caught them. Both sides are deterministic (md5 hyperplanes), so
  the recall report itself is hash-gateable.

Both reports aggregate to recall-by-similarity-band with one
groupBy on the gated frame; the per-pair detail is gated so the
composition (truth JOIN candidates) is certified, not just the
summary.

Beyond-reference surface (the reference's four Glue scripts are
boto3 orchestration; Glue_Scripts/Patient_datamart.py:1-120).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.plans.common import QuerySpec, load

# ---------------------------------------------------------------------------
# q202 MinHash-LSH recall vs exact Jaccard truth
# ---------------------------------------------------------------------------


def q202_minhash_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Truth = exact 3-gram Jaccard >= 0.3 pairs over the whole
    corpus (shared-shingle equi-join — docs sharing no shingle never
    pair, so this is NOT a cross join even unblocked); candidates =
    q33's 32-perm 8-band LSH pairs. Returns (id_a, id_b, jaccard,
    caught): caught=false rows are exactly the recall losses the
    bands/rows setting trades away. Offline-QA shape: run on a
    corpus sample at scale; the exact side is the cost you pay to
    MEASURE the index, not to run it."""
    d = load(spark, sf_dir, "documents")
    truth = D.jaccard_pairs(
        d, "text", "doc_id", 3, 0.3, block_col=None, allow_unblocked=True
    )
    sig = D.minhash_signature(d, "text", "doc_id", 32, 3)
    cand = D.lsh_candidates(sig, "doc_id", 32, 8).select(
        "id_a", "id_b", F.lit(True).alias("_c")
    )
    return truth.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "jaccard",
        F.coalesce(F.col("_c"), F.lit(False)).alias("caught"),
    )


def _q202_oracle() -> str:
    from synthea_etl_spark.plans.llm import (
        SQL_SHINGLES,
        SQL_TOKS,
        _sql_minhash_oracle,
    )

    cand = _sql_minhash_oracle().strip()
    return f"""
WITH {SQL_TOKS.strip()}, {SQL_SHINGLES.strip()},
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS id_a, y.doc_id AS id_b, COUNT(*) AS i
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT id_a, id_b,
         CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.3
),
cand AS ({cand})
SELECT t.id_a, t.id_b, t.jaccard,
       c.id_a IS NOT NULL AS caught
FROM truth t
LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
"""


# ---------------------------------------------------------------------------
# q203 embedding-LSH recall vs exact cosine truth
# ---------------------------------------------------------------------------


def q203_embedding_recall_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Truth = exact cosine >= 0.4 pairs (q38's blocked quadratic
    listing — the measurement cost, paid on a sample at scale);
    candidates = q123's hyperplane-LSH multiprobe pairs (no false
    positives by construction — every candidate is exact-verified —
    so the only question is recall). Returns (id_a, id_b, sim,
    caught)."""
    e = load(spark, sf_dir, "embeddings")
    truth = S.embedding_near_dup_pairs(e, threshold=0.4)
    cand = S.embedding_near_dup_lsh(
        e, threshold=0.4, n_planes=6, multiprobe=2
    ).select("id_a", "id_b", F.lit(True).alias("_c"))
    return truth.join(cand, ["id_a", "id_b"], "left").select(
        "id_a",
        "id_b",
        "sim",
        F.coalesce(F.col("_c"), F.lit(False)).alias("caught"),
    )


def _q203_oracle() -> str:
    from synthea_etl_spark.plans.llm import ORACLE_Q38, ORACLE_Q123

    return f"""
WITH truth AS ({ORACLE_Q38.strip()}),
cand AS ({ORACLE_Q123.strip()})
SELECT t.id_a, t.id_b, t.sim,
       c.id_a IS NOT NULL AS caught
FROM truth t
LEFT JOIN cand c ON t.id_a = c.id_a AND t.id_b = c.id_b
"""


QUERIES: dict[str, QuerySpec] = {
    "q202_minhash_recall_eval": QuerySpec(
        q202_minhash_recall_eval,
        _q202_oracle(),
        "per-pair MinHash-LSH recall report vs exact Jaccard truth",
        ("llm", "dedup"),
    ),
    "q203_embedding_recall_eval": QuerySpec(
        q203_embedding_recall_eval,
        _q203_oracle(),
        "per-pair embedding-LSH recall report vs exact cosine truth",
        ("llm", "similarity"),
    ),
}
