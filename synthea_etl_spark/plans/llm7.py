"""Round-9 LLM-pipeline additions, part 3 — paragraph dedup, the
non-repetition Gopher rules, PQ compressed ANN, and diversity
sampling:

- q187: paragraph-level exact dedup — Gopher (Rae et al. 2021 §A.1.2)
  and C4 both remove duplicated paragraphs corpus-wide before
  training; here paragraphs are deterministic non-overlapping
  20-token windows (the corpus has no newlines), the winner of each
  duplicate group is the smallest (doc_id, para_idx), and the output
  is the per-doc governance report (paragraph counts, removals,
  tokens removed).
- q188: the NON-repetition Gopher document-quality rules (Rae et al.
  2021 table A1): word-count bounds, mean-word-length bounds,
  alphabetic-word fraction, minimum stop-word hits — complementing
  q184 which applies the repetition rules. Zero-shuffle array
  expressions; exact integer micro-units.
- q189: product-quantization ANN (Jégou, Douze, Schmid 2011, "Product
  Quantization for Nearest Neighbor Search"): m=8 subspaces x 16
  seeded centroids, 8-byte codes, asymmetric-distance (ADC) top-k.
  With LSH (q39) and IVF (q43/q160/q169) this completes the three
  classic ANN families. All distance arithmetic runs on
  1e4-quantized integer coordinates, so encode, ADC tables, and
  ranking are exact int64 — hash-gated, not tolerance-gated.
- q190: cluster-balanced subsampling — per-cell admission quotas over
  the seeded quantizer's cells with a deterministic md5 pick order,
  the diversity-preserving coreset step curation pipelines run
  between dedup and mixture weighting (cf. SemDeDup §5 / DataComp
  balancing); complements q165 (which removes near-dups inside
  cells) and q181/q182 (which quota by language, not by content).

Beyond-reference surface (the reference's four Glue scripts have no
text/vector engine; Glue_Scripts/Patient_datamart.py:1-120 is its
actual scope). Public knowledge only: citations above; the seeded
deterministic quantizer discipline follows plans/llm3.py q160.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q187 paragraph-level exact dedup (Gopher/C4 pre-training step)
# ---------------------------------------------------------------------------

_PARA_W = 20  # tokens per synthetic paragraph (corpus has no newlines)


def q187_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide paragraph dedup report: chunk every doc into
    non-overlapping 20-token paragraphs (chunk_by_tokens with
    overlap=0 — the same codegen chunker q140 certifies), fingerprint
    each paragraph, elect the smallest (doc_id, para_idx) as the
    winner of every duplicate group, and report per doc: paragraph
    count, paragraphs that belong to any corpus-wide duplicate group,
    paragraphs a dedup pass would REMOVE (non-winners), and the
    tokens those removals reclaim.

    Scale: the chunker is a narrow no-shuffle explode; dedup is ONE
    shuffle on the 16-byte fingerprint (count + min-winner in the
    same aggregate, map-side combined), rejoined on the fingerprint
    and re-aggregated on doc_id. The exact shape Gopher-scale
    paragraph dedup needs at 100 TB: nothing ever pairs paragraphs,
    groups are keyed by hash."""
    paras = T.chunk_by_tokens(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        window=_PARA_W,
        overlap=0,
    ).select(
        F.col("id").alias("doc_id"),
        F.col("chunk_idx").alias("para_idx"),
        F.col("chunk_tokens").alias("para_tokens"),
        F.md5("chunk_text").alias("fp"),
    )
    groups = paras.groupBy("fp").agg(
        F.count("*").alias("_n"),
        F.min(F.struct("doc_id", "para_idx")).alias("_win"),
    )
    flagged = paras.join(groups, "fp").select(
        "doc_id",
        "para_tokens",
        (F.col("_n") > 1).alias("_dup"),
        (
            (F.col("_n") > 1)
            & ~(
                (F.col("_win.doc_id") == F.col("doc_id"))
                & (F.col("_win.para_idx") == F.col("para_idx"))
            )
        ).alias("_rm"),
    )
    return flagged.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_paras"),
        F.sum(F.col("_dup").cast("long")).cast("long").alias("n_dup_paras"),
        F.sum(F.col("_rm").cast("long")).cast("long").alias("n_removed"),
        F.sum(F.when(F.col("_rm"), F.col("para_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("tokens_removed"),
    )


ORACLE_Q187 = f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id, toks,
         GREATEST(1, CAST(CEIL(len(toks) / {_PARA_W}.0) AS BIGINT))
           AS n_chunks
  FROM t
),
paras AS (
  SELECT doc_id, CAST(k.range AS INTEGER) AS para_idx,
         len(toks[k.range * {_PARA_W} + 1 :
                  k.range * {_PARA_W} + {_PARA_W}]) AS para_tokens,
         md5(array_to_string(
             toks[k.range * {_PARA_W} + 1 :
                  k.range * {_PARA_W} + {_PARA_W}], ' ')) AS fp
  FROM g, range(200) k WHERE k.range < n_chunks
),
marked AS (
  SELECT doc_id, para_tokens,
         count(*) OVER (PARTITION BY fp) AS n,
         row_number() OVER (
             PARTITION BY fp ORDER BY doc_id, para_idx) AS rn
  FROM paras
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_paras,
       CAST(SUM(CASE WHEN n > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_paras,
       CAST(SUM(CASE WHEN n > 1 AND rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN n > 1 AND rn > 1 THEN para_tokens ELSE 0 END)
         AS BIGINT) AS tokens_removed
FROM marked
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q188 Gopher non-repetition document-quality rules
# ---------------------------------------------------------------------------

# Rae et al. 2021 table A1 bounds (micro-units where fractional).
_MIN_WORDS = 50
_MAX_WORDS = 100_000
_MIN_WLEN = 3 * MICRO
_MAX_WLEN = 10 * MICRO
_MIN_ALPHA = 800_000  # >= 80% of words contain an alphabetic char
_MIN_STOP = 2  # >= 2 hits from the small stop-word list


def q188_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-repetition half of the Gopher quality filter (q184
    applies the repetition half): per doc the word count, mean word
    length, fraction of words containing an alphabetic character,
    stop-word hit count, and the composite keep flag applying the
    published bounds. Fractions are exact integer micro-units
    (x * 1e6 div n).

    Scale: ZERO shuffle — every signal is a filter/aggregate lambda
    over the token array inside one whole-stage-codegen span; 100 TB
    of documents stream through map-only tasks. The stop-word list
    lives in the expression (catalog-sized); nothing is collected."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.size(toks)
    nn = F.greatest(n, F.lit(1)).cast("long")
    # codegen single-pass regexp counts (r15, guide §4.1) — the
    # proven-equivalent forms of the interpreted array lambdas
    # (tests/test_text_expr_equiv.py; gopher_quality_ok shares them)
    sum_len = T.nonws_char_count("text")
    n_alpha = T.alpha_token_count("text")
    n_stop = T.stopword_token_count("text")
    out = d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        (sum_len * F.lit(MICRO).cast("long")).alias("_sl"),
        (n_alpha.cast("long") * F.lit(MICRO).cast("long")).alias("_al"),
        nn.alias("_nn"),
        n_stop.cast("long").alias("n_stop_hits"),
    ).select(
        "doc_id",
        "n_words",
        F.expr("_sl div _nn").alias("mean_wlen_micro"),
        F.expr("_al div _nn").alias("alpha_frac_micro"),
        "n_stop_hits",
    )
    return out.withColumn(
        "keep",
        (F.col("n_words") >= _MIN_WORDS)
        & (F.col("n_words") <= _MAX_WORDS)
        & (F.col("mean_wlen_micro") >= _MIN_WLEN)
        & (F.col("mean_wlen_micro") <= _MAX_WLEN)
        & (F.col("alpha_frac_micro") >= _MIN_ALPHA)
        & (F.col("n_stop_hits") >= _MIN_STOP),
    )


ORACLE_Q188 = f"""
WITH t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
),
s AS (
  SELECT doc_id,
         len(w) AS n_words,
         GREATEST(len(w), 1) AS nn,
         COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
           AS sum_len,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS n_alpha,
         len(list_filter(w, x -> list_contains(
             ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x))) AS n_stop
  FROM t
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(sum_len * {MICRO} // nn AS BIGINT) AS mean_wlen_micro,
       CAST(n_alpha * {MICRO} // nn AS BIGINT) AS alpha_frac_micro,
       CAST(n_stop AS BIGINT) AS n_stop_hits,
       n_words >= {_MIN_WORDS} AND n_words <= {_MAX_WORDS}
         AND sum_len * {MICRO} // nn >= {_MIN_WLEN}
         AND sum_len * {MICRO} // nn <= {_MAX_WLEN}
         AND n_alpha * {MICRO} // nn >= {_MIN_ALPHA}
         AND n_stop >= {_MIN_STOP} AS keep
FROM s
"""


# ---------------------------------------------------------------------------
# q189 product-quantization ANN with ADC scoring (exact integer twin)
# ---------------------------------------------------------------------------

_PQ_M = 8  # subspaces
_PQ_DSUB = 8  # dims per subspace (8 x 8 = the 64-dim embedding)
_PQ_KS = 16  # centroids per subspace -> 4-bit code, 8 codes/vector
_PQ_QSCALE = 10_000  # coordinate quantizer: int(floor(x * 1e4 + 0.5))
_PQ_TOPK = 5


def _pq_seed_matrix(spark: SparkSession, sf_dir: str):
    """The _PQ_KS corpus vectors of smallest md5(vec_id) — the same
    deterministic seed discipline as q160's IVF quantizer — as an
    int64 numpy matrix of 1e4-quantized coordinates. Bounded collect:
    the orderBy+limit runs distributed (per-partition top-k merged on
    the driver), so only k x dim floats ever reach the driver — the
    IVF-centroid-pull contract (the first cut collected the whole
    table and sorted in Python; at 100 TB that is a driver OOM)."""
    import numpy as np

    rows = (
        load(spark, sf_dir, "embeddings")
        .select(
            "embedding",
            F.md5(F.col("vec_id").cast("string")).alias("_r"),
        )
        .orderBy("_r")
        .limit(_PQ_KS)
        .collect()
    )
    seed = np.array([r.embedding for r in rows], dtype=np.float64)
    return np.floor(seed * _PQ_QSCALE + 0.5).astype(np.int64)


def q189_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gated PQ query: ADC top-_PQ_TOPK (see pq_adc_topk)."""
    return pq_adc_topk(spark, sf_dir, _PQ_TOPK)


def pq_adc_topk(
    spark: SparkSession, sf_dir: str, topk: int
) -> DataFrame:
    """Product-quantization ANN: codebook j's 16 centroids are the
    j-th 8-dim subvectors of the 16 seed vectors (smallest
    md5(vec_id) — q160's quantizer seeding); every corpus vector is
    encoded to 8 codes by per-subspace nearest centroid; queries
    (vec_id < 10) build 8x16 ADC tables and rank candidates by the
    summed table lookups. ALL arithmetic is exact int64 on
    1e4-quantized coordinates: encode argmin, ADC entries, and the
    final ordering are bit-identical on any engine — the PQ
    *machinery* gets an exact DuckDB twin the way q160 certifies IVF.

    100 TB design: the encode pass is one Arrow-batched numpy
    distance computation per batch producing an m-byte code per
    vector (64x compression — the point of PQ: the scan set fits in
    memory where raw vectors don't); query ADC tables are m*16-entry
    arrays broadcast to a JVM-side aggregate over the zipped code
    array — no shuffle until the per-query top-k (bounded by the
    query batch). Candidates never pair with raw vectors."""
    import numpy as np  # noqa: F401  (shipped to executors via closure)

    seed_q = _pq_seed_matrix(spark, sf_dir)  # (KS, 64) int64

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def encode(batches):
        import numpy as np
        import pandas as pd

        cb = seed_q.reshape(_PQ_KS, _PQ_M, _PQ_DSUB)  # (KS, M, DSUB)
        for pdf in batches:
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            xq = np.floor(x * _PQ_QSCALE + 0.5).astype(np.int64)
            xs = xq.reshape(-1, _PQ_M, _PQ_DSUB)  # (n, M, DSUB)
            # (n, M, KS): exact integer squared L2 per subspace
            diff = xs[:, None, :, :] - cb[None, :, :, :]  # (n, KS, M, D)
            d = np.einsum("nkmd,nkmd->nkm", diff, diff)  # (n, KS, M)
            codes = d.argmin(axis=1).astype(np.int32)  # first-min = low id
            yield pd.DataFrame(
                {"neighbor_id": pdf["vec_id"], "codes": list(codes)}
            )

    coded = e.mapInPandas(encode, schema="neighbor_id long, codes array<int>")

    def adc(batches):
        import numpy as np
        import pandas as pd

        cb = seed_q.reshape(_PQ_KS, _PQ_M, _PQ_DSUB)
        for pdf in batches:
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            xq = np.floor(x * _PQ_QSCALE + 0.5).astype(np.int64)
            xs = xq.reshape(-1, _PQ_M, _PQ_DSUB)
            diff = xs[:, None, :, :] - cb[None, :, :, :]
            d = np.einsum("nkmd,nkmd->nkm", diff, diff)  # (n, KS, M)
            # flatten to M x KS row-major per query for element_at lookups
            tables = [t.T.reshape(-1) for t in d]  # (M*KS,) each
            yield pd.DataFrame(
                {"query_id": pdf["vec_id"], "adc": tables}
            )

    queries = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select("vec_id", "embedding")
        .mapInPandas(adc, schema="query_id long, adc array<long>")
    )

    # deliberate broadcast cross join: the query batch is bounded (10
    # rows) — the standard ADC scan shape (every code scans every
    # query's table), never corpus x corpus.
    scored = coded.crossJoin(F.broadcast(queries)).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # score = sum_j adc[j*KS + codes[j]] — a JVM aggregate over the
    # zipped code array; 1-based element_at.
    score = F.aggregate(
        F.sequence(F.lit(0), F.lit(_PQ_M - 1)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.element_at(
            "adc", (j * _PQ_KS + F.element_at("codes", j + 1) + 1).cast("int")
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist"), F.col("neighbor_id")
    )
    return (
        scored.select(
            "query_id", "neighbor_id", score.alias("adc_dist")
        )
        .withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
    )


def _q189_oracle(topk: int = _PQ_TOPK) -> str:
    return f"""
WITH v AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_PQ_QSCALE} + 0.5) AS BIGINT))
           AS xq
  FROM embeddings
),
seeds AS (
  SELECT xq AS sq,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cid
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PQ_KS}
),
-- per (vector, subspace, centroid) exact integer squared L2
sub AS (
  SELECT v.vec_id, s.cid, j.range AS m,
         list_sum(list_transform(range({_PQ_DSUB}), d ->
             (v.xq[CAST(j.range * {_PQ_DSUB} + d + 1 AS INTEGER)]
              - s.sq[CAST(j.range * {_PQ_DSUB} + d + 1 AS INTEGER)]) *
             (v.xq[CAST(j.range * {_PQ_DSUB} + d + 1 AS INTEGER)]
              - s.sq[CAST(j.range * {_PQ_DSUB} + d + 1 AS INTEGER)])
         )) AS dist
  FROM v CROSS JOIN seeds s CROSS JOIN range({_PQ_M}) j
),
codes AS (
  SELECT vec_id, m, cid AS code FROM (
    SELECT vec_id, m, cid,
           row_number() OVER (PARTITION BY vec_id, m
               ORDER BY dist ASC, cid ASC) AS rn
    FROM sub
  ) WHERE rn = 1
),
adc AS (
  SELECT vec_id AS query_id, m, cid, dist
  FROM sub WHERE vec_id < 10
),
scored AS (
  SELECT a.query_id, c.vec_id AS neighbor_id,
         CAST(SUM(a.dist) AS BIGINT) AS adc_dist
  FROM codes c
  JOIN adc a ON a.m = c.m AND a.cid = c.code
  WHERE c.vec_id <> a.query_id
  GROUP BY a.query_id, c.vec_id
)
SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {topk}
"""


ORACLE_Q189 = _q189_oracle()


# ---------------------------------------------------------------------------
# q190 cluster-balanced subsampling (diversity-preserving coreset)
# ---------------------------------------------------------------------------

_Q190_CAP = 8  # per-cell admission quota


def q190_cluster_balanced_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Diversity-preserving subsample: assign every embedding to its
    nearest seeded-quantizer cell (exact integer L2 on 1e4-quantized
    coordinates, centroid-id tiebreak) and admit at most _Q190_CAP
    vectors per cell, picked by smallest md5(vec_id) — a
    deterministic stand-in for uniform-within-cell sampling. The
    content-balancing step curation pipelines run so one dense
    content mode cannot dominate the curated set (cf. SemDeDup's
    cluster framing; q181/q182 quota by metadata, this quotas by
    embedding geometry). Returns (vec_id, cell_id, pick_rank).

    100 TB design: assignment is one Arrow-batched numpy distance per
    batch against the broadcast k x dim codebook (the q160/IVF
    shape); the quota is a per-cell window over k-bounded groups —
    the shuffle is keyed by cell with at most cap rows surviving per
    cell, so the output is quantizer-sized, never corpus-sized."""
    seed_q = _pq_seed_matrix(spark, sf_dir)  # (KS, 64) int64

    e = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    def assign(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            xq = np.floor(x * _PQ_QSCALE + 0.5).astype(np.int64)
            diff = xq[:, None, :] - seed_q[None, :, :]  # (n, KS, 64)
            d = np.einsum("nkd,nkd->nk", diff, diff)
            cell = d.argmin(axis=1).astype(np.int32)
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "cell_id": cell})

    assigned = e.mapInPandas(assign, schema="vec_id long, cell_id int")
    w = Window.partitionBy("cell_id").orderBy(
        F.md5(F.col("vec_id").cast("string")), F.col("vec_id")
    )
    return (
        assigned.withColumn("pick_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("pick_rank") <= _Q190_CAP)
    )


ORACLE_Q190 = f"""
WITH v AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
                        x -> CAST(floor(x * {_PQ_QSCALE} + 0.5) AS BIGINT))
           AS xq
  FROM embeddings
),
seeds AS (
  SELECT xq AS sq,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cid
  FROM v ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {_PQ_KS}
),
asg AS (
  SELECT vec_id, cid AS cell_id FROM (
    SELECT v.vec_id, s.cid,
           row_number() OVER (PARTITION BY v.vec_id ORDER BY
               list_sum(list_transform(range(64), d ->
                   (v.xq[CAST(d + 1 AS INTEGER)]
                    - s.sq[CAST(d + 1 AS INTEGER)]) *
                   (v.xq[CAST(d + 1 AS INTEGER)]
                    - s.sq[CAST(d + 1 AS INTEGER)]))) ASC,
               s.cid ASC) AS rn
    FROM v CROSS JOIN seeds s
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cell_id AS INTEGER) AS cell_id,
       CAST(pick_rank AS INTEGER) AS pick_rank
FROM (
  SELECT vec_id, cell_id,
         row_number() OVER (PARTITION BY cell_id
             ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick_rank
  FROM asg
) WHERE pick_rank <= {_Q190_CAP}
"""


QUERIES: dict[str, QuerySpec] = {
    "q187_paragraph_dedup": QuerySpec(
        q187_paragraph_dedup,
        ORACLE_Q187,
        "corpus-wide paragraph dedup report (20-token windows)",
        ("llm", "dedup", "text"),
    ),
    "q188_gopher_quality_rules": QuerySpec(
        q188_gopher_quality_rules,
        ORACLE_Q188,
        "Gopher non-repetition quality rules (words/wlen/alpha/stop)",
        ("llm", "text", "quality"),
    ),
    "q189_pq_adc_topk": QuerySpec(
        q189_pq_adc_topk,
        ORACLE_Q189,
        "product-quantization ANN: seeded codebooks + exact ADC top-k",
        ("llm", "similarity"),
    ),
    "q190_cluster_balanced_sample": QuerySpec(
        q190_cluster_balanced_sample,
        ORACLE_Q190,
        "cluster-balanced diversity subsample (per-cell quota)",
        ("llm", "similarity", "quality"),
    ),
}
