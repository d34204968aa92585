"""Round-13 LLM-pipeline queries, batch 7: retrieval training data,
storage-level dedup, and uncertainty for corpus metrics.

- q252 hard-negative mining: the BM25 top-k for each training query
  minus the gold document AND minus exact dups of the gold (the
  classic false-negative trap), with the score margin to gold and a
  near-tie flag — the table a dense-retriever trainer (DPR,
  Karpukhin et al. 2020) consumes, with RocketQA-style (Qu et al.
  2021) denoising of negatives that score suspiciously close to
  gold.
- q253 content-defined chunk dedup: token-grain CDC (boundary
  wherever the hash of the trailing 3-gram ≡ 0 mod 8 — the
  stateless form of LBFS/FastCDC chunking, Muthitacharoen et al.
  2001 / Xia et al. 2016) and the storage-dedup report it exists
  for: per source, how many chunk-tokens are byte-identical to a
  chunk seen earlier anywhere in the corpus. The defining CDC
  property — an edit near the head does not move chunk boundaries
  in the tail (boundaries depend only on local content) — is pinned
  in tests.
- q254 Poisson-bootstrap confidence interval for a corpus metric
  (the per-token classifier margin of q161): every doc gets an
  md5-seeded Poisson(1) multiplicity per replicate, per-replicate
  ratios are exact int64, and the 2.5/97.5 percentile replicates
  bound the estimate — the one-pass bootstrap for massive data
  (Chamandy et al. 2012), which never resamples rows, only weights.

Reference scope: beyond-reference extension surface; methods public
(Karpukhin et al. 2020; Qu et al. 2021; Muthitacharoen et al. 2001;
Xia et al. 2016; Chamandy et al. 2012).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm3 import _sql_bm25_oracle

MICRO = 1_000_000

# q252: negatives with margin-to-gold below this are flagged as
# probable false negatives (RocketQA's denoising rule)
_NEAR_TIE_MICRO = 50_000

# q253 chunking geometry: boundary when the 3-gram hash ≡ 0 mod 8
# (expected chunk length 8 tokens; no min/max clamp — the stateless
# relational form)
_CDC_DIV = 8
_CDC_GRAM = 3

# q254 bootstrap: 100 replicates; adaptive percentile ranks
# ceil(0.025*R_eff)/ceil(0.975*R_eff) over the replicates that drew a
# nonzero total weight (3/98 when all 100 survive — the usual case);
# Poisson(1) pmf cumulative in 1e-4 units: P(0)=.3679, P(<=1)=.7358,
# P(<=2)=.9197, P(<=3)=.9810, else 4 copies
_BOOT_R = 100
_POIS_CUM = (3679, 7358, 9197, 9810)


# ---------------------------------------------------------------------------
# q252 hard-negative mining
# ---------------------------------------------------------------------------

def q252_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard negatives for retriever training from the certified BM25
    stack (q162's queries = docs 0-2, top-5): drop the gold document
    and every exact dup of the gold's text (same fingerprint — a
    'negative' that is literally the positive), rank the survivors,
    compute each one's score margin to gold, and flag near-ties
    (margin < 0.05) as probable false negatives to be denoised away
    before training.

    100 TB shape: rides bm25_topk's audited plan (postings + one
    broadcast of the query-term frame + window top-k); everything
    added here is query-grain — the gold frame is one row per query
    (broadcast), the fingerprint anti-filter probes the (doc_id, fp)
    projection with a doc_id-keyed join against the k-row result,
    never the corpus."""
    from synthea_etl_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"),
    )
    # r15 optimization (guide §1.2): `res` feeds both the gold slice
    # and the negatives join, so without a materialization barrier
    # the whole BM25 stack (postings build + top-k window) planned
    # and ran TWICE. The frame is k x queries rows (15 here) —
    # checkpoint it once and both consumers read the tiny RDD.
    res = bm25_topk(docs, queries, k=5).localCheckpoint()
    fp = docs.select("doc_id", T.fingerprint("text").alias("_fp"))
    qfp = fp.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("_fp").alias("_qfp")
    )
    gold = res.filter(F.col("doc_id") == F.col("query_id")).select(
        "query_id", F.col("score").alias("_gold_score")
    )
    neg = (
        res.join(fp, "doc_id")
        .join(F.broadcast(qfp), "query_id")
        .filter(F.col("_fp") != F.col("_qfp"))
        .join(F.broadcast(gold), "query_id")
    )
    margin = F.floor(
        F.round(F.col("_gold_score") - F.col("score"), 6) * MICRO
        + F.lit(0.5)
    ).cast("long")
    w = Window.partitionBy("query_id").orderBy("rank")
    return neg.select(
        "query_id",
        "doc_id",
        F.row_number().over(w).cast("int").alias("neg_rank"),
        "score",
        margin.alias("margin_micro"),
        (margin < _NEAR_TIE_MICRO).alias("near_tie"),
    )


def _oracle_q252() -> str:
    return f"""
WITH res AS ({_sql_bm25_oracle()}),
fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
gold AS (
  SELECT query_id, score AS gold_score FROM res
  WHERE doc_id = query_id
),
neg AS (
  SELECT r.query_id, r.doc_id, r.rank, r.score,
         CAST(floor(round(g.gold_score - r.score, 6) * {MICRO} + 0.5)
              AS BIGINT) AS margin_micro
  FROM res r
  JOIN fp d ON d.doc_id = r.doc_id
  JOIN fp q ON q.doc_id = r.query_id
  JOIN gold g ON g.query_id = r.query_id
  WHERE d.fp <> q.fp
)
SELECT query_id, doc_id,
       CAST(row_number() OVER (PARTITION BY query_id ORDER BY rank)
            AS INTEGER) AS neg_rank,
       score, margin_micro,
       margin_micro < {_NEAR_TIE_MICRO} AS near_tie
FROM neg
"""


# ---------------------------------------------------------------------------
# q253 content-defined chunk dedup
# ---------------------------------------------------------------------------

def q253_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-level dedup report via token-grain content-defined
    chunking: cut after any token whose trailing 3-gram hashes to
    0 mod 8, fingerprint each chunk, and report per source the
    chunk count, tokens, how many chunks (and chunk-tokens) are
    byte-identical to a chunk that appeared EARLIER in (doc_id,
    chunk_idx) order anywhere in the corpus, the mean chunk length,
    and the dedup savings ratio. Because boundaries depend only on
    the local 3-gram, an edit near a doc's head never shifts tail
    chunks — shared suffixes dedup even across unaligned copies
    (the CDC property fixed-size blocking lacks).

    100 TB shape: chunk construction is ZERO-shuffle — boundary
    positions, chunk spans, and chunk texts are all array lambdas on
    the token array (filter/zip_with/slice), exploded once at chunk
    grain; then ONE fingerprint-keyed window pass (the q244 span-
    axis shape) and a source-sized aggregate. No (doc, token) grain
    ever shuffles."""
    from synthea_etl_spark.operators.util import rebalance_by_key

    d = (
        rebalance_by_key(
            load(spark, sf_dir, "documents").filter(
                F.length(F.trim("text")) > 0
            ),
            "doc_id",
        )
        .select("doc_id", "source", T.tokens("text").alias("_w"))
        # per-TOKEN hash ints, hoisted: n short-string md5s per doc.
        # The boundary then combines the trailing 3 by a rolling
        # polynomial — the gear-CDC structure (per-unit table lookup
        # + window combine). The first cut md5'd the concatenated
        # 3-gram at every position: 3x the hashed bytes plus a
        # slice+concat allocation per position (sf1 ladder: 14.7 s
        # inline-twice -> 10.1 s hoisted -> 5.4 s per-token-hash ->
        # 1.1 s once rebalance_by_key lifts the 2-partition scan to
        # full parallelism)
        .withColumn(
            "_h",
            F.expr(
                "transform(_w, t -> CAST(conv(substring(md5(t), 1, 8),"
                " 16, 10) AS BIGINT))"
            ),
        )
    )
    hv = (
        "element_at(_h, i - 2) * 961 + element_at(_h, i - 1) * 31"
        " + element_at(_h, i)"
    )
    # guard: sequence(1, n) then i >= GRAM (a bare sequence(GRAM, n)
    # DESCENDS when n < GRAM in Spark — short docs must yield zero
    # boundaries, one whole-doc chunk). The boundary list is HOISTED
    # to a column: it feeds both the start and the end list.
    bpos = (
        f"filter(sequence(1, size(_w)),"
        f" i -> i >= {_CDC_GRAM} AND ({hv}) % {_CDC_DIV} = 0)"
    )
    chunks_expr = """
transform(
  zip_with(
    concat(array(CAST(1 AS INT)), transform(_bp, p -> CAST(p + 1 AS INT))),
    concat(transform(_bp, p -> CAST(p AS INT)),
           array(CAST(size(_w) AS INT))),
    (s, e) -> struct(s AS s, e - s + 1 AS n)),
  c -> struct(concat_ws(' ', slice(_w, c.s, c.n)) AS txt, c.n AS n))
"""
    # a trailing boundary at the last token yields an empty final
    # span (start = size+1, n = 0) — dropped by the n > 0 filter
    chunked = (
        d.withColumn("_bp", F.expr(bpos))
        .select(
            "doc_id",
            "source",
            F.posexplode(F.expr(chunks_expr)).alias("ci", "c"),
        )
        .filter(F.col("c.n") > 0)
        .select(
            "doc_id",
            "source",
            "ci",
            F.md5(F.col("c.txt")).alias("_cfp"),
            F.col("c.n").cast("long").alias("_ctok"),
        )
    )
    wfp = Window.partitionBy("_cfp").orderBy("doc_id", "ci")
    flagged = chunked.select(
        "source",
        "_ctok",
        (F.row_number().over(wfp) > 1).alias("_dup"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_chunks"),
        F.sum(F.col("_dup").cast("long")).cast("long").alias("n_dup_chunks"),
        F.sum("_ctok").cast("long").alias("chunk_tokens"),
        F.sum(F.when(F.col("_dup"), F.col("_ctok")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_chunk_tokens"),
        F.expr(f"sum(_ctok) * {MICRO} div count(*)").alias(
            "mean_chunk_tokens_micro"
        ),
        F.expr(
            f"sum(CASE WHEN _dup THEN _ctok ELSE 0 END) * {MICRO}"
            f" div sum(_ctok)"
        ).alias("dedup_savings_micro"),
    )


def _oracle_q253() -> str:
    hv = "h[i - 2] * 961 + h[i - 1] * 31 + h[i]"
    return f"""
WITH t AS (
  SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
hashed AS (
  SELECT doc_id, source, w,
         list_transform(w, tk -> CAST(concat('0x',
             substr(md5(tk), 1, 8)) AS BIGINT)) AS h
  FROM t
),
spans AS (
  SELECT doc_id, source, w,
         list_concat([1], list_transform(
           list_filter(generate_series({_CDC_GRAM}, len(w)),
                       i -> ({hv}) % {_CDC_DIV} = 0),
           p -> p + 1)) AS starts,
         list_concat(
           list_filter(generate_series({_CDC_GRAM}, len(w)),
                       i -> ({hv}) % {_CDC_DIV} = 0),
           [len(w)]) AS ends
  FROM hashed
),
chunked AS (
  SELECT doc_id, source, ci,
         md5(array_to_string(w[starts[ci + 1]:ends[ci + 1]], ' '))
           AS cfp,
         CAST(ends[ci + 1] - starts[ci + 1] + 1 AS BIGINT) AS ctok
  FROM spans,
       LATERAL (SELECT UNNEST(generate_series(0, len(starts) - 1)) AS ci) u
  WHERE ends[ci + 1] - starts[ci + 1] + 1 > 0
),
flagged AS (
  SELECT source, ctok,
         row_number() OVER (PARTITION BY cfp ORDER BY doc_id, ci) > 1
           AS dup
  FROM chunked
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(SUM(ctok) AS BIGINT) AS chunk_tokens,
       CAST(SUM(CASE WHEN dup THEN ctok ELSE 0 END) AS BIGINT)
         AS dup_chunk_tokens,
       CAST(SUM(ctok) * {MICRO} // COUNT(*) AS BIGINT)
         AS mean_chunk_tokens_micro,
       CAST(SUM(CASE WHEN dup THEN ctok ELSE 0 END) * {MICRO}
            // SUM(ctok) AS BIGINT) AS dedup_savings_micro
FROM flagged GROUP BY source
"""


# ---------------------------------------------------------------------------
# q254 Poisson-bootstrap CI
# ---------------------------------------------------------------------------

def q254_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% Poisson-bootstrap confidence interval for the corpus-mean
    per-token classifier margin (q161's metric): each (doc,
    replicate) draws an md5-seeded Poisson(1) multiplicity, each
    replicate's ratio-of-sums is exact int64 (offset by +1 margin
    unit so the integer division never sees a negative numerator —
    Spark's ``div`` truncates toward zero while DuckDB's ``//``
    floors, and they only agree on non-negatives), and the interval
    is the 2.5th/97.5th percentile replicate. One output row:
    estimate + bounds + width.

    100 TB shape: the corpus is read ONCE (the q161 per-doc frame);
    the x100 replicate explode happens at DOC grain and collapses
    map-side (groupBy(rep) partial aggregation → 100 rows per
    partition cross the shuffle, not 100 x docs); the percentile
    window runs on a 100-row frame. This is why Poisson bootstrap —
    not resampling — is THE bootstrap for massive data: weights,
    never copies."""
    from synthea_etl_spark.operators.retrieval import quality_model_score

    base = quality_model_score(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    ).select("doc_id", "n_tokens", "raw_margin")
    c = _POIS_CUM
    mult = (
        f"CASE WHEN _hv < {c[0]} THEN 0 WHEN _hv < {c[1]} THEN 1"
        f" WHEN _hv < {c[2]} THEN 2 WHEN _hv < {c[3]} THEN 3 ELSE 4 END"
    )
    reps = (
        base.select(
            "doc_id",
            "n_tokens",
            "raw_margin",
            F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias(
                "rep"
            ),
        )
        .withColumn(
            "_hv",
            F.expr(
                "CAST(conv(substring(md5(concat('bs', CAST(doc_id AS"
                " STRING), ':', CAST(rep AS STRING))), 1, 8), 16, 10)"
                " AS BIGINT) % 10000"
            ),
        )
        .withColumn("_m", F.expr(mult).cast("long"))
        .groupBy("rep")
        .agg(
            F.sum(F.col("_m") * F.col("raw_margin"))
            .cast("long")
            .alias("_sm"),
            F.sum(F.col("_m") * F.col("n_tokens"))
            .cast("long")
            .alias("_st"),
        )
        # a replicate that drew all-zero Poisson weights has _st = 0
        # and no defined ratio; drop it (q256's guard) — else the
        # null est_micro ranks differently in Spark (NULLS FIRST)
        # vs DuckDB (NULLS LAST). P(all-zero) = e^-n_docs, so ranks
        # below are ADAPTIVE over the surviving replicate count.
        .filter(F.col("_st") > 0)
        # offset by one margin unit (raw_margin is in [-1000, 1000]
        # per token): numerator >= 0, so div == floor-div
        .select(
            "rep",
            F.expr(
                f"(_sm + 1000 * _st) * {MICRO} div (1000 * _st)"
                f" - {MICRO}"
            ).alias("est_micro"),
        )
    )
    point = (
        base.agg(
            F.sum("raw_margin").cast("long").alias("_sm"),
            F.sum("n_tokens").cast("long").alias("_st"),
        ).select(
            F.expr(
                f"(_sm + 1000 * _st) * {MICRO} div (1000 * _st)"
                f" - {MICRO}"
            ).alias("estimate_micro")
        )
    )
    w = Window.orderBy("est_micro", "rep")
    wc = Window.partitionBy()
    ranked = reps.select(
        "est_micro",
        F.row_number().over(w).alias("_rn"),
        F.count("*").over(wc).alias("_reff"),
    )
    bounds = ranked.agg(
        F.min(
            F.when(
                F.col("_rn") == F.expr("(25 * _reff + 999) div 1000"),
                F.col("est_micro"),
            )
        ).alias("lo_micro"),
        F.min(
            F.when(
                F.col("_rn") == F.expr("(975 * _reff + 999) div 1000"),
                F.col("est_micro"),
            )
        ).alias("hi_micro"),
        F.count("*").cast("long").alias("n_replicates"),
    )
    return point.crossJoin(F.broadcast(bounds)).select(
        "n_replicates",
        "estimate_micro",
        "lo_micro",
        "hi_micro",
        (F.col("hi_micro") - F.col("lo_micro")).alias("width_micro"),
    )


def _oracle_q254() -> str:
    c = _POIS_CUM
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT doc_id, UNNEST(w) AS t FROM toks),
wt AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w' || CAST(
             CAST(concat('0x', substr(md5('q' || t), 1, 8)) AS BIGINT)
               % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w
  FROM tok
),
base AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w) AS BIGINT) AS raw_margin
  FROM wt GROUP BY doc_id
),
reps AS (
  SELECT doc_id, n_tokens, raw_margin, rep,
         CAST(concat('0x', substr(md5('bs' || doc_id || ':' || rep),
              1, 8)) AS BIGINT) % 10000 AS hv
  FROM base,
       LATERAL (SELECT UNNEST(generate_series(0, {_BOOT_R - 1})) AS rep) u
),
mrep AS (
  SELECT rep,
         CAST(SUM(CASE WHEN hv < {c[0]} THEN 0 WHEN hv < {c[1]} THEN 1
                       WHEN hv < {c[2]} THEN 2 WHEN hv < {c[3]} THEN 3
                       ELSE 4 END * raw_margin) AS BIGINT) AS sm,
         CAST(SUM(CASE WHEN hv < {c[0]} THEN 0 WHEN hv < {c[1]} THEN 1
                       WHEN hv < {c[2]} THEN 2 WHEN hv < {c[3]} THEN 3
                       ELSE 4 END * n_tokens) AS BIGINT) AS st
  FROM reps GROUP BY rep
  HAVING st > 0
),
ests AS (
  SELECT rep,
         CAST((sm + 1000 * st) * {MICRO} // (1000 * st) - {MICRO}
              AS BIGINT) AS est_micro
  FROM mrep
),
ranked AS (
  SELECT est_micro,
         row_number() OVER (ORDER BY est_micro, rep) AS rn,
         COUNT(*) OVER () AS reff
  FROM ests
),
bounds AS (
  SELECT MIN(CASE WHEN rn = (25 * reff + 999) // 1000 THEN est_micro END)
           AS lo_micro,
         MIN(CASE WHEN rn = (975 * reff + 999) // 1000 THEN est_micro END)
           AS hi_micro,
         CAST(COUNT(*) AS BIGINT) AS n_replicates
  FROM ranked
),
point AS (
  SELECT CAST((SUM(raw_margin) + 1000 * SUM(n_tokens)) * {MICRO}
              // (1000 * SUM(n_tokens)) - {MICRO} AS BIGINT)
           AS estimate_micro
  FROM base
)
SELECT n_replicates, estimate_micro, lo_micro, hi_micro,
       CAST(hi_micro - lo_micro AS BIGINT) AS width_micro
FROM point CROSS JOIN bounds
"""


QUERIES: dict[str, QuerySpec] = {
    "q252_hard_negatives": QuerySpec(
        q252_hard_negatives,
        _oracle_q252(),
        "BM25 hard negatives minus gold dups, with margin-to-gold"
        " and near-tie denoising flags",
        ("llm", "retrieval"),
    ),
    "q253_cdc_chunk_dedup": QuerySpec(
        q253_cdc_chunk_dedup,
        _oracle_q253(),
        "token-grain content-defined chunking + storage dedup"
        " savings per source",
        ("llm", "dedup"),
    ),
    "q254_bootstrap_ci": QuerySpec(
        q254_bootstrap_ci,
        _oracle_q254(),
        "Poisson-bootstrap 95% CI for the corpus-mean classifier"
        " margin",
        ("llm", "quality", "governance"),
    ),
}
