"""Round-9 LLM-pipeline additions, part 5 — targeted data selection
and corpus governance reports:

- q194: DSIR-style importance weighting (Xie et al. 2023, "Data
  Selection for Language Models via Importance Resampling"): score
  every document by the log-likelihood ratio between a TARGET
  unigram LM (here: the English slice, the domain being selected
  for) and the SOURCE LM (the whole corpus), with add-one smoothing
  so out-of-target tokens stay defined. Per-vocab-entry quantization
  (the q185 discipline) keeps per-doc sums exact integers.
- q195: near-dup cluster-size histogram — the dedup yield report:
  how many clusters of each size the MinHash-LSH graph contains and
  how many tokens a keep-one-representative pass would reclaim,
  computed from q71's connected components.
- q196: the per-source dataset card — docs, tokens, language count,
  corpus-wide exact-dup rate, and Gopher-bound failure rate per
  source, in one governance aggregate (the "datasheet" every
  curation pipeline publishes per crawl).

Beyond-reference surface (the reference's four Glue scripts are
boto3 orchestration; Glue_Scripts/Patient_datamart.py:1-120).
Public knowledge only: citations above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q194 DSIR importance weighting (target vs source unigram LM)
# ---------------------------------------------------------------------------


def q194_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Importance score per doc: mean over tokens of
    nll_source - nll_target, where the target LM is the English
    slice's add-one-smoothed unigram distribution (smoothing
    denominator: target total + SOURCE vocab size, so every source
    token has defined target mass) and the source LM is the whole
    corpus's unsmoothed distribution. Positive scores mark documents
    that look more like the target domain than the corpus average —
    DSIR admits from the top. Both nll tables are quantized ONCE per
    DISTINCT vocabulary entry (round 6 dp -> micro int), so per-doc
    sums are exact integer arithmetic. Returns (doc_id, n_tokens,
    logratio_micro_mean, bucket) with bucket = mean div 250000 — the
    resampling stratum, no global sort or window.

    Scale: token explode -> two vocab-sized aggregates (map-side
    combined) -> two 1-row totals broadcast back -> one BROADCAST
    join of the vocab nll table to the token stream (Heaps' law keeps
    vocab dim-sized) -> per-doc aggregate on the doc_id shuffle.
    Same 100 TB shape as q185; the second LM adds one narrow
    aggregate, not a second corpus scan of text."""
    d = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = d.select(
        "doc_id", "lang", F.explode(T.tokens("text")).alias("t")
    )
    # BOTH LMs from one vocab pass: a conditional aggregate gives the
    # target counts alongside the source counts (one explode + one
    # shuffle instead of two of each — the plan audit showed the
    # two-aggregate form re-scanning and re-splitting the corpus)
    vocab = tok.groupBy("t").agg(
        F.count("*").cast("long").alias("c_src"),
        F.sum((F.col("lang") == "en").cast("long"))
        .cast("long")
        .alias("c_tgt"),
    ).localCheckpoint()
    # ^ vocab-dim; consumed by totals AND the nll build — checkpoint
    # so the corpus explode behind it runs once (r15, guide §1.2)
    totals = vocab.agg(
        F.sum("c_src").cast("double").alias("_n_src"),
        F.count("*").cast("double").alias("_v_src"),
        F.sum("c_tgt").cast("double").alias("_n_tgt"),
    )
    nll = vocab.crossJoin(F.broadcast(totals)).select(
        "t",
        (
            F.floor(
                F.round(
                    -F.log(F.col("c_src") / F.col("_n_src"))
                    + F.log(
                        (F.col("c_tgt") + 1)
                        / (F.col("_n_tgt") + F.col("_v_src"))
                    ),
                    6,
                )
                * MICRO
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("lr_micro"),
    )
    return (
        tok.join(F.broadcast(nll), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr("sum(lr_micro) div count(*)").alias(
                "logratio_micro_mean"
            ),
        )
        .withColumn(
            "bucket",
            F.expr(
                "cast(floor(logratio_micro_mean / 250000.0) as int)"
            ),
        )
    )


ORACLE_Q194 = f"""
WITH tok AS (
  SELECT doc_id, lang,
         UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
src AS (SELECT t, count(*) AS c_src FROM tok GROUP BY t),
tgt AS (SELECT t, count(*) AS c_tgt FROM tok WHERE lang = 'en' GROUP BY t),
tot AS (
  SELECT (SELECT SUM(c_src) FROM src) AS n_src,
         (SELECT COUNT(*) FROM src) AS v_src,
         (SELECT COALESCE(SUM(c_tgt), 0) FROM tgt) AS n_tgt
),
nll AS (
  SELECT s.t,
         CAST(floor(round(
             -ln(s.c_src / CAST(tot.n_src AS DOUBLE))
             + ln((COALESCE(g.c_tgt, 0) + 1)
                  / (CAST(tot.n_tgt AS DOUBLE) + tot.v_src)), 6)
           * {MICRO} + 0.5) AS BIGINT) AS lr_micro
  FROM src s LEFT JOIN tgt g USING (t) CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(lr_micro) // count(*) AS BIGINT) AS logratio_micro_mean,
       CAST(floor((SUM(lr_micro) // count(*)) / 250000.0) AS INTEGER)
         AS bucket
FROM tok JOIN nll USING (t)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q195 near-dup cluster-size histogram (dedup yield report)
# ---------------------------------------------------------------------------


def q195_dup_cluster_histogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dedup yield forecast: connected components over the
    MinHash-LSH candidate graph (q71's certified machinery), then
    per cluster-size: how many clusters, how many docs they hold,
    and how many whitespace tokens a keep-smallest-doc_id
    representative pass would reclaim. The report a curation run
    reads before committing to a dedup pass ("is the graph a few
    huge boilerplate clusters or many pairs?").

    Scale: the candidate graph and components are the certified q33/
    q71 shapes (banded LSH, iterative min-label propagation with
    localCheckpoint); everything after is cluster-sized — one join
    to per-doc token counts, two narrow aggregates. Singleton docs
    never enter the graph and are correctly absent (a dedup pass
    would not touch them)."""
    from synthea_etl_spark.plans.llm import q33_minhash_lsh_candidates

    pairs = q33_minhash_lsh_candidates(spark, sf_dir)
    comp = D.connected_components(pairs)  # (id, cluster_id)
    ntok = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("id"),
        F.size(T.tokens("text")).cast("long").alias("ntok"),
    )
    per_cluster = (
        comp.join(ntok, "id")
        .groupBy("cluster_id")
        .agg(
            F.count("*").cast("long").alias("size"),
            F.sum("ntok").cast("long").alias("tok_total"),
            # representative = smallest doc_id = the cluster_id label
            # itself under q71's min-label convention
            F.sum(
                F.when(F.col("id") == F.col("cluster_id"), F.col("ntok"))
                .otherwise(F.lit(0))
            )
            .cast("long")
            .alias("tok_kept"),
        )
    )
    return per_cluster.groupBy("size").agg(
        F.count("*").cast("long").alias("n_clusters"),
        (F.count("*") * F.col("size")).cast("long").alias("n_docs"),
        F.sum(F.col("tok_total") - F.col("tok_kept"))
        .cast("long")
        .alias("tokens_removable"),
    )


def _q195_oracle() -> str:
    from synthea_etl_spark.plans.llm import _sql_clusters_oracle

    clusters = _sql_clusters_oracle().strip()
    # _sql_clusters_oracle is a full statement starting WITH RECURSIVE;
    # splice its CTE list into ours.
    body = clusters[len("WITH RECURSIVE") :].strip()
    head, final = body.rsplit("SELECT id, MIN(label) AS cluster_id", 1)
    return f"""
WITH RECURSIVE {head},
comp AS (
  SELECT id, MIN(label) AS cluster_id {final}
),
ntok AS (
  SELECT doc_id AS id,
         len(string_split_regex(trim(text), '\\s+')) AS ntok
  FROM documents WHERE length(trim(text)) > 0
),
per_cluster AS (
  SELECT cluster_id, count(*) AS size, SUM(ntok) AS tok_total,
         SUM(CASE WHEN id = cluster_id THEN ntok ELSE 0 END) AS tok_kept
  FROM comp JOIN ntok USING (id)
  GROUP BY cluster_id
)
SELECT CAST(size AS BIGINT) AS size,
       CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(count(*) * size AS BIGINT) AS n_docs,
       CAST(SUM(tok_total - tok_kept) AS BIGINT) AS tokens_removable
FROM per_cluster
GROUP BY size
"""


# ---------------------------------------------------------------------------
# q196 per-source dataset card
# ---------------------------------------------------------------------------

from synthea_etl_spark.plans.llm7 import (  # noqa: E402
    _MAX_WLEN,
    _MAX_WORDS,
    _MIN_ALPHA,
    _MIN_STOP,
    _MIN_WLEN,
    _MIN_WORDS,
)


def q196_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source datasheet: documents, whitespace tokens,
    distinct languages, corpus-wide exact-duplicate rate (micro),
    and Gopher-bound failure rate (micro) for every source. One
    governance aggregate answering "which crawls are worth their
    storage?" before mixture weighting.

    Scale: the duplicate flag is the q30 fingerprint shuffle (count
    per fp, joined back — 16-byte keys); the quality flags are the
    q188 zero-shuffle lambdas; the card itself is a source-sized
    groupBy. No text ever moves through a shuffle."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", "text"
    )
    # narrow (doc_id, 16-byte fp) proxy; consumed by fpc AND the
    # dup join — checkpoint so the corpus fingerprint pass runs
    # once (r15, guide §1.2, §8)
    fp = d.select(
        "doc_id", T.fingerprint("text").alias("fp")
    ).localCheckpoint()
    fpc = fp.groupBy("fp").agg(F.count("*").alias("_nfp"))
    dup = fp.join(fpc, "fp").select(
        "doc_id", (F.col("_nfp") > 1).alias("_dup")
    )
    sig = d.select(
        "doc_id",
        "source",
        "lang",
        F.size(T.tokens("text")).cast("long").alias("_nw"),
        (~T.gopher_quality_ok("text")).alias("_q_fail"),
    )
    joined = sig.join(dup, "doc_id")
    return joined.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_nw").cast("long").alias("n_tokens"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.expr(
            f"sum(cast(_dup as long)) * {MICRO} div count(*)"
        ).alias("dup_rate_micro"),
        F.expr(
            f"sum(cast(_q_fail as long)) * {MICRO} div count(*)"
        ).alias("quality_fail_micro"),
    )


ORACLE_Q196 = f"""
WITH fp AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
fpc AS (SELECT fp, count(*) AS nfp FROM fp GROUP BY fp),
dup AS (
  SELECT doc_id, nfp > 1 AS is_dup FROM fp JOIN fpc USING (fp)
),
sig AS (
  SELECT doc_id, source, lang,
         len(w) AS nw, GREATEST(len(w), 1) AS nn,
         COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS sl,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS na,
         len(list_filter(w, x -> list_contains(
             ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x))) AS ns
  FROM (
    SELECT doc_id, source, lang,
           CASE WHEN length(trim(text)) = 0 THEN []
                ELSE string_split_regex(trim(text), '\\s+') END AS w
    FROM documents
  )
),
flags AS (
  SELECT s.doc_id, s.source, s.lang, s.nw,
         NOT (nw >= {_MIN_WORDS} AND nw <= {_MAX_WORDS}
              AND sl * {MICRO} // nn >= {_MIN_WLEN}
              AND sl * {MICRO} // nn <= {_MAX_WLEN}
              AND na * {MICRO} // nn >= {_MIN_ALPHA}
              AND ns >= {_MIN_STOP}) AS q_fail,
         d.is_dup
  FROM sig s JOIN dup d USING (doc_id)
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(nw) AS BIGINT) AS n_tokens,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) * {MICRO} // count(*)
         AS BIGINT) AS dup_rate_micro,
       CAST(SUM(CASE WHEN q_fail THEN 1 ELSE 0 END) * {MICRO} // count(*)
         AS BIGINT) AS quality_fail_micro
FROM flags
GROUP BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "q194_dsir_importance": QuerySpec(
        q194_dsir_importance,
        ORACLE_Q194,
        "DSIR importance weights: target-vs-source unigram LM ratio",
        ("llm", "text", "quality"),
    ),
    "q195_dup_cluster_histogram": QuerySpec(
        q195_dup_cluster_histogram,
        _q195_oracle(),
        "near-dup cluster-size histogram with reclaimable tokens",
        ("llm", "dedup"),
    ),
    "q196_dataset_card": QuerySpec(
        q196_dataset_card,
        ORACLE_Q196,
        "per-source datasheet: docs/tokens/langs/dup/quality rates",
        ("llm", "text", "quality"),
    ),
}
