"""Round-9 LLM-pipeline additions, part 2 — corpus quality and
governance reports:

- q184: Gopher-style repetition filter — per-doc character-coverage
  fractions of the dominant word 2-/3-gram and of duplicated
  5-grams, with the published drop thresholds (Rae et al. 2021,
  "Scaling Language Models: ... Gopher", table A1: top-2-gram 0.20,
  top-3-gram 0.18, duplicate-5-gram 0.15). Extends q79 (which
  reports the top-2-gram count fraction alone) to the composite
  keep/drop decision, in exact integer micro-units.
- q185: unigram-LM negative-log-likelihood quality score — the
  CCNet-style (Wenzek et al. 2020) "perplexity bucket" filter with
  the LM trained on the corpus itself: per-token nll quantized once
  per DISTINCT vocabulary entry, so per-doc sums are exact integer
  arithmetic (order-independent → hash-gated, not tolerance-gated).
- q186: pairwise source-overlap matrix — every source pair's
  bottom-k Jaccard estimate (q176/q178's sketch machinery widened
  from one pair to the full S×S governance report) computed from
  per-source sketches, never from doc×doc comparison.

Beyond-reference surface (the reference's four Glue scripts have no
text-quality engine; see SURVEY.md §2 note and Glue_Scripts/
Patient_datamart.py:1-120 for the reference's actual scope). Public
knowledge only: Gopher/CCNet citations above, bottom-k sketch
citations in operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q184 Gopher repetition filter (top-2/3-gram + duplicate-5-gram coverage)
# ---------------------------------------------------------------------------

# Rae et al. 2021 table A1 drop thresholds, in micro-units.
_TOP2_MAX = 200_000  # >20% of chars in one 2-gram -> drop
_TOP3_MAX = 180_000  # >18% in one 3-gram
_DUP5_MAX = 150_000  # >15% of chars inside duplicated 5-grams


def q184_gopher_repetition_filter(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Composite Gopher repetition rule per doc (docs with >= 5
    tokens; shorter docs cannot repeat a 5-gram and are trivially
    clean): char-coverage fraction of the dominant 2-gram and
    3-gram, char-coverage fraction of ALL duplicated 5-grams
    (occurrences x gram length, the standard over-count when
    occurrences overlap -- capped at 1.0), and the keep flag
    applying the published thresholds. All fractions are integer
    micro-units: cov * 1e6 div chars -- exact on any engine.

    Scale: per-doc signals need no cross-doc state, so the covs come
    from the single-Arrow-pass dict-counting operator
    (text.gopher_repetition_covs) — no gram-stream shuffles at all;
    the first implementation's three explode->aggregate legs pushed
    3x the corpus tokens through the wire and ran 3x slower at sf1.
    The thresholds stay JVM-side expressions."""
    covs = T.gopher_repetition_covs(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    )
    frac = lambda cov: F.least(  # noqa: E731
        F.lit(MICRO).cast("long"),
        F.expr(f"{cov} * {MICRO} div chars"),
    )
    out = covs.select(
        "doc_id",
        frac("cov2").alias("top2_frac_micro"),
        frac("cov3").alias("top3_frac_micro"),
        frac("cov5").alias("dup5_frac_micro"),
    )
    return out.withColumn(
        "keep",
        (F.col("top2_frac_micro") <= _TOP2_MAX)
        & (F.col("top3_frac_micro") <= _TOP3_MAX)
        & (F.col("dup5_frac_micro") <= _DUP5_MAX),
    )


ORACLE_Q184 = f"""
WITH d AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w,
         length(trim(text)) AS chars
  FROM documents
  WHERE len(string_split_regex(trim(text), '\\s+')) >= 5
),
g2 AS (
  SELECT doc_id, chars,
         array_to_string(w[i:i+1], ' ') AS g
  FROM d, UNNEST(range(1, len(w))) AS t(i)
),
g3 AS (
  SELECT doc_id, chars, array_to_string(w[i:i+2], ' ') AS g
  FROM d, UNNEST(range(1, len(w) - 1)) AS t(i)
),
g5 AS (
  SELECT doc_id, chars, array_to_string(w[i:i+4], ' ') AS g
  FROM d, UNNEST(range(1, len(w) - 3)) AS t(i)
),
cov2 AS (
  SELECT doc_id, MAX(c * length(g)) AS cov FROM (
    SELECT doc_id, g, count(*) AS c, any_value(chars) AS chars
    FROM g2 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
cov3 AS (
  SELECT doc_id, MAX(c * length(g)) AS cov FROM (
    SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
  ) GROUP BY doc_id
),
cov5 AS (
  SELECT doc_id, SUM(c * length(g)) AS cov FROM (
    SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g
  ) WHERE c > 1 GROUP BY doc_id
),
fr AS (
  SELECT d.doc_id,
         LEAST({MICRO}, COALESCE(cov2.cov, 0) * {MICRO} // chars)
           AS top2_frac_micro,
         LEAST({MICRO}, COALESCE(cov3.cov, 0) * {MICRO} // chars)
           AS top3_frac_micro,
         LEAST({MICRO}, COALESCE(cov5.cov, 0) * {MICRO} // chars)
           AS dup5_frac_micro
  FROM d
  JOIN cov2 USING (doc_id)
  JOIN cov3 USING (doc_id)
  LEFT JOIN cov5 USING (doc_id)
)
SELECT doc_id,
       CAST(top2_frac_micro AS BIGINT) AS top2_frac_micro,
       CAST(top3_frac_micro AS BIGINT) AS top3_frac_micro,
       CAST(dup5_frac_micro AS BIGINT) AS dup5_frac_micro,
       top2_frac_micro <= {_TOP2_MAX}
         AND top3_frac_micro <= {_TOP3_MAX}
         AND dup5_frac_micro <= {_DUP5_MAX} AS keep
FROM fr
"""


# ---------------------------------------------------------------------------
# q185 unigram-LM nll quality score (CCNet-style perplexity bucketing)
# ---------------------------------------------------------------------------

_PPL_BUCKET_MICRO = 500_000  # CCNet splits the corpus into ppl thirds;
# fixed-width nll buckets keep the gate closed-form


def q185_unigram_nll_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM quality score, the in-container stand-in for
    CCNet's KenLM perplexity filter (Wenzek et al., LREC 2020): the
    LM is the corpus's own unigram distribution, a doc's score is
    its mean per-token negative log-likelihood. Each DISTINCT
    vocabulary token's nll is quantized ONCE (round to 6 dp, then
    micro-int), so every per-doc sum is integer arithmetic --
    order-independent and hash-gated despite the ln() inside.
    Returns (doc_id, n_tokens, nll_micro_mean, ppl_bucket).

    Scale: token explode -> vocab aggregate (vocab-sized, one
    shuffle with map-side combine) -> 1-row total crossJoined back
    (broadcast) -> vocab nll BROADCAST-joined to the token stream
    (vocab is dim-sized by Heaps' law) -> per-doc aggregate on the
    doc_id shuffle. No window over the corpus, no collect."""
    d = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = d.select("doc_id", F.explode(T.tokens("text")).alias("t"))
    # vocab-dim (Heaps' law); consumed by total AND the nll build —
    # checkpoint so the corpus explode behind it runs once (r15,
    # guide §1.2, the q220 LM-dim discipline)
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    total = vocab.agg(F.sum("cnt").cast("double").alias("_n"))
    nll = vocab.crossJoin(F.broadcast(total)).select(
        "t",
        F.floor(
            F.round(-F.log(F.col("cnt") / F.col("_n")), 6) * MICRO
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    return (
        tok.join(F.broadcast(nll), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.expr("sum(nll_micro) div count(*)").alias("nll_micro_mean"),
        )
        .withColumn(
            "ppl_bucket",
            F.expr(f"nll_micro_mean div {_PPL_BUCKET_MICRO}").cast("int"),
        )
    )


ORACLE_Q185 = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
vocab AS (SELECT t, count(*) AS cnt FROM tok GROUP BY t),
nll AS (
  SELECT t,
         CAST(floor(round(-ln(cnt / (SELECT SUM(cnt) FROM vocab)), 6)
              * {MICRO} + 0.5) AS BIGINT) AS nll_micro
  FROM vocab
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(SUM(nll_micro) // count(*) AS BIGINT) AS nll_micro_mean,
       CAST((SUM(nll_micro) // count(*)) // {_PPL_BUCKET_MICRO} AS INTEGER)
         AS ppl_bucket
FROM tok JOIN nll USING (t)
GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q186 pairwise source-overlap matrix from per-source sketches
# ---------------------------------------------------------------------------

_Q186_K = 64


def q186_source_overlap_matrix(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Every source pair's bottom-k Jaccard estimate -- the
    governance report a curation pipeline runs before mixing
    sources ("which crawls duplicate each other?"). q176/q178
    estimate ONE pair; this widens to the full matrix while staying
    strictly sketch-sized: per-source bottom-k sketches (k rows per
    source), exploded to the pairs each sketch participates in, a
    per-pair union bottom-k, and the estimate n_common/n_union with
    the actual union-sketch size as denominator (the small-corpus
    correction q176 carries). Returns (source_a, source_b, n_union,
    n_common, jaccard_micro) for source_a < source_b.

    Scale: doc fingerprints aggregate to S*k sketch rows (window per
    source over k rows after a min-k pre-aggregate -- here directly,
    sketch input is already tiny); everything after operates on
    S^2*k rows. The source list is collected once -- sources are
    catalog-sized (a dim table's cardinality), the same bounded-
    collect contract as the IVF centroid pull (similarity.py)."""
    d = load(spark, sf_dir, "documents")
    fp = d.select(
        "source", T.fingerprint("text").alias("h")
    ).dropDuplicates(["source", "h"])
    w = Window.partitionBy("source").orderBy("h")
    sk = (
        fp.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= _Q186_K)
        .drop("_rn")
    )
    sources = sorted(
        r[0] for r in d.select("source").distinct().collect()
    )
    s_arr = F.array(*[F.lit(s) for s in sources])
    pairs = sk.select(
        "source",
        "h",
        F.explode(
            F.filter(s_arr, lambda x: x != F.col("source"))
        ).alias("partner"),
    ).select(
        F.least("source", "partner").alias("source_a"),
        F.greatest("source", "partner").alias("source_b"),
        "h",
        F.col("source").alias("origin"),
    )
    per_h = pairs.groupBy("source_a", "source_b", "h").agg(
        F.countDistinct("origin").alias("_no")
    )
    wp = Window.partitionBy("source_a", "source_b").orderBy("h")
    ranked = per_h.withColumn("_rn", F.row_number().over(wp)).filter(
        F.col("_rn") <= _Q186_K
    )
    return ranked.groupBy("source_a", "source_b").agg(
        F.count("*").cast("long").alias("n_union"),
        F.sum((F.col("_no") == 2).cast("long")).cast("long").alias(
            "n_common"
        ),
        F.expr(
            f"sum(cast(_no = 2 as long)) * {MICRO} div count(*)"
        ).alias("jaccard_micro"),
    )


ORACLE_Q186 = f"""
WITH fp AS (
  SELECT DISTINCT source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM documents
),
sk AS (
  SELECT source, h FROM (
    SELECT source, h,
           row_number() OVER (PARTITION BY source ORDER BY h) AS rn
    FROM fp
  ) WHERE rn <= {_Q186_K}
),
srcs AS (SELECT DISTINCT source FROM documents),
pairs AS (
  SELECT LEAST(sk.source, s.source) AS source_a,
         GREATEST(sk.source, s.source) AS source_b,
         sk.h, sk.source AS origin
  FROM sk JOIN srcs s ON sk.source <> s.source
),
per_h AS (
  SELECT source_a, source_b, h, count(DISTINCT origin) AS no
  FROM pairs GROUP BY source_a, source_b, h
),
ranked AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
        PARTITION BY source_a, source_b ORDER BY h) AS rn
    FROM per_h
  ) WHERE rn <= {_Q186_K}
)
SELECT source_a, source_b,
       CAST(count(*) AS BIGINT) AS n_union,
       CAST(SUM(CASE WHEN no = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_common,
       CAST(SUM(CASE WHEN no = 2 THEN 1 ELSE 0 END) * {MICRO} // count(*)
         AS BIGINT) AS jaccard_micro
FROM ranked
GROUP BY source_a, source_b
"""


QUERIES: dict[str, QuerySpec] = {
    "q184_gopher_repetition_filter": QuerySpec(
        q184_gopher_repetition_filter,
        ORACLE_Q184,
        "Gopher top-2/3-gram + duplicate-5-gram repetition filter",
        ("llm", "text", "quality"),
    ),
    "q185_unigram_nll_quality": QuerySpec(
        q185_unigram_nll_quality,
        ORACLE_Q185,
        "unigram-LM mean-nll quality score with ppl buckets",
        ("llm", "text", "quality"),
    ),
    "q186_source_overlap_matrix": QuerySpec(
        q186_source_overlap_matrix,
        ORACLE_Q186,
        "pairwise source Jaccard overlap from bottom-k sketches",
        ("llm", "dedup"),
    ),
}
