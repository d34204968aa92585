"""Round-9 LLM-pipeline additions, part 4 — cross-lingual mining,
the end-to-end curation funnel, and dataset snapshot diffing:

- q191: mined bitext — mutual-best cross-lingual pairs (the
  CCMatrix/LASER mining shape, Schwenk et al. 2021): each non-English
  document's best English embedding match and vice versa via the
  seeded-IVF ANN (q160's exactly-replicable machinery), keeping only
  MUTUAL top-1 pairs — the standard precision filter for parallel-
  corpus mining. Both directions run the same deterministic quantizer
  the DuckDB twin replicates, so the gate certifies the full
  ANN-based mining pipeline, not a brute-force stand-in.
- q192: the curation funnel — exact-dup removal, Gopher quality
  rules, repetition rules, then a per-language admission quota, each
  doc labeled with its FIRST rejecting stage (or 'admitted'). The
  end-to-end composition a pretraining data pipeline runs nightly;
  per-stage attrition falls out of a groupBy on the result.
- q193: dataset snapshot diff — fingerprint-keyed added / removed /
  changed / unchanged classification between a corpus version and
  its successor (v2 derived deterministically in-query so the gate
  is self-contained). The data-versioning governance op behind
  "what changed since the last training snapshot?".

Beyond-reference surface (the reference's four Glue scripts are
boto3 orchestration; Glue_Scripts/Patient_datamart.py:1-120).
Public knowledge only: citations above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.similarity as S
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q191 mined bitext (mutual-best cross-lingual ANN pairs)
# ---------------------------------------------------------------------------


def q191_mined_bitext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual pair mining: English docs on one side, every
    other language on the other; direction A finds each non-English
    doc's best English match through the seeded-IVF ANN (16 seed
    centroids of the ENGLISH corpus, lloyd_iters=0, n_probe=4),
    direction B the reverse under the other side's quantizer, and
    only mutual top-1 pairs survive. Returns (en_id, other_id,
    other_lang, sim).

    100 TB design: exactly two ANN passes, each the cogrouped
    per-cell BLAS scorer (map-only corpus assignment, equi-join on
    the probed cell id, ONE matmul per cell — never all-pairs, never
    a per-pair Arrow transfer) plus one equi-join for mutuality on
    the two bounded top-1 frames. This is the shape CCMatrix-scale mining runs;
    margin scoring would ride the same candidate lists. The
    deterministic seed quantizer keeps both directions exactly
    replicable (plans/llm3.py q160's certification argument)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "lang")
    embs = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # localCheckpoint (r15/r16, guide §1.2): each side frame feeds one
    # direction's corpus leg (trained AND assigned) plus the other
    # direction's query leg, so the docs⋈embeddings join re-planned
    # and re-ran up to three times per side (docs x5 / embeddings x4
    # scans in the executed plan). The join itself is pinned FIRST so
    # it executes exactly once (r15 pinned only the two lang slices,
    # which each re-ran the join for their own materialization); the
    # slices are then trivial filters of the materialized RDD and the
    # ANN internals read those.
    j = (
        docs.join(embs, docs["doc_id"] == embs["vec_id"])
        .select("vec_id", "embedding", "lang")
        .localCheckpoint()
    )
    en = j.filter(F.col("lang") == "en").select("vec_id", "embedding")
    other = j.filter(F.col("lang") != "en").select("vec_id", "embedding")

    # A: best EN match per non-en doc (quantizer seeded on the EN side).
    # Grouped/BLAS scorer: the "query" side here is half the corpus,
    # so the per-pair broadcast path would ship |Q|*|cell| vector
    # copies; the cogrouped matmul path is the at-scale shape and is
    # certified bit-identical to knn_ann_ivf (q169's argument).
    a = S.knn_ann_ivf_grouped(
        en, other, k=1, n_centroids=16, n_probe=4, lloyd_iters=0
    ).select(
        F.col("query_id").alias("other_id"),
        F.col("neighbor_id").alias("en_id"),
        F.col("sim").alias("sim"),
    )
    # B: best non-en match per EN doc (quantizer seeded on the other side)
    b = S.knn_ann_ivf_grouped(
        other, en, k=1, n_centroids=16, n_probe=4, lloyd_iters=0
    ).select(
        F.col("query_id").alias("en_id"),
        F.col("neighbor_id").alias("other_id"),
    )
    mutual = a.join(b, ["en_id", "other_id"])
    lang = load(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("other_id"), F.col("lang").alias("other_lang")
    )
    return mutual.join(lang, "other_id").select(
        "en_id", "other_id", "other_lang", "sim"
    )


def _ivf_top1_sql(tag: str, corpus_pred: str, query_pred: str) -> str:
    """q160's seeded-IVF SQL machinery parameterized by side
    predicates: top-1 neighbor among corpus-side rows for each
    query-side row, 16 seed centroids of the corpus side, n_probe=4,
    cosine rounded to 6 dp. `tag` uniquifies the CTE names so the
    two mining directions coexist in one statement; predicates are
    written against the aliased lang column."""
    return f"""
seeds_{tag} AS (
  SELECT v AS sv,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cid
  FROM vdocs WHERE {corpus_pred}
  ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT 16
),
asg_{tag} AS (
  SELECT neighbor_id, cv, cid FROM (
    SELECT c.vec_id AS neighbor_id, c.v AS cv, s.cid,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY list_cosine_similarity(c.v, s.sv) DESC,
                        s.cid ASC) AS rn
    FROM (SELECT * FROM vdocs WHERE {corpus_pred}) c
    CROSS JOIN seeds_{tag} s
  ) WHERE rn = 1
),
probe_{tag} AS (
  SELECT query_id, qv, cid FROM (
    SELECT q.vec_id AS query_id, q.v AS qv, s.cid,
           row_number() OVER (PARTITION BY q.vec_id
               ORDER BY round(list_cosine_similarity(q.v, s.sv), 9) DESC,
                        s.cid ASC) AS rn
    FROM (SELECT * FROM vdocs WHERE {query_pred}) q
    CROSS JOIN seeds_{tag} s
  ) WHERE rn <= 4
),
top_{tag} AS (
  SELECT query_id, neighbor_id, sim FROM (
    SELECT p.query_id, a.neighbor_id,
           round(list_cosine_similarity(p.qv, a.cv), 6) AS sim,
           row_number() OVER (PARTITION BY p.query_id
               ORDER BY round(list_cosine_similarity(p.qv, a.cv), 6) DESC,
                        a.neighbor_id) AS rn
    FROM probe_{tag} p JOIN asg_{tag} a USING (cid)
    WHERE a.neighbor_id <> p.query_id
  ) WHERE rn = 1
)"""


ORACLE_Q191 = f"""
WITH vdocs AS (
  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS v, d.lang
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
),
{_ivf_top1_sql("a", "lang = 'en'", "lang <> 'en'")},
{_ivf_top1_sql("b", "lang <> 'en'", "lang = 'en'")}
SELECT b.query_id AS en_id, a.query_id AS other_id,
       d.lang AS other_lang, a.sim
FROM top_a a
JOIN top_b b ON a.neighbor_id = b.query_id AND b.neighbor_id = a.query_id
JOIN documents d ON d.doc_id = a.query_id
"""


# ---------------------------------------------------------------------------
# q192 curation funnel (dedup -> quality -> repetition -> quota)
# ---------------------------------------------------------------------------

_Q192_QUOTA = 50  # per-language admission cap after the filters

# Stage thresholds shared with q184/q188 (Rae et al. 2021 table A1).
from synthea_etl_spark.plans.llm6 import (  # noqa: E402
    _DUP5_MAX,
    _TOP2_MAX,
    _TOP3_MAX,
)
from synthea_etl_spark.plans.llm7 import (  # noqa: E402
    _MAX_WLEN,
    _MAX_WORDS,
    _MIN_ALPHA,
    _MIN_STOP,
    _MIN_WLEN,
    _MIN_WORDS,
)


def q192_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation: each document is labeled with the FIRST
    stage that rejects it — 'exact_dup' (a corpus-wide earlier copy
    exists), 'quality' (any q188 Gopher bound fails), 'repetition'
    (any q184 threshold fails; docs under 5 tokens only face the
    2-gram rule they can express), 'quota' (per-language cap of
    _Q192_QUOTA, admission by smallest md5(doc_id)) — or 'admitted'.
    Per-stage attrition is a groupBy away; the per-doc frame is the
    gated output so the composition is certified end to end.

    100 TB design: stage order is cost order — the fingerprint
    shuffle and the zero-shuffle quality lambdas run on everything,
    the n-gram legs run only on survivors (the filter chain
    materializes nothing), and the quota window partitions by
    language over filter survivors only. Each stage's shape is
    individually certified (q30/q188/q184/q181); this gate certifies
    their composition."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "text")

    # stage 1: exact dedup — winner = smallest doc_id per fingerprint
    fpw = Window.partitionBy(T.fingerprint("text")).orderBy("doc_id")
    d1 = d.withColumn("_fprn", F.row_number().over(fpw))

    # stage 2: Gopher bounds — the reusable composite expression
    # (operators/text.gopher_quality_ok), the same boolean q188's
    # micro-div columns induce and the curation stream applies.
    # localCheckpoint (r15 optimization, guide §1.2): d2 feeds the
    # repetition leg AND both sides of the staged/quota join chain —
    # duplicated join subtrees re-ran the fingerprint window + the
    # quality expression up to 4x; one cut bounds it to once.
    d2 = d1.withColumn(
        "_q_ok", T.gopher_quality_ok("text")
    ).localCheckpoint()

    # stage 3: repetition thresholds on stage-1/2 survivors only
    # (single-Arrow-pass cov operator — no gram-stream shuffles;
    # every survivor has >= 50 words so the >= 5-token scope of the
    # operator covers all of them)
    surv = d2.filter((F.col("_fprn") == 1) & F.col("_q_ok")).select(
        "doc_id", "text"
    )
    covs = T.gopher_repetition_covs(surv, "text", "doc_id")
    frac = lambda cov: F.least(  # noqa: E731
        F.lit(MICRO).cast("long"),
        F.expr(f"{cov} * {MICRO} div chars"),
    )
    rep = covs.select(
        "doc_id",
        (
            (frac("cov2") <= _TOP2_MAX)
            & (frac("cov3") <= _TOP3_MAX)
            & (frac("cov5") <= _DUP5_MAX)
        ).alias("_r_ok"),
    )

    # stage 4: per-language quota, ranked only among docs passing
    # every prior stage (md5 pick order = deterministic uniform)
    # narrow staged frame (text dropped — the label needs only the
    # flags), localCheckpointed: it too is consumed on both sides of
    # the quota join below (guide §2.3: cut the proxy, not the text)
    staged = (
        d2.select("doc_id", "lang", "_fprn", "_q_ok")
        .join(rep, "doc_id", "left")
        .withColumn(
            "_pass",
            (F.col("_fprn") == 1)
            & F.col("_q_ok")
            & F.coalesce(F.col("_r_ok"), F.lit(False)),
        )
        .localCheckpoint()
    )
    # skew-free quota rank over filter survivors (util.bucketed_rank:
    # a handful of language keys would serialize a plain window into
    # one sort task per language; exact, gate hash unchanged)
    from synthea_etl_spark.operators.util import bucketed_rank

    survivors = staged.filter("_pass").withColumn(
        "_qh", F.md5(F.col("doc_id").cast("string"))
    )
    only_pass = bucketed_rank(
        survivors.withColumn(
            "_qb",
            F.expr(
                "CAST(conv(substring(_qh, 1, 8), 16, 10) AS BIGINT)"
                " div 4194304"
            ).cast("int"),
        ),
        ["lang"],
        "_qb",
        [F.col("_qh"), F.col("doc_id")],
        "_qrn",
    )
    staged = staged.join(
        only_pass.select("doc_id", "_qrn"), "doc_id", "left"
    )

    return staged.select(
        "doc_id",
        "lang",
        F.when(F.col("_fprn") > 1, F.lit("exact_dup"))
        .when(~F.col("_q_ok"), F.lit("quality"))
        .when(~F.coalesce(F.col("_r_ok"), F.lit(False)), F.lit("repetition"))
        .when(F.col("_qrn") > _Q192_QUOTA, F.lit("quota"))
        .otherwise(F.lit("admitted"))
        .alias("stage"),
    )


ORACLE_Q192 = f"""
WITH d AS (
  SELECT doc_id, lang, text,
         row_number() OVER (
             PARTITION BY md5(regexp_replace(lower(trim(text)),
                                             '\\s+', ' ', 'g'))
             ORDER BY doc_id) AS fprn,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS w,
         length(trim(text)) AS chars
  FROM documents
),
q AS (
  SELECT doc_id, lang, text, fprn, chars,
         len(w) AS nw, GREATEST(len(w), 1) AS nn,
         COALESCE(list_sum(list_transform(w, x -> length(x))), 0) AS sl,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS na,
         len(list_filter(w, x -> list_contains(
             ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x))) AS ns
  FROM d
),
q2 AS (
  SELECT *,
         nw >= {_MIN_WORDS} AND nw <= {_MAX_WORDS}
           AND sl * {MICRO} // nn >= {_MIN_WLEN}
           AND sl * {MICRO} // nn <= {_MAX_WLEN}
           AND na * {MICRO} // nn >= {_MIN_ALPHA}
           AND ns >= {_MIN_STOP} AS q_ok
  FROM q
),
surv AS (
  SELECT doc_id, text, chars FROM q2 WHERE fprn = 1 AND q_ok
),
t AS (SELECT doc_id, chars,
             string_split_regex(trim(text), '\\s+') AS toks FROM surv),
g2 AS (SELECT doc_id, chars, array_to_string(toks[i:i+1], ' ') AS g
       FROM t, UNNEST(range(1, len(toks))) AS u(i)),
g3 AS (SELECT doc_id, array_to_string(toks[i:i+2], ' ') AS g
       FROM t, UNNEST(range(1, len(toks) - 1)) AS u(i)),
g5 AS (SELECT doc_id, array_to_string(toks[i:i+4], ' ') AS g
       FROM t, UNNEST(range(1, len(toks) - 3)) AS u(i)),
cov2 AS (SELECT doc_id, MAX(c * length(g)) AS cov FROM (
           SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g
         ) GROUP BY doc_id),
cov3 AS (SELECT doc_id, MAX(c * length(g)) AS cov FROM (
           SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY doc_id, g
         ) GROUP BY doc_id),
cov5 AS (SELECT doc_id, SUM(c * length(g)) AS cov FROM (
           SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g
         ) WHERE c > 1 GROUP BY doc_id),
rep AS (
  SELECT s.doc_id,
         LEAST({MICRO}, COALESCE(cov2.cov, 0) * {MICRO} // s.chars)
             <= {_TOP2_MAX}
           AND LEAST({MICRO}, COALESCE(cov3.cov, 0) * {MICRO} // s.chars)
             <= {_TOP3_MAX}
           AND LEAST({MICRO}, COALESCE(cov5.cov, 0) * {MICRO} // s.chars)
             <= {_DUP5_MAX} AS r_ok
  FROM surv s
  LEFT JOIN cov2 USING (doc_id)
  LEFT JOIN cov3 USING (doc_id)
  LEFT JOIN cov5 USING (doc_id)
),
staged AS (
  SELECT q2.doc_id, q2.lang, q2.fprn, q2.q_ok,
         COALESCE(rep.r_ok, FALSE) AS r_ok
  FROM q2 LEFT JOIN rep USING (doc_id)
),
ranked AS (
  SELECT doc_id,
         row_number() OVER (PARTITION BY lang
             ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS qrn
  FROM staged WHERE fprn = 1 AND q_ok AND r_ok
)
SELECT s.doc_id, s.lang,
       CASE WHEN s.fprn > 1 THEN 'exact_dup'
            WHEN NOT s.q_ok THEN 'quality'
            WHEN NOT s.r_ok THEN 'repetition'
            WHEN r.qrn > {_Q192_QUOTA} THEN 'quota'
            ELSE 'admitted' END AS stage
FROM staged s LEFT JOIN ranked r USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q193 dataset snapshot diff
# ---------------------------------------------------------------------------


def q193_dataset_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fingerprint-keyed diff between a corpus snapshot and its
    successor: v2 is derived deterministically in-query (docs with
    doc_id %% 7 == 0 are dropped, %% 11 == 0 get edited text, %% 13
    == 0 additionally appear as NEW docs under doc_id + 10^6), and
    each doc_id in either snapshot is classified 'added' / 'removed'
    / 'changed' / 'unchanged'. The data-versioning question behind
    every training-snapshot audit; production points v2 at the real
    successor table and the plan is identical.

    100 TB design: one full-outer equi-join on doc_id comparing
    16-byte fingerprints — no text moves through the shuffle, only
    (id, fp). Add/remove/change counts per source are a groupBy on
    this frame."""
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    v1 = d.select("doc_id", T.fingerprint("text").alias("fp1"))
    kept = d.filter(F.col("doc_id") % 7 != 0)
    # r15 optimization (guide §1.2): edited ∪ added were TWO
    # branches over `kept`, so the corpus scanned twice for v2 (3x
    # total). One explode emits each kept row's 1-2 v2 variants —
    # the edited row always, plus the %13 'added' copy (of the
    # ORIGINAL text, as before) — the identical row multiset in a
    # single pass.
    v2_variants = F.expr(
        "filter(array("
        " struct(doc_id AS doc_id,"
        "        IF(doc_id % 11 = 0, concat(text, ' v2 edit'), text)"
        "        AS text),"
        " IF(doc_id % 13 = 0,"
        "    struct(doc_id + 1000000 AS doc_id,"
        "           concat('new ', text) AS text),"
        "    CAST(NULL AS struct<doc_id:bigint,text:string>))"
        "), x -> x IS NOT NULL)"
    )
    v2 = (
        kept.select(F.explode(v2_variants).alias("_r"))
        .select(
            F.col("_r.doc_id").alias("doc_id"),
            F.col("_r.text").alias("text"),
        )
        .select("doc_id", T.fingerprint("text").alias("fp2"))
    )
    full = v1.join(v2, "doc_id", "full_outer")
    return full.select(
        "doc_id",
        F.when(F.col("fp1").isNull(), F.lit("added"))
        .when(F.col("fp2").isNull(), F.lit("removed"))
        .when(F.col("fp1") == F.col("fp2"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )


ORACLE_Q193 = """
WITH v1 AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
v2base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0 THEN text || ' v2 edit'
              ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
),
v2 AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM v2base
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         md5(regexp_replace(lower(trim('new ' || text)), '\\s+', ' ', 'g'))
           AS fp
  FROM documents
  WHERE doc_id % 7 <> 0 AND doc_id % 13 = 0
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.fp IS NULL THEN 'added'
            WHEN v2.fp IS NULL THEN 'removed'
            WHEN v1.fp = v2.fp THEN 'unchanged'
            ELSE 'changed' END AS status
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "q191_mined_bitext": QuerySpec(
        q191_mined_bitext,
        ORACLE_Q191,
        "mutual-best cross-lingual bitext mining via seeded-IVF ANN",
        ("llm", "similarity", "text"),
    ),
    "q192_curation_funnel": QuerySpec(
        q192_curation_funnel,
        ORACLE_Q192,
        "dedup -> quality -> repetition -> quota funnel, per-doc stage",
        ("llm", "text", "quality", "dedup"),
    ),
    "q193_dataset_diff": QuerySpec(
        q193_dataset_diff,
        ORACLE_Q193,
        "fingerprint snapshot diff: added/removed/changed/unchanged",
        ("llm", "dedup"),
    ),
}
