"""Round-9 LLM-pipeline additions, part 7 — budgeted curriculum
assembly and epoch scheduling:

- q200: token-budget curriculum — admit the best-scoring documents
  until a token budget is exhausted WITHOUT a global sort: the
  per-doc quality score quantizes into buckets, cumulative token
  totals over the BUCKET histogram (a ~20-row frame) find the
  boundary bucket, full buckets admit wholesale, and only the
  boundary bucket pays a within-bucket deterministic prefix scan.
  The scalable form of "take the top docs by score until B tokens"
  (the same aggregate-histogram trick q170's decile sampling uses
  against the ntile trap).
- q201: epoch repetition plan — temperature-scaled (alpha = 0.5)
  draws per source converted into per-document repeat counts with
  exact integer remainder distribution (md5 rank within source),
  the up/down-sampling schedule multilingual training uses (mT5 /
  XLM-R temperature sampling), q182's allocation discipline carried
  from "keep or drop" to "how many epochs".

Beyond-reference surface (the reference's four Glue scripts are
boto3 orchestration; Glue_Scripts/Patient_datamart.py:1-120).
Public knowledge only: citations above.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q200 token-budget curriculum
# ---------------------------------------------------------------------------

_Q200_BUCKET = 50_000  # score-micro per bucket (~20 buckets)
_Q200_NUM, _Q200_DEN = 3, 10  # budget = 30% of corpus tokens


def q200_token_budget_curriculum(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Budgeted admission by quality: score = stop-word density in
    exact micro-units (the cheap naturalness signal; swap in any
    certified integer score), bucket = score div 50000. Buckets
    admit from the top; the budget (30% of corpus tokens, integer
    div) cuts inside exactly one boundary bucket, where docs admit
    in md5 order while their running token prefix fits the
    remainder. Returns (doc_id, bucket, n_tokens, admitted).

    Scale: per-doc scoring is zero-shuffle lambdas; the ONLY sorted
    frames are the ~20-row bucket histogram (free) and the boundary
    bucket's prefix window — never the corpus. The global-sort
    formulation ("ORDER BY score, running SUM until B") shuffles
    and totally orders 100 TB; this shape sorts kilobytes plus one
    bucket. Worst case (all docs in one bucket) degrades to the
    single-bucket prefix window — cap bucket width to bound it, the
    q170/SemDeDup sizing discipline."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.size(toks).cast("long")
    nn = F.greatest(n, F.lit(1))
    # codegen single-pass stopword count (r15, guide §4.1 — the
    # proven-equivalent regexp form of the interpreted array filter,
    # tests/test_text_expr_equiv.py)
    n_stop = T.stopword_token_count("text")
    scored = d.select(
        "doc_id",
        n.alias("n_tokens"),
        (n_stop * F.lit(MICRO).cast("long")).alias("_sm"),
        nn.alias("_nn"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"(_sm div _nn) div {_Q200_BUCKET}").cast("int").alias(
            "bucket"
        ),
        F.md5(F.concat(F.lit("cb"), F.col("doc_id").cast("string"))).alias(
            "_h"
        ),
    ).localCheckpoint()
    # ^ r15 optimization (guide §1.2, §8): scored feeds hist, the
    # boundary-bucket window, and the final verdict join — without a
    # barrier the corpus scan + stopword scoring planned and ran up
    # to six times. The checkpointed frame is the narrow per-doc
    # proxy (4 scalar columns, text dropped) — exactly the §8
    # lightweight-proxy discipline.
    hist = scored.groupBy("bucket").agg(
        F.sum("n_tokens").cast("long").alias("_btok")
    )
    wcum = (
        Window.orderBy(F.desc("bucket"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    total = hist.agg(F.sum("_btok").cast("long").alias("_ttok"))
    cuts = (
        hist.crossJoin(F.broadcast(total))
        .withColumn(
            "_before", F.coalesce(F.sum("_btok").over(wcum), F.lit(0))
        )
        .select(
            "bucket",
            "_btok",
            "_before",
            F.expr(f"_ttok * {_Q200_NUM} div {_Q200_DEN}").alias("_budget"),
        )
        # bucket-histogram-sized (~20 rows), consumed by boundary
        # and the verdict join — checkpoint so the hist/total
        # aggregates over the proxy run once (r15, guide §1.2)
        .localCheckpoint()
    )
    # the prefix window runs over the BOUNDARY bucket only (at most
    # one bucket straddles the budget) — every other doc's verdict is
    # a broadcast-joined comparison, so the corpus is never
    # window-sorted
    boundary = cuts.filter(
        (F.col("_before") < F.col("_budget"))
        & (F.col("_before") + F.col("_btok") > F.col("_budget"))
    )
    wpre = (
        Window.partitionBy("bucket")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bdocs = (
        scored.join(F.broadcast(boundary), "bucket")
        .withColumn("_prefix", F.sum("n_tokens").over(wpre))
        .select(
            "doc_id",
            (F.col("_prefix") <= F.col("_budget") - F.col("_before")).alias(
                "_part_ok"
            ),
        )
    )
    out = (
        scored.join(F.broadcast(cuts), "bucket")
        .join(bdocs, "doc_id", "left")
        .select(
            "doc_id",
            "bucket",
            "n_tokens",
            (
                (F.col("_before") + F.col("_btok") <= F.col("_budget"))
                | F.coalesce(F.col("_part_ok"), F.lit(False))
            ).alias("admitted"),
        )
    )
    return out


ORACLE_Q200 = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
),
scored AS (
  SELECT doc_id,
         len(w) AS n_tokens,
         CAST((len(list_filter(w, x -> list_contains(
             ['the', 'a', 'of', 'and', 'to', 'in', 'is'], x)))
             * {MICRO} // GREATEST(len(w), 1)) // {_Q200_BUCKET}
           AS INTEGER) AS bucket,
         md5('cb' || CAST(doc_id AS VARCHAR)) AS h
  FROM d
),
hist AS (
  SELECT bucket, SUM(n_tokens) AS btok FROM scored GROUP BY bucket
),
cuts AS (
  SELECT bucket, btok,
         COALESCE(SUM(btok) OVER (ORDER BY bucket DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before,
         (SELECT SUM(btok) FROM hist) * {_Q200_NUM} // {_Q200_DEN}
           AS budget
  FROM hist
),
pre AS (
  SELECT s.doc_id, s.bucket, s.n_tokens, c.before, c.btok, c.budget,
         SUM(s.n_tokens) OVER (PARTITION BY s.bucket
             ORDER BY s.h, s.doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prefix
  FROM scored s JOIN cuts c USING (bucket)
)
SELECT doc_id, bucket, CAST(n_tokens AS BIGINT) AS n_tokens,
       (before + btok <= budget)
         OR (before < budget AND prefix <= budget - before) AS admitted
FROM pre
"""


# ---------------------------------------------------------------------------
# q201 epoch repetition plan
# ---------------------------------------------------------------------------


def q201_epoch_repetition_plan(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-document repeat counts for one temperature-balanced
    epoch: source s receives n_s = (w_s * N) div sum(w) draws with
    w_s = floor(sqrt(count_s) * 1e6 + 0.5) (q182's integer
    allocation discipline) and N = corpus size; every doc repeats
    n_s div count_s times, and the n_s mod count_s remainder goes to
    the docs with smallest md5 rank inside the source — so
    over-represented sources downsample (repeats 0/1) and
    low-resource sources upsample (repeats > 1), bit-identically on
    any engine. Returns (doc_id, source, n_repeats); per-source
    sums equal n_s exactly.

    Scale: one source-sized aggregate broadcast back, and the
    remainder rank runs BUCKETED (the q200 histogram discipline,
    promoted here after the r10 above-floor probe measured the
    per-source window at a 1.89x marginal): docs hash into 1024
    md5-range buckets per source, a (source, bucket) histogram —
    at most 20k rows — cumulates to per-bucket rank offsets, and
    the row_number window partitions by (source, bucket), so the
    sort is 1024-way parallel within every source instead of one
    task per source. extra = (in-bucket rank <= remainder -
    docs-in-lower-buckets) reproduces the global (md5, doc_id)
    rank verdict exactly (bucket id is monotone in the hash), so
    the gate hash is unchanged. One dominant language/source — the
    100 TB norm — now costs 1024 bounded sorts, not one giant one.
    The repeat EXPANSION (explode to n_repeats rows) is the
    consumer's narrow map — the plan itself stays one row per
    doc."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ep"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("_h"),
    )
    # source-sized; wq/totals/alloc consume it three ways — without
    # a barrier the corpus count scan ran three times (r15, §1.2)
    per_src = d.groupBy("source").agg(
        F.count("*").cast("long").alias("_cnt")
    ).localCheckpoint()
    wq = per_src.select(
        "source",
        "_cnt",
        F.floor(F.sqrt(F.col("_cnt")) * MICRO + F.lit(0.5))
        .cast("long")
        .alias("_w"),
    )
    totals = wq.agg(
        F.sum("_w").cast("long").alias("_tw"),
        F.sum("_cnt").cast("long").alias("_n"),
    )
    alloc = wq.crossJoin(F.broadcast(totals)).select(
        "source",
        "_cnt",
        F.expr("(_w * _n) div _tw").alias("_ns"),
    )
    # _h < 2^32; div 2^22 -> 1024 hash-range buckets, monotone in _h
    from synthea_etl_spark.operators.util import bucketed_rank

    db = d.withColumn("_b", F.expr("_h div 4194304").cast("int"))
    return (
        bucketed_rank(
            db, ["source"], "_b", [F.asc("_h"), F.asc("doc_id")], "_rank"
        )
        .join(F.broadcast(alloc), "source")
        .select(
            "doc_id",
            "source",
            (
                F.expr("_ns div _cnt")
                + (F.col("_rank") <= F.expr("_ns % _cnt")).cast("long")
            )
            .cast("long")
            .alias("n_repeats"),
        )
    )


ORACLE_Q201 = f"""
WITH d AS (
  SELECT doc_id, source,
         CAST(concat('0x', substr(md5('ep' || CAST(doc_id AS VARCHAR)),
             1, 8)) AS BIGINT) AS h
  FROM documents
),
per_src AS (
  SELECT source, count(*) AS cnt,
         CAST(floor(sqrt(count(*)) * {MICRO} + 0.5) AS BIGINT) AS w
  FROM d GROUP BY source
),
tot AS (SELECT SUM(w) AS tw, SUM(cnt) AS n FROM per_src),
alloc AS (
  SELECT source, cnt, (w * tot.n) // tot.tw AS ns
  FROM per_src CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
           AS rnk
  FROM d
)
SELECT r.doc_id, r.source,
       CAST(a.ns // a.cnt
            + CASE WHEN r.rnk <= a.ns % a.cnt THEN 1 ELSE 0 END
         AS BIGINT) AS n_repeats
FROM ranked r JOIN alloc a USING (source)
"""


QUERIES: dict[str, QuerySpec] = {
    "q200_token_budget_curriculum": QuerySpec(
        q200_token_budget_curriculum,
        ORACLE_Q200,
        "token-budget admission via bucket histogram, no global sort",
        ("llm", "text", "quality"),
    ),
    "q201_epoch_repetition_plan": QuerySpec(
        q201_epoch_repetition_plan,
        ORACLE_Q201,
        "temperature-scaled per-doc epoch repeat counts",
        ("llm", "text", "quality"),
    ),
}
