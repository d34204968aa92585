"""Round-12 LLM-pipeline queries, batch 2: crawl-analytics and
mixture-optimization operators a 100 TB pretraining pipeline runs
between crawls and training runs.

- q227 snapshot novelty curve (FineWeb finding: most of each new
  crawl's content was already seen — the novelty rate per snapshot
  is the signal that decides recrawl cadence; Penedo et al. 2024).
- q228 crawl budget allocation: a global fetch budget split across
  hosts by reputation-tier weight (q215's tiers), URLs admitted per
  host in deterministic md5 order — the frontier scheduler's
  admission table (the q200 "admit until budget" discipline, per
  host, skew-free via util.bucketed_rank).
- q229 DoReMi-style mixture reweighting (Xie et al. 2023, one
  multiplicative step): per-source excess bigram-LM loss over the
  reference slice (q220's LM, source-aggregated) drives exp-weight
  updates, exact int64 micro arithmetic with the q220 quantization
  discipline (transcendentals only in source-cardinality frames).

Reference scope: beyond-reference extension surface (the reference's
four Glue scripts, Glue_Scripts/*.py:1-232, have no crawl or mixture
analytics); methods are public papers cited per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.util import bucketed_rank
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm16 import _oracle_q215, q215_host_reputation
from synthea_etl_spark.plans.llm17 import _REF_LT, _REF_MOD

MICRO = 1_000_000

# q227: 4 synthetic crawl snapshots over the corpus, ordered 0..3
_N_SNAPSHOTS = 4
# q228: fetch budget = 20% of candidate URLs; tier weights
_BUDGET_NUM, _BUDGET_DEN = 1, 5
_TIER_W = {"high": 4, "medium": 2, "low": 1}
# q229: multiplicative step size (1.0 in nats)
_DOREMI_ETA = 1.0


# ---------------------------------------------------------------------------
# q227 snapshot novelty curve
# ---------------------------------------------------------------------------


def q227_snapshot_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-snapshot content novelty (the FineWeb recrawl question):
    assign every document to one of four ordered crawl snapshots
    (doc_id % 4 — the q216 synthesis convention) and report, per
    snapshot, how many documents carry content (q30 fingerprint)
    FIRST seen in that snapshot vs content already present in an
    earlier one. The planted duplicate clusters in the corpus land
    in different snapshots, so the novelty rate genuinely falls with
    snapshot index. Returns (snapshot, n_docs, n_novel, n_stale,
    novelty_micro).

    100 TB shape: ONE fingerprint-keyed aggregate (min snapshot per
    fp, map-side combined), a rejoin on fp (reuses the exchange),
    and a 4-row final aggregate. Content strings never shuffle —
    only (fp, snapshot) pairs. The real-world form keys on the
    (crawl_id, fp) store the q151 incremental-dedup stream already
    maintains; this is its analytics twin."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    d = docs.select(
        "doc_id",
        (F.col("doc_id") % _N_SNAPSHOTS).cast("int").alias("snapshot"),
        T.fingerprint("text").alias("fp"),
    )
    first = d.groupBy("fp").agg(F.min("snapshot").alias("_first"))
    return (
        d.join(first, "fp")
        .groupBy("snapshot")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("snapshot") == F.col("_first")).cast("long"))
            .cast("long")
            .alias("n_novel"),
            F.sum((F.col("snapshot") != F.col("_first")).cast("long"))
            .cast("long")
            .alias("n_stale"),
        )
        .select(
            "snapshot",
            "n_docs",
            "n_novel",
            "n_stale",
            F.expr(f"n_novel * {MICRO} div n_docs").alias("novelty_micro"),
        )
    )


ORACLE_Q227 = f"""
WITH d AS (
  SELECT doc_id,
         CAST(doc_id % {_N_SNAPSHOTS} AS INTEGER) AS snapshot,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
  FROM documents
),
first AS (SELECT fp, MIN(snapshot) AS first_snap FROM d GROUP BY fp)
SELECT snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN snapshot = first_snap THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN snapshot <> first_snap THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stale,
       CAST(SUM(CASE WHEN snapshot = first_snap THEN 1 ELSE 0 END)
         * {MICRO} // COUNT(*) AS BIGINT) AS novelty_micro
FROM d JOIN first USING (fp)
GROUP BY snapshot
"""


# ---------------------------------------------------------------------------
# q228 crawl budget allocation
# ---------------------------------------------------------------------------


def q228_crawl_budget_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Frontier-scheduler admission: a global fetch budget (20% of
    candidate URLs) split across hosts proportionally to
    reputation-weighted volume — weight 4/2/1 for q215's
    high/medium/low tiers, quota_h = B * w_h*n_h div sum(w*n) — and
    each host admits its URLs in deterministic md5 order up to its
    quota. COMPOSES the certified q215 rollup (the tier table is the
    literal q215 output, broadcast). Returns (doc_id, host,
    crawl_tier, admitted).

    100 TB shape: the reputation rollup is q215's single host-keyed
    aggregate; quotas are host-cardinality arithmetic on a broadcast
    frame; per-host admission ranks use util.bucketed_rank (1024
    md5-range buckets per host + a broadcast offset histogram), so
    ~40 hosts (or ~1e6 real ones, each possibly huge) never
    serialize into one-sort-task-per-host — the q199/q201 lesson.
    No global sort, no corpus window."""
    # localCheckpoint (r15 optimization, guide §1.2): the broadcast
    # of `rep` appears in TWO join subtrees below (per_host and the
    # ranked admission pass), and each broadcast build re-ran q215's
    # whole corpus gopher/token aggregate (8 corpus scans in the
    # captured before-plan). The 40-row tier table is materialized
    # once; host cardinality (~1e6 real) keeps this driver-safe.
    rep = (
        q215_host_reputation(spark, sf_dir)
        .select("host", "crawl_tier")
        .localCheckpoint()
    )
    tier_w = F.when(F.col("crawl_tier") == "high", F.lit(_TIER_W["high"])) \
        .when(F.col("crawl_tier") == "medium", F.lit(_TIER_W["medium"])) \
        .otherwise(F.lit(_TIER_W["low"]))
    docs = load(spark, sf_dir, "documents").select("doc_id")
    host = F.concat(
        F.lit("site"),
        (F.expr("doc_id div 4") % 40).cast("string"),
        F.lit(".com"),
    )
    d = (
        docs.select("doc_id", host.alias("host"))
        .join(F.broadcast(rep), "host")
        .withColumn("_w", tier_w.cast("long"))
    )
    per_host = d.groupBy("host").agg(
        F.count("*").cast("long").alias("_n"),
        F.first("_w").alias("_hw"),
    ).localCheckpoint()  # host-sized; two consumers (totals, quotas)
    # would otherwise re-run the doc_id scan + host aggregate each
    totals = per_host.agg(
        F.sum(F.expr("_n * _hw")).cast("long").alias("_wn"),
        F.sum("_n").cast("long").alias("_total"),
    )
    quotas = per_host.crossJoin(F.broadcast(totals)).select(
        "host",
        F.expr(
            f"(_total * {_BUDGET_NUM} div {_BUDGET_DEN})"
            " * (_n * _hw) div _wn"
        ).alias("_quota"),
    )
    ranked = bucketed_rank(
        d.withColumn(
            "_h", F.md5(F.concat(F.lit("cb"), F.col("doc_id").cast("string")))
        ).withColumn(
            "_b",
            F.expr(
                "CAST(conv(substring(_h, 1, 8), 16, 10) AS BIGINT)"
                " div 4194304"
            ).cast("int"),
        ),
        ["host"],
        "_b",
        [F.col("_h"), F.col("doc_id")],
        "_rn",
    )
    return ranked.join(F.broadcast(quotas), "host").select(
        "doc_id",
        "host",
        "crawl_tier",
        (F.col("_rn") <= F.col("_quota")).alias("admitted"),
    )


def _oracle_q228() -> str:
    return f"""
WITH rep AS ({_oracle_q215()}),
d AS (
  SELECT doc_id,
         'site' || ((doc_id // 4) % 40) || '.com' AS host,
         md5('cb' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents
),
j AS (
  SELECT d.doc_id, d.host, d.h, rep.crawl_tier,
         CASE rep.crawl_tier WHEN 'high' THEN {_TIER_W['high']}
              WHEN 'medium' THEN {_TIER_W['medium']}
              ELSE {_TIER_W['low']} END AS w
  FROM d JOIN rep USING (host)
),
per_host AS (
  SELECT host, CAST(COUNT(*) AS BIGINT) AS n, MIN(w) AS hw
  FROM j GROUP BY host
),
tot AS (
  SELECT CAST(SUM(n * hw) AS BIGINT) AS wn,
         CAST(SUM(n) AS BIGINT) AS total
  FROM per_host
),
quotas AS (
  SELECT host,
         (total * {_BUDGET_NUM} // {_BUDGET_DEN}) * (n * hw) // wn
           AS quota
  FROM per_host CROSS JOIN tot
),
ranked AS (
  SELECT doc_id, host, crawl_tier,
         row_number() OVER (PARTITION BY host ORDER BY h, doc_id) AS rn
  FROM j
)
SELECT r.doc_id, r.host, r.crawl_tier,
       r.rn <= q.quota AS admitted
FROM ranked r JOIN quotas q USING (host)
"""


# ---------------------------------------------------------------------------
# q229 DoReMi-style mixture reweighting
# ---------------------------------------------------------------------------


def q229_doremi_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style multiplicative mixture step (Xie et al.
    2023, with the q220 bigram LM standing in for the proxy model):
    per SOURCE, mean bigram NLL under the reference-slice LM; the
    excess over the reference slice's own NLL (clamped at 0) drives
    w'_s proportional to exp(eta * excess); weights are normalized to
    micro units. Returns (source, n_bigrams, nll_micro, excess_micro,
    weight_micro).

    100 TB shape: exactly q220's plan with the final aggregate keyed
    on source instead of doc_id (vocab-dim transcendentals, pair
    join keys, pre-explode repartition) plus source-cardinality
    arithmetic: exp() runs once per SOURCE (tens of rows), the
    normalizing sum is one broadcast scalar, and the integer
    division keeps the output exact (the q220/q222 micro-unit
    discipline).

    r15 optimization (guide §2.3/§2.4, §1.2): the first cut joined
    the corpus-sized scored stream back to ``documents`` for the
    source column AND evaluated the scored subtree TWICE (once for
    the per-source aggregate, once for the reference-slice NLL —
    self-referencing frames are duplicated subtrees in Spark's
    physical plan). Now ``source`` rides the bigram explode itself
    (carry_cols — bytes per compact doc row through the exchange
    already paid for) and ONE map-side-combined aggregate keyed on
    (source, is_ref) produces partial (count, sum) cells that both
    the per-source rollup and the global reference NLL derive from
    exactly (counts and sums are additive; each ``div`` runs once on
    the combined totals, so the integer results are bit-identical to
    the two-pass form). The tiny partial frame is localCheckpointed
    so the corpus subtree runs ONCE."""
    from synthea_etl_spark.plans.llm17 import _doc_bigram_nll

    scored = _doc_bigram_nll(spark, sf_dir, carry_cols=("source",))
    parts = (
        scored.groupBy(
            "source",
            (F.col("doc_id") % _REF_MOD < _REF_LT).alias("_ref"),
        )
        .agg(
            F.count("*").cast("long").alias("_c"),
            F.sum("nll_micro").cast("long").alias("_s"),
        )
        .localCheckpoint()  # sources×2 rows; the materializing job IS
        # the single corpus pass (two consumers below)
    )
    per_source = parts.groupBy("source").agg(
        F.sum("_c").cast("long").alias("n_bigrams"),
        F.expr("sum(_s) div sum(_c)").alias("nll_micro"),
    )
    ref_nll = parts.filter(F.col("_ref")).agg(
        F.expr("sum(_s) div sum(_c)").alias("_ref_nll")
    )
    ex = per_source.crossJoin(F.broadcast(ref_nll)).select(
        "source",
        "n_bigrams",
        "nll_micro",
        F.greatest(
            F.lit(0).cast("long"), F.col("nll_micro") - F.col("_ref_nll")
        ).alias("excess_micro"),
    )
    # exp() once per source, rounded to 6 dp then micro-quantized
    # (the qnll discipline) so the normalization is integer-exact
    raw = ex.withColumn(
        "_wq",
        F.floor(
            F.round(
                F.exp(
                    F.lit(_DOREMI_ETA)
                    * F.col("excess_micro").cast("double")
                    / F.lit(float(MICRO))
                ),
                6,
            )
            * MICRO
            + F.lit(0.5)
        ).cast("long"),
    )
    total = raw.agg(F.sum("_wq").cast("long").alias("_tw"))
    return raw.crossJoin(F.broadcast(total)).select(
        "source",
        "n_bigrams",
        "nll_micro",
        "excess_micro",
        F.expr(f"_wq * {MICRO} div _tw").alias("weight_micro"),
    )


def _oracle_q229() -> str:
    from synthea_etl_spark.plans.llm17 import _SQL_DOC_NLL

    return f"""
WITH {_SQL_DOC_NLL},
src AS (SELECT doc_id, source FROM documents),
per_source AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS nll_micro
  FROM scored JOIN src USING (doc_id)
  GROUP BY source
),
refn AS (
  SELECT CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS ref_nll
  FROM scored WHERE doc_id % {_REF_MOD} < {_REF_LT}
),
ex AS (
  SELECT source, n_bigrams, nll_micro,
         GREATEST(0, nll_micro - ref_nll) AS excess_micro
  FROM per_source CROSS JOIN refn
),
raw AS (
  SELECT *, CAST(floor(round(exp({_DOREMI_ETA} * excess_micro /
             {MICRO}.0), 6) * {MICRO} + 0.5) AS BIGINT) AS wq
  FROM ex
),
tot AS (SELECT CAST(SUM(wq) AS BIGINT) AS tw FROM raw)
SELECT source, n_bigrams, nll_micro, excess_micro,
       wq * {MICRO} // tw AS weight_micro
FROM raw CROSS JOIN tot
"""


QUERIES: dict[str, QuerySpec] = {
    "q227_snapshot_novelty": QuerySpec(
        q227_snapshot_novelty,
        ORACLE_Q227,
        "per-crawl-snapshot content novelty curve (FineWeb recrawl"
        " analytics)",
        ("llm", "crawl", "dedup"),
    ),
    "q228_crawl_budget_allocation": QuerySpec(
        q228_crawl_budget_allocation,
        _oracle_q228(),
        "tier-weighted per-host fetch-budget admission (composes"
        " q215 tiers; bucketed_rank, no per-host sort task)",
        ("llm", "crawl", "governance"),
    ),
    "q229_doremi_reweight": QuerySpec(
        q229_doremi_reweight,
        _oracle_q229(),
        "DoReMi-style mixture reweighting from per-source excess"
        " bigram-LM loss, exact micro-unit weights",
        ("llm", "curation", "governance"),
    ),
}
