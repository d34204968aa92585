"""Round-11 LLM-pipeline additions, part 2 — the crawl graph and
the CCNet quality stage:

- q218: anchor/LINK-GRAPH extraction — hrefs pulled from the
  synthesized HTML pages (q145's wrapping discipline, now with
  anchor elements), canonicalized with q210's URL rules, and
  aggregated to host->host edge weights: the web-graph input every
  crawl prioritizer (and PageRank, q118) consumes.
- q219: RECRAWL schedule — the composition that turns governance
  reports into an operational artifact: per-host crawl tier (q215)
  joined with per-host content churn (q216's statuses) and reduced
  to a deterministic crawl-interval in days. Exact integer
  arithmetic end to end.
- q220: bigram-LM quality scoring — the in-container stand-in for
  CCNet's stage-2 KenLM perplexity filter (Wenzek et al. 2019 §4.2:
  line dedup THEN LM perplexity; q212 is stage 1): a conditional
  add-one-smoothed bigram model trained on a "reference" slice
  (doc_id %% 10 < 3 — the Wikipedia stand-in), scored over every
  document as mean bigram NLL. Each DISTINCT (bigram | context)
  probability is quantized ONCE (round 6 dp -> micro-int, the q185
  discipline), so per-doc sums are order-independent int64 and the
  ln() inside still hash-gates.

Beyond-reference surface. Public knowledge only: CCNet (Wenzek et
al. 2019), C4 (Raffel et al. 2020), PageRank (Page et al. 1999).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm16 import (
    _oracle_q215,
    ORACLE_Q216,
)

MICRO = 1_000_000

# ---------------------------------------------------------------------------
# q218 link-graph extraction
# ---------------------------------------------------------------------------


def _synth_page_html() -> F.Column:
    """Each doc's page: its own host (the q210/q215 doc_id -> site
    mapping) plus two outbound anchors — one clean, one needing
    canonicalization (uppercase host, explicit :443, utm params) —
    and one decoy non-href attribute that must NOT be extracted."""
    dst1 = F.concat(
        F.lit("https://site"),
        ((F.col("doc_id") * 7 + 3) % 40).cast("string"),
        F.lit(".com/p/"),
        ((F.col("doc_id") * 3 + 1) % 10).cast("string"),
        F.lit("/?a=1"),
    )
    dst2 = F.concat(
        F.lit("HTTPS://SITE"),
        ((F.col("doc_id") * 11 + 5) % 40).cast("string"),
        F.lit(".COM:443/p/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("/index.html?utm_source=x&b=2"),
    )
    return F.concat(
        F.lit('<html><body><p data-src="https://decoy.com/x">intro</p>'
              '<a href="'),
        dst1,
        F.lit('">one</a> mid <a href="'),
        dst2,
        F.lit('">two</a></body></html>'),
    )


def q218_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host-level link graph from crawled HTML: extract every
    ``href`` attribute, canonicalize the target host (lowercase;
    ports/params do not matter at host granularity), attribute the
    edge to the source host (the doc's own site), and weight by
    link count + distinct target resources. Feeds q118's PageRank
    and q215's frontier.

    100 TB shape: extraction is one regexp_extract_all + explode —
    narrow codegen, no UDF; the graph aggregate is ONE shuffle on
    (src_host, dst_host). Distinct-resource counting rides the same
    aggregate (count_distinct over the canonical target string)."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    pages = docs.select("doc_id", _synth_page_html().alias("html"))
    links = pages.select(
        F.concat(
            F.lit("site"),
            (F.expr("doc_id div 4") % 40).cast("string"),
            F.lit(".com"),
        ).alias("src_host"),
        F.explode(
            F.expr(r"""regexp_extract_all(html, 'href="([^"]+)"', 1)""")
        ).alias("href"),
    )
    dst = F.lower(F.parse_url(F.col("href"), F.lit("HOST")))
    return (
        links.select("src_host", dst.alias("dst_host"), "href")
        .groupBy("src_host", "dst_host")
        .agg(
            F.count("*").cast("long").alias("n_links"),
            F.count_distinct("href").cast("long").alias("n_raw_targets"),
        )
    )


ORACLE_Q218 = r"""
WITH pages AS (
  SELECT doc_id,
         'site' || ((doc_id // 4) % 40) || '.com' AS src_host,
         '<html><body><p data-src="https://decoy.com/x">intro</p>'
         || '<a href="https://site' || ((doc_id * 7 + 3) % 40)
         || '.com/p/' || ((doc_id * 3 + 1) % 10) || '/?a=1">one</a>'
         || ' mid <a href="HTTPS://SITE' || ((doc_id * 11 + 5) % 40)
         || '.COM:443/p/' || (doc_id % 10)
         || '/index.html?utm_source=x&b=2">two</a></body></html>'
           AS html
  FROM documents
),
links AS (
  SELECT src_host,
         UNNEST(regexp_extract_all(html, 'href="([^"]+)"', 1)) AS href
  FROM pages
)
SELECT src_host,
       lower(regexp_extract(href, '^[^:]+://([^/:?#]+)', 1)) AS dst_host,
       CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT href) AS BIGINT) AS n_raw_targets
FROM links
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# q219 recrawl schedule
# ---------------------------------------------------------------------------

_TIER_BASE_DAYS = {"high": 1, "medium": 7, "low": 30}


def q219_recrawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operational recrawl schedule: per host, the q215 crawl tier
    sets a base interval (high=1d, medium=7d, low=30d) and the
    q216 churn rate adjusts it — hosts whose resources changed in
    >= 30% of cases recrawl at half the interval (min 1 day), hosts
    under 10% changed at double. Exact integer day arithmetic; the
    churn join keys on the same doc_id -> host mapping as q215.

    100 TB shape: ONE corpus scan, ONE map-side-combined host
    aggregate, zero joins (r15 optimization, guide §2.4/§1.2: the
    first cut ran q215 and q216 as separate subtrees — two full
    corpus scans, each paying its own expression pass — then joined
    two host-sized frames; but both legs aggregate BY THE SAME HOST
    KEY, so the tier inputs and the churn counters fold into one
    aggregate over one scan. Proven equivalent: q215's host —
    lower(parse_url(HOST)) of the synthetic URL — equals the direct
    'siteN.com' synthesis for every doc_id, every host occurs in
    both legs, so the inner join was a bijection on host; tier and
    churn-share arithmetic are unchanged on the same exact
    integers)."""
    from synthea_etl_spark.plans.llm16 import snapshot_status_expr
    from synthea_etl_spark.plans.llm15 import canonical_url, _synth_url

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = docs.select(
        F.lower(F.parse_url(_synth_url(), F.lit("HOST"))).alias("host"),
        canonical_url(_synth_url()).alias("curl"),
        T.gopher_quality_ok("text").alias("_ok"),
        (snapshot_status_expr() == "changed").alias("_chg"),
    )
    agg = per_doc.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("curl").cast("long").alias("n_resources"),
        F.sum(F.col("_ok").cast("long")).cast("long").alias("n_quality"),
        F.sum(F.col("_chg").cast("long")).cast("long").alias("n_changed"),
    )
    dup_rate = F.expr(f"(n_docs - n_resources) * {MICRO} div n_docs").cast(
        "long"
    )
    q_share = F.expr(f"n_quality * {MICRO} div n_docs").cast("long")
    tier = (
        F.when((q_share >= 600_000) & (dup_rate <= 900_000), F.lit("high"))
        .when(q_share >= 400_000, F.lit("medium"))
        .otherwise(F.lit("low"))
    )
    base = (
        F.when(tier == "high", F.lit(1))
        .when(tier == "medium", F.lit(7))
        .otherwise(F.lit(30))
    )
    changed_share = F.expr(f"n_changed * {MICRO} div n_docs").cast("long")
    adj = (
        F.when(
            changed_share >= 300_000,
            F.greatest(F.lit(1), (base / 2).cast("int")),
        )
        .when(changed_share < 100_000, base * 2)
        .otherwise(base)
    )
    return agg.select(
        "host",
        tier.alias("crawl_tier"),
        changed_share.alias("changed_share_micro"),
        adj.cast("int").alias("crawl_interval_days"),
    )


def _oracle_q219() -> str:
    return f"""
WITH tiers AS ({_oracle_q215()}),
churn AS ({ORACLE_Q216}),
churn_host AS (
  SELECT 'site' || ((doc_id // 4) % 40) || '.com' AS host,
         CAST(COUNT(*) AS BIGINT) AS n_resources,
         CAST(SUM(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
              * {MICRO} // COUNT(*) AS BIGINT) AS changed_share_micro
  FROM churn GROUP BY 1
)
SELECT t.host, t.crawl_tier, c.changed_share_micro,
       CAST(CASE
         WHEN c.changed_share_micro >= 300000 THEN GREATEST(1,
           CASE t.crawl_tier WHEN 'high' THEN 1 WHEN 'medium' THEN 7
                ELSE 30 END // 2)
         WHEN c.changed_share_micro < 100000 THEN
           CASE t.crawl_tier WHEN 'high' THEN 1 WHEN 'medium' THEN 7
                ELSE 30 END * 2
         ELSE CASE t.crawl_tier WHEN 'high' THEN 1 WHEN 'medium' THEN 7
                   ELSE 30 END
       END AS INTEGER) AS crawl_interval_days
FROM tiers t JOIN churn_host c USING (host)
"""


# ---------------------------------------------------------------------------
# q220 bigram-LM quality (CCNet stage 2)
# ---------------------------------------------------------------------------

_REF_MOD = 10
_REF_LT = 3  # reference slice = doc_id % 10 < 3
_PPL_BUCKET_MICRO = 500_000


def q220_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet stage-2 stand-in: an add-one-smoothed conditional
    bigram LM trained on the reference slice (doc_id % 10 < 3),
    scored over EVERY document as mean bigram NLL plus a perplexity
    bucket. p(w2|w1) = (c(w1 w2) + 1) / (ctx(w1) + V) where ctx(w1)
    is the count of bigrams starting with w1 in the reference and V
    the reference unigram vocabulary size; an unseen context scores
    1/V. NLL per DISTINCT (bigram, context) pair is quantized once
    (round 6 dp -> micro-int, q185's discipline) so per-doc sums are
    exact int64.

    100 TB shape: bigram counts are ONE vocab²-bounded shuffle with
    map-side combine; ln() + quantization happen ONLY in the
    vocab-sized dimension tables (never per token occurrence — the
    first cut computed round(ln(...)) per exploded row, 100M
    transcendental calls at sf10, and ran 2.5x over the bar; moving
    them into the dims cut the corpus-stream work to two broadcast
    probes + a coalesce of pre-quantized longs). The scoring joins
    are broadcast here (toy vocab) and plain hash joins keyed on the
    bigram string at corpus scale (the table is dim-like: Heaps'
    law keeps distinct bigrams << token occurrences); the final
    aggregate is the doc_id shuffle. No window over the corpus, no
    collect."""
    scored = _doc_bigram_nll(spark, sf_dir)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("sum(nll_micro) div count(*)").alias("nll_micro_mean"),
        )
        .withColumn(
            "ppl_bucket",
            F.expr(f"nll_micro_mean div {_PPL_BUCKET_MICRO}").cast("int"),
        )
    )


def _doc_bigram_nll(
    spark: SparkSession, sf_dir: str, carry_cols: tuple[str, ...] = ()
) -> DataFrame:
    """q220's per-bigram scored stream — (doc_id, nll_micro), one
    row per bigram occurrence, NLL pre-quantized in the vocab-sized
    dims — factored out so the source-level consumers (q229 mixture
    reweighting) reuse the identical LM and quantization instead of
    drifting from the gated q220 definition.

    ``carry_cols``: extra ``documents`` columns carried through the
    explode onto every scored row (r15 optimization for q229: a few
    bytes per compact doc row through the one doc_id exchange buys
    back a corpus-sized scored⋈documents join downstream — guide
    §2.3/§2.4)."""
    d = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = T.tokens("text")
    # one pass: explode (w1, w2) structs straight from the token
    # array. NO concatenated-bigram string anywhere: the concat
    # alone cost +1.3 s/sf10 (100M string allocations) and the join
    # key works as the two-column pair (measured: concat-key full
    # query 12.2 s, pair-key 9.9 s)
    pairs = F.expr(
        "transform(sequence(0, size(_t) - 2),"
        " i -> struct(_t[i] AS w1, _t[i + 1] AS w2))"
    )
    # repartition the COMPACT docs by doc_id BEFORE the explode (the
    # q146 clustering trick): the final per-doc aggregate then runs
    # in place on the established partitioning, so the shuffle moves
    # ~200 MB of text instead of ~1.6 GB of exploded (doc_id, nll)
    # rows — measured 9.6 s -> 6.0 s at sf10
    carry = list(carry_cols)
    doc_bi = (
        d.select("doc_id", *carry, toks.alias("_t"))
        .filter(F.size("_t") >= 2)
        .repartition("doc_id")
        .select("doc_id", *carry, F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            *carry,
            F.col("p.w1").alias("w1"),
            F.col("p.w2").alias("w2"),
        )
    )
    ref_bi = doc_bi.filter(F.col("doc_id") % _REF_MOD < _REF_LT)
    # r15 optimization (guide §1.2): the LM dims were three
    # INDEPENDENT aggregates over the corpus explode — c2, ctx, and
    # vocab_n — and every broadcast build below re-planned its whole
    # subtree (ctx twice, vocab_n three times), so the executed plan
    # ran the tokenize+explode up to SIX times. One checkpointed
    # (w1, w2) cell frame now feeds everything: ctx(w1) is EXACTLY
    # sum_w2 c2(w1, w2) (integer count algebra, bit-identical), and
    # the cell frame is the vocab²-bounded dim table the docstring
    # already argues is small (Heaps' law). vocab_n stays its own
    # unigram pass (a one-token doc adds vocabulary but no bigram,
    # so it is NOT derivable from the cells) but is a 1-row frame —
    # checkpointed so its three consumers stop re-running it.
    c2 = (
        ref_bi.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
        .localCheckpoint()
    )
    ctx = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("ctx"))
    vocab_n = (
        d.filter(F.col("doc_id") % _REF_MOD < _REF_LT)
        .select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t").cast("long").alias("v"))
        .localCheckpoint()
    )

    def qnll(num: F.Column, den: F.Column) -> F.Column:
        return (
            F.floor(
                F.round(-F.log(num.cast("double") / den.cast("double")), 6)
                * MICRO
                + F.lit(0.5)
            )
        ).cast("long")

    # dim tables carry PRE-QUANTIZED nll (ln once per distinct key)
    bg_nll = (
        c2.join(F.broadcast(ctx), "w1")
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "w1",
            "w2",
            qnll(F.col("c2") + 1, F.col("ctx") + F.col("v")).alias("bg_nll"),
        )
    )
    ctx_nll = ctx.crossJoin(F.broadcast(vocab_n)).select(
        "w1", qnll(F.lit(1), F.col("ctx") + F.col("v")).alias("w1_nll")
    )
    oov_nll = vocab_n.select(
        qnll(F.lit(1), F.col("v")).alias("oov_nll")
    )
    return (
        doc_bi.join(F.broadcast(bg_nll), ["w1", "w2"], "left")
        .join(F.broadcast(ctx_nll), "w1", "left")
        .crossJoin(F.broadcast(oov_nll))
        .select(
            "doc_id",
            *carry,
            F.coalesce(
                F.col("bg_nll"), F.col("w1_nll"), F.col("oov_nll")
            ).alias("nll_micro"),
        )
    )


# the CTE chain up to the per-bigram `scored` stream, shared by
# ORACLE_Q220 and the q229 oracle (same factoring as _doc_bigram_nll)
_SQL_DOC_NLL = f"""t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
doc_bi AS (
  SELECT doc_id, w[i] AS w1, w[i+1] AS w2
  FROM t, LATERAL (SELECT UNNEST(generate_series(1, len(w)-1)) AS i) u
  WHERE len(w) >= 2
),
ref_bi AS (
  SELECT * FROM doc_bi WHERE doc_id % {_REF_MOD} < {_REF_LT}
),
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
  FROM ref_bi GROUP BY w1, w2
),
ctx AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS ctx FROM ref_bi GROUP BY w1),
v AS (
  SELECT CAST(COUNT(DISTINCT tk) AS BIGINT) AS v
  FROM (SELECT UNNEST(w) AS tk FROM t WHERE doc_id % {_REF_MOD} < {_REF_LT})
),
bg_nll AS (
  SELECT w1, w2, CAST(floor(round(-ln((c2.c2 + 1) /
             CAST(ctx.ctx + v.v AS DOUBLE)), 6) * {MICRO} + 0.5)
           AS BIGINT) AS bg_nll
  FROM c2 JOIN ctx USING (w1) CROSS JOIN v
),
ctx_nll AS (
  SELECT w1, CAST(floor(round(-ln(1 /
             CAST(ctx + v.v AS DOUBLE)), 6) * {MICRO} + 0.5)
           AS BIGINT) AS w1_nll
  FROM ctx CROSS JOIN v
),
oov AS (
  SELECT CAST(floor(round(-ln(1 / CAST(v AS DOUBLE)), 6) * {MICRO} + 0.5)
           AS BIGINT) AS oov_nll
  FROM v
),
scored AS (
  SELECT d.doc_id,
         COALESCE(bg_nll.bg_nll, ctx_nll.w1_nll, oov.oov_nll) AS nll_micro
  FROM doc_bi d
  LEFT JOIN bg_nll USING (w1, w2)
  LEFT JOIN ctx_nll USING (w1)
  CROSS JOIN oov
)"""

ORACLE_Q220 = f"""
WITH {_SQL_DOC_NLL}
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(nll_micro) // COUNT(*) AS BIGINT) AS nll_micro_mean,
       CAST((SUM(nll_micro) // COUNT(*)) // {_PPL_BUCKET_MICRO} AS INTEGER)
         AS ppl_bucket
FROM scored GROUP BY doc_id
"""


QUERIES: dict[str, QuerySpec] = {
    "q218_link_graph": QuerySpec(
        q218_link_graph,
        ORACLE_Q218,
        "href extraction from crawl HTML -> host->host edge weights",
        ("llm", "crawl", "graph"),
    ),
    "q219_recrawl_schedule": QuerySpec(
        q219_recrawl_schedule,
        _oracle_q219(),
        "crawl tier x content churn -> per-host recrawl interval",
        ("llm", "crawl", "governance"),
    ),
    "q220_bigram_lm_quality": QuerySpec(
        q220_bigram_lm_quality,
        ORACLE_Q220,
        "CCNet stage-2 stand-in: add-one bigram LM perplexity"
        " scoring (exact int64 micro-NLL)",
        ("llm", "quality"),
    ),
}
