"""Round-11 LLM-pipeline additions, part 3 — classifier data
assembly and corpus drift monitoring:

- q221: quality-classifier TRAINING TABLE assembly — the step
  between heuristic filtering and model-based filtering in
  CCNet/LLaMA-style pipelines (Wenzek et al. 2019 §4.3; Touvron et
  al. 2023): one wide feature row per document (token counts, mean
  word length, alphabetic share, stopword hits, the q188 Gopher
  verdict, the q217 blocklist score, the q185 unigram-NLL score)
  plus the weak label (reference slice vs crawl). q161 is the
  INFERENCE side of this pair; this is the table its classifier
  trains on.
- q222: per-source token-distribution DRIFT monitor — smoothed
  KL(source || reference) over unigram distributions, the
  data-quality alarm that catches a source gone bad between
  snapshots (encoding breakage, spam floods, language shift)
  before it pollutes a mixture. All KL terms are quantized once
  per (source, token) dim row and summed in exact int64 — the
  q185/q220 discipline.

Beyond-reference surface. Public knowledge only: CCNet (Wenzek et
al. 2019), Gopher (Rae et al. 2021), KL divergence (Kullback &
Leibler 1951).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm16 import (
    _BLOCK_MILD,
    _BLOCK_SEVERE,
    _SQL_WB,
    _SQL_WB_MILD,
    _sql_gopher_ok,
    blocklist_wb_count,
)

MICRO = 1_000_000

# reference slice convention shared with q220
_REF_MOD = 10
_REF_LT = 3


def q221_quality_feature_frame(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One wide feature row per document for quality-classifier
    training: surface statistics, rule verdicts, the unigram-LM
    score, and the weak label (doc_id % 10 < 3 -> 'ref', else
    'crawl' — the CCNet convention of treating a trusted corpus
    slice as positives). Every feature reuses a certified
    expression or plan (q31/q188/q217/q185 shapes).

    100 TB shape: the text-level verdicts are one zero-shuffle
    projection; the token-grain surface stats aggregate over the
    SAME exploded pass the NLL feature uses (codegen sums, not
    interpreted array lambdas — see inline note); the NLL feature
    is the q185 plan (vocab aggregate + broadcast nll join + doc
    aggregate); the doc-keyed frames join on doc_id. The docs are
    repartitioned by doc_id up front so the per-doc aggregates AND
    the final joins reuse one partitioning (the q220 lesson) —
    total: the vocab shuffle, the doc_id repartition, nothing else
    corpus-sized."""
    d = (
        load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.length(F.trim("text")) > 0)
        .repartition("doc_id")
    )
    toks = T.tokens("text")

    # the SAME guarded-alternation helper q217 scores with — shared
    # so the feature and the verdict can never drift apart
    block_score = (
        blocklist_wb_count(_BLOCK_SEVERE) * 4 + blocklist_wb_count(_BLOCK_MILD)
    ).cast("long")
    textual = d.select(
        "doc_id",
        T.gopher_quality_ok("text").alias("gopher_ok"),
        block_score.alias("block_score"),
        F.when(F.col("doc_id") % _REF_MOD < _REF_LT, F.lit("ref"))
        .otherwise(F.lit("crawl"))
        .alias("label"),
    )
    # token-grain surface stats ride the SAME exploded pass the NLL
    # feature needs (r15 optimization): the per-token sums were
    # previously four interpreted higher-order array lambdas per doc
    # (F.aggregate / F.filter run outside codegen; the 30-literal
    # array_contains alone is O(30·n_tok) interpreted ops), and the
    # exploded twin aggregates codegen-side (isin compiles to an
    # InSet hash probe) on the doc_id partitioning already paid for.
    tok = d.select("doc_id", F.explode(toks).alias("t"))
    # unigram NLL (q185's plan riding the doc_id partitioning).
    # vocab is checkpointed (r15, guide §1.2 — the q220 LM-dim
    # discipline): total and the nll build consumed it twice.
    vocab = (
        tok.groupBy("t")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    total = vocab.agg(F.sum("cnt").cast("double").alias("_nn"))
    nll = vocab.crossJoin(F.broadcast(total)).select(
        "t",
        F.floor(
            F.round(-F.log(F.col("cnt") / F.col("_nn")), 6) * MICRO
            + F.lit(0.5)
        )
        .cast("long")
        .alias("nll_micro"),
    )
    # r15 optimization (guide §1.2): the surface stats and the NLL
    # mean were TWO groupBy(doc_id) aggregates over the same token
    # stream. Every token survives the nll broadcast join (vocab is
    # built from this very stream, keys unique), so both fold into
    # ONE aggregate over the joined rows — count/sums identical by
    # construction.
    tokfeats = (
        tok.join(F.broadcast(nll), "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("_n"),
            F.sum(F.length("t")).cast("long").alias("_sum_len"),
            F.sum(F.col("t").rlike("[a-z]").cast("long"))
            .cast("long")
            .alias("_n_alpha"),
            F.sum(F.col("t").isin(*T.STOPWORDS_EN).cast("long"))
            .cast("long")
            .alias("_n_stop"),
            F.expr("sum(nll_micro) div count(*)").alias("nll_micro_mean"),
        )
    )
    return (
        textual.join(tokfeats, "doc_id")
        .select(
            "doc_id",
            F.col("_n").alias("n_tokens"),
            F.expr(f"_sum_len * {MICRO} div greatest(_n, 1)")
            .cast("long")
            .alias("mean_word_len_micro"),
            F.expr(f"_n_alpha * {MICRO} div greatest(_n, 1)")
            .cast("long")
            .alias("alpha_share_micro"),
            F.col("_n_stop").alias("stopword_hits"),
            "gopher_ok",
            "block_score",
            "label",
            "nll_micro_mean",
        )
    )


def _oracle_q221() -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT doc_id, UNNEST(w) AS tk FROM t),
vocab AS (SELECT tk, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY tk),
nll AS (
  SELECT tk,
         CAST(floor(round(-ln(cnt / (SELECT SUM(cnt) FROM vocab)), 6)
              * {MICRO} + 0.5) AS BIGINT) AS nll_micro
  FROM vocab
),
doc_nll AS (
  SELECT doc_id, CAST(SUM(nll_micro) // count(*) AS BIGINT)
           AS nll_micro_mean
  FROM tok JOIN nll USING (tk) GROUP BY doc_id
),
scalars AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST((SELECT SUM(length(x)) FROM (SELECT UNNEST(w) AS x))
              * {MICRO} // GREATEST(len(w), 1) AS BIGINT)
           AS mean_word_len_micro,
         CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
              * {MICRO} // GREATEST(len(w), 1) AS BIGINT)
           AS alpha_share_micro,
         CAST(len(list_filter(w, x -> x IN
             ({", ".join(f"'{s}'" for s in T.STOPWORDS_EN)})))
           AS BIGINT) AS stopword_hits,
         {_sql_gopher_ok()} AS gopher_ok,
         CAST(4 * ({_SQL_WB}) + ({_SQL_WB_MILD}) AS BIGINT) AS block_score,
         CASE WHEN doc_id % {_REF_MOD} < {_REF_LT}
              THEN 'ref' ELSE 'crawl' END AS label
  FROM t
)
SELECT s.*, d.nll_micro_mean
FROM scalars s JOIN doc_nll d USING (doc_id)
"""


# ---------------------------------------------------------------------------
# q222 per-source token-distribution drift
# ---------------------------------------------------------------------------

_DRIFT_THRESHOLD_MICRO = 15_000  # corpus-calibrated: the homogeneous
# synthetic sources sit at 3-16 mnats, so 15 mnats exercises both
# verdict branches; a real deployment calibrates against a clean epoch


def q222_token_drift_monitor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source distribution drift vs the reference slice:
    smoothed KL(source || ref) over unigram token distributions,
    with a drift verdict. p_ref is add-one smoothed over the union
    vocabulary so a token unseen in the reference cannot produce an
    infinite term. The KL log-ratio is quantized ONCE per
    (source, token) dim row (vocab x sources sized — planning
    scale), and the per-source sum is exact int64:
    kl_micro = sum_t c_st * q(ln(p_s(t)/p_ref(t))) div n_s.

    100 TB shape: one (source, token) aggregate (map-side combined)
    + a broadcast join of the vocab-sized reference distribution +
    one source-sized aggregate. The corpus is read once; everything
    after the first aggregate is dim-sized.

    r15 optimization (guide §1.2, §2.3): the corpus explode was
    consumed by FOUR separate plan subtrees (st feeds ns / vstats /
    terms — duplicated each time — and the ref slice re-ran the
    explode for rt), so the scan + tokenize pass ran 4x. Now ONE
    map-side-combined (source, token) aggregate also counts the
    ref-slice hits (c_rt per source-cell; summing those cells over
    sources IS the reference count — exact integers), the vocab x
    sources frame is localCheckpointed once, and every downstream
    frame (ns, rt, vstats, terms) derives from it. Results are
    bit-identical: same counts, same smoothing, same quantization."""
    d = load(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    tok = d.select(
        "source", "doc_id", F.explode(T.tokens("text")).alias("t")
    )
    st = (
        tok.groupBy("source", "t")
        .agg(
            F.count("*").cast("long").alias("c_st"),
            F.sum(
                (F.col("doc_id") % _REF_MOD < _REF_LT).cast("long")
            )
            .cast("long")
            .alias("_c_ref"),
        )
        .localCheckpoint()
    )
    ns = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    rt = (
        st.filter(F.col("_c_ref") > 0)
        .groupBy("t")
        .agg(F.sum("_c_ref").cast("long").alias("c_rt"))
    )
    # union vocabulary size + ref total for add-one smoothing
    vstats = (
        st.select("t")
        .distinct()
        .agg(F.count("*").cast("long").alias("v"))
        .crossJoin(
            F.broadcast(
                rt.agg(F.sum("c_rt").cast("long").alias("n_ref"))
            )
        )
    )
    terms = (
        st.join(F.broadcast(ns), "source")
        .join(F.broadcast(rt), "t", "left")
        .crossJoin(F.broadcast(vstats))
        .select(
            "source",
            "n_s",
            "c_st",
            # lr = ln( (c_st/n_s) / ((c_rt+1)/(n_ref+v)) ), quantized
            # once per (source, token) row
            F.floor(
                F.round(
                    F.log(
                        (
                            F.col("c_st").cast("double")
                            * (F.col("n_ref") + F.col("v")).cast("double")
                        )
                        / (
                            F.col("n_s").cast("double")
                            * (F.coalesce(F.col("c_rt"), F.lit(0)) + 1).cast(
                                "double"
                            )
                        )
                    ),
                    6,
                )
                * MICRO
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    out = terms.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.expr("sum(c_st * lr_micro) div max(n_s)").alias("kl_micro"),
    )
    return out.select(
        "source",
        "n_tokens",
        "kl_micro",
        (F.col("kl_micro") >= _DRIFT_THRESHOLD_MICRO).alias("drifted"),
    )


ORACLE_Q222 = f"""
WITH tok AS (
  SELECT source, doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
st AS (
  SELECT source, t, CAST(count(*) AS BIGINT) AS c_st
  FROM tok GROUP BY source, t
),
ns AS (SELECT source, CAST(SUM(c_st) AS BIGINT) AS n_s FROM st GROUP BY source),
rt AS (
  SELECT t, CAST(count(*) AS BIGINT) AS c_rt
  FROM tok WHERE doc_id % {_REF_MOD} < {_REF_LT} GROUP BY t
),
vstats AS (
  SELECT (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) FROM st) AS v,
         (SELECT CAST(COALESCE(SUM(c_rt), 0) AS BIGINT) FROM rt) AS n_ref
),
terms AS (
  SELECT st.source, ns.n_s, st.c_st,
         CAST(floor(round(ln(
             (st.c_st * CAST(vs.n_ref + vs.v AS DOUBLE)) /
             (ns.n_s * CAST(COALESCE(rt.c_rt, 0) + 1 AS DOUBLE))
           ), 6) * {MICRO} + 0.5) AS BIGINT) AS lr_micro
  FROM st
  JOIN ns USING (source)
  LEFT JOIN rt USING (t)
  CROSS JOIN vstats vs
)
SELECT source,
       MAX(n_s) AS n_tokens,
       CAST(SUM(c_st * lr_micro) // MAX(n_s) AS BIGINT) AS kl_micro,
       CAST(SUM(c_st * lr_micro) // MAX(n_s) AS BIGINT)
         >= {_DRIFT_THRESHOLD_MICRO} AS drifted
FROM terms GROUP BY source
"""


# ---------------------------------------------------------------------------
# q223 per-site boilerplate (the RefinedWeb-faithful variant)
# ---------------------------------------------------------------------------

_SITE_MIN_DOCS = 2


def q223_site_boilerplate_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SITE boilerplate line removal — the RefinedWeb-faithful
    form (Penedo et al. 2023 SS3.2: templates, nav bars and footers
    recur WITHIN a host, so line-dedup scoped per site removes them
    without collapsing legitimate cross-site quotations the way a
    corpus-global rule can). A line is boilerplate iff it occurs in
    >= _SITE_MIN_DOCS distinct documents OF THE SAME HOST (the q215
    doc_id -> host mapping); removal and counts are per doc, like
    q212 but keyed on (host, fp) instead of fp.

    100 TB shape: identical to q212 with a compound shuffle key —
    one (host, fp) aggregate (the host component makes hot
    fingerprints LESS skewed than the global rule, since a
    web-wide boilerplate line splits across its hosts), one verdict
    rejoin, one doc aggregate. Returns (doc_id, host, n_lines,
    n_removed, tokens_removed).

    r15 optimization (guide §2.3, §8): the verdict rejoin's two
    sides both grew from the raw chunk explode, so the scan +
    chunker + per-line md5 ran TWICE (duplicated join subtrees);
    the frame both sides actually need is only (host, fp16, doc_id,
    line_tokens) — the §8 lightweight proxy, line_text dropped —
    localCheckpointed once. The join itself keeps the q212 shape
    (skew-safe: no per-key collect)."""
    from synthea_etl_spark.plans.llm16 import _lines

    host = F.concat(
        F.lit("site"),
        (F.expr("doc_id div 4") % 40).cast("string"),
        F.lit(".com"),
    )
    lines = (
        _lines(spark, sf_dir)
        .withColumn("host", host)
        .select("host", "fp", "doc_id", "line_tokens")
        .localCheckpoint()
    )
    freq = (
        lines.select("host", "fp", "doc_id")
        .distinct()
        .groupBy("host", "fp")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    marked = lines.join(freq, ["host", "fp"]).select(
        "doc_id",
        "host",
        "line_tokens",
        (F.col("n_docs") >= _SITE_MIN_DOCS).alias("_boiler"),
    )
    return marked.groupBy("doc_id", "host").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_boiler").cast("long")).cast("long").alias("n_removed"),
        F.sum(
            F.when(F.col("_boiler"), F.col("line_tokens")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("tokens_removed"),
    )


def _oracle_q223() -> str:
    from synthea_etl_spark.plans.llm16 import _SQL_LINES

    return f"""
WITH {_SQL_LINES},
hosted AS (
  SELECT l.*, 'site' || ((doc_id // 4) % 40) || '.com' AS host
  FROM lines l
),
freq AS (
  SELECT host, fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM hosted GROUP BY host, fp
),
marked AS (
  SELECT h.doc_id, h.host, h.line_tokens,
         f.n_docs >= {_SITE_MIN_DOCS} AS boiler
  FROM hosted h JOIN freq f USING (host, fp)
)
SELECT doc_id, host,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN boiler THEN line_tokens ELSE 0 END) AS BIGINT)
         AS tokens_removed
FROM marked GROUP BY doc_id, host
"""


# ---------------------------------------------------------------------------
# q224 drift report FROM THE STORE
# ---------------------------------------------------------------------------


def q224_drift_from_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q222's drift report answered from the token-distribution
    SLICE STORE (the q178 sketch-store discipline applied to the
    drift monitor): the corpus is ingested as two doc_id-split
    slices into a fresh store (token_stats_store — in production
    ``pipeline.token_stats_ingest_stream`` maintains it per batch),
    then ``drift_from_token_store`` computes the per-source KL from
    store-sized arithmetic alone. Hash-gating against ORACLE_Q222
    certifies end to end that sum-over-slices == corpus counts and
    that the store path reproduces the batch report bit for bit.

    100 TB shape: the answering path reads only (source, token)
    count rows — the corpus text is read once, at ingest time; the
    gate's in-query build exists to make the equality checkable."""
    import tempfile

    from synthea_etl_spark.operators.dedup import (
        drift_from_token_store,
        token_stats_store,
    )

    import shutil

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    ref_pred = (F.col("doc_id") % _REF_MOD) < _REF_LT
    # per-run private store, removed before returning (the q178
    # discipline): the source-sized report is materialized first so
    # the caller's lazy collect never touches the deleted store
    store = tempfile.mkdtemp(prefix="q224_token_store_")
    try:
        mid = 250  # doc_id split point: two slices, any split works
        token_stats_store(
            docs.filter(F.col("doc_id") < mid), store, "batch0", ref_pred
        )
        token_stats_store(
            docs.filter(F.col("doc_id") >= mid), store, "batch1", ref_pred
        )
        out = drift_from_token_store(
            spark, store, threshold_micro=_DRIFT_THRESHOLD_MICRO
        )
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)



# ---------------------------------------------------------------------------
# q225 two-phase annealing schedule
# ---------------------------------------------------------------------------

_Q225_BUCKET = 50_000
_Q225_HQ_BUCKET = 2  # stop-density bucket >= 2 = the trusted pool
_P1_NUM, _P1_DEN = 9, 10  # phase 1: first 90% of the token budget
_P2_NUM, _P2_DEN = 1, 10  # phase 2 (annealing): last 10%


def _prefix_admit(scored: DataFrame, budget: F.Column) -> DataFrame:
    """Admit documents in deterministic md5 order until their running
    token prefix exceeds ``budget`` — WITHOUT a global sort: the md5
    hex is split on its first two chars into 256 range buckets whose
    token totals form a tiny histogram (cumulative across buckets is
    a 256-row window); only the single bucket straddling the budget
    pays a per-doc prefix window. Because the bucket key is a PREFIX
    of the order key, (bucket, h, id) order == (h, id) order, so the
    admitted set equals the naive global running-sum formulation the
    oracle uses. ``scored``: (doc_id, n_tokens, _h); ``budget``: a
    1-row broadcast scalar column name '_budget'."""
    from pyspark.sql import Window

    s = scored.withColumn(
        "_hb", F.conv(F.substring("_h", 1, 2), 16, 10).cast("int")
    )
    hist = s.groupBy("_hb").agg(F.sum("n_tokens").cast("long").alias("_btok"))
    wcum = Window.orderBy("_hb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cuts = (
        hist.crossJoin(budget)
        .withColumn("_before", F.coalesce(F.sum("_btok").over(wcum), F.lit(0)))
    )
    # _before <= _budget (not <): a bucket whose cumulative start
    # lands EXACTLY on the budget still admits its leading zero-token
    # docs (oracle running-sum <= budget). Buckets' [_before,
    # _before+_btok) intervals partition the token line, so at most
    # one bucket matches either way.
    boundary = cuts.filter(
        (F.col("_before") <= F.col("_budget"))
        & (F.col("_before") + F.col("_btok") > F.col("_budget"))
    )
    wpre = (
        Window.partitionBy("_hb")
        .orderBy("_h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    bdocs = (
        s.join(F.broadcast(boundary.select("_hb", "_before", "_budget")), "_hb")
        .withColumn("_prefix", F.sum("n_tokens").over(wpre))
        .select(
            "doc_id",
            (F.col("_prefix") <= F.col("_budget") - F.col("_before")).alias(
                "_part_ok"
            ),
        )
    )
    return (
        s.join(F.broadcast(cuts.select("_hb", "_before", "_btok", "_budget")), "_hb")
        .join(bdocs, "doc_id", "left")
        .select(
            "doc_id",
            (
                (F.col("_before") + F.col("_btok") <= F.col("_budget"))
                | F.coalesce(F.col("_part_ok"), F.lit(False))
            ).alias("admitted"),
        )
    )


def q225_annealing_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase data-annealing schedule (the Llama-3/MiniCPM
    practice: train the bulk of the budget on the general pool, then
    ANNEAL the final steps on high-quality data only): phase 1
    admits documents from the FULL corpus in deterministic md5 order
    until 90% of the corpus token budget; phase 2 admits from the
    high-quality pool only (stop-density bucket >= 2 — the q200
    signal) until the remaining 10% of the SAME total budget. A
    document may appear in both phases (annealing re-epochs the
    trusted data). Exact integer token arithmetic; returns
    (doc_id, bucket, n_tokens, phase1, phase2).

    100 TB shape: two _prefix_admit passes — each touches a 256-row
    histogram plus ONE boundary bucket's window, never a global
    sort; the quality bucketing is the zero-shuffle q200 expression.
    The phase-2 pool filter makes its pass strictly smaller."""
    d = load(spark, sf_dir, "documents")
    toks = T.tokens("text")
    n = F.size(toks).cast("long")
    nn = F.greatest(n, F.lit(1))
    # codegen single-pass stopword count (r15, guide §4.1 — the
    # proven-equivalent regexp form of the interpreted array filter)
    n_stop = T.stopword_token_count("text")
    scored = d.select(
        "doc_id",
        n.alias("n_tokens"),
        (n_stop * F.lit(MICRO).cast("long")).alias("_sm"),
        nn.alias("_nn"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr(f"(_sm div _nn) div {_Q225_BUCKET}").cast("int").alias("bucket"),
        F.md5(F.concat(F.lit("an"), F.col("doc_id").cast("string"))).alias("_h"),
    ).localCheckpoint()  # r15 (guide §1.2): four consumers (budget
    # total, both _prefix_admit passes, the final join) each re-ran
    # the tokenize + stopword pass; the narrow frame cuts it to once
    total = scored.agg(F.sum("n_tokens").cast("long").alias("_ttok"))
    b1 = total.select(
        F.expr(f"_ttok * {_P1_NUM} div {_P1_DEN}").alias("_budget")
    )
    b2 = total.select(
        F.expr(f"_ttok * {_P2_NUM} div {_P2_DEN}").alias("_budget")
    )
    p1 = _prefix_admit(
        scored.select("doc_id", "n_tokens", "_h"), F.broadcast(b1)
    ).withColumnRenamed("admitted", "phase1")
    p2 = _prefix_admit(
        scored.filter(F.col("bucket") >= _Q225_HQ_BUCKET).select(
            "doc_id", "n_tokens", "_h"
        ),
        F.broadcast(b2),
    ).withColumnRenamed("admitted", "phase2")
    return (
        scored.select("doc_id", "bucket", "n_tokens")
        .join(p1, "doc_id")
        .join(p2, "doc_id", "left")
        .select(
            "doc_id",
            "bucket",
            "n_tokens",
            "phase1",
            F.coalesce(F.col("phase2"), F.lit(False)).alias("phase2"),
        )
    )


_SQL_STOPS = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)

ORACLE_Q225 = f"""
WITH d AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS w
  FROM documents
),
scored AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST((len(list_filter(w, x -> list_contains(
             ([{_SQL_STOPS}]), x)))
             * {MICRO} // GREATEST(len(w), 1)) // {_Q225_BUCKET}
           AS INTEGER) AS bucket,
         md5('an' || CAST(doc_id AS VARCHAR)) AS h
  FROM d
),
t AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ttok FROM scored),
p1 AS (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY h, doc_id
             ROWS UNBOUNDED PRECEDING)
           <= (SELECT ttok * {_P1_NUM} // {_P1_DEN} FROM t) AS phase1
  FROM scored
),
p2 AS (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY h, doc_id
             ROWS UNBOUNDED PRECEDING)
           <= (SELECT ttok * {_P2_NUM} // {_P2_DEN} FROM t) AS phase2
  FROM scored WHERE bucket >= {_Q225_HQ_BUCKET}
)
SELECT s.doc_id, s.bucket, s.n_tokens, p1.phase1,
       COALESCE(p2.phase2, FALSE) AS phase2
FROM scored s
JOIN p1 USING (doc_id)
LEFT JOIN p2 USING (doc_id)
"""


QUERIES: dict[str, QuerySpec] = {
    "q221_quality_feature_frame": QuerySpec(
        q221_quality_feature_frame,
        _oracle_q221(),
        "classifier training table: surface + rule + LM features"
        " with weak labels, one wide row per doc",
        ("llm", "quality"),
    ),
    "q222_token_drift_monitor": QuerySpec(
        q222_token_drift_monitor,
        ORACLE_Q222,
        "per-source smoothed KL drift vs the reference slice,"
        " exact int64 terms",
        ("llm", "governance"),
    ),
    "q223_site_boilerplate_removal": QuerySpec(
        q223_site_boilerplate_removal,
        _oracle_q223(),
        "RefinedWeb-faithful PER-SITE boilerplate line removal"
        " ((host, fp)-keyed)",
        ("llm", "dedup", "crawl"),
    ),
    "q224_drift_from_store": QuerySpec(
        q224_drift_from_store,
        ORACLE_Q222,
        "q222's drift report answered from the streamed token-count"
        " slice store (store-sized arithmetic)",
        ("llm", "governance", "streaming"),
    ),
    "q225_annealing_schedule": QuerySpec(
        q225_annealing_schedule,
        ORACLE_Q225,
        "two-phase annealing: 90% general-pool budget + 10%"
        " high-quality-pool budget, no global sort",
        ("llm", "curation"),
    ),
}
