"""Round-15 LLM-pipeline queries: ANN index health monitoring.

- q272 closes the ANN maintenance loop (the r14 VERDICT ask): q183
  reports per-cell occupancy/coherence, q204 proves index rollover,
  q202/q203 measure candidate recall — q272 is the NIGHTLY MONITOR
  that reads all three signals off one seeded quantizer and emits a
  single retrain verdict row: recall@k of the probed-IVF path vs the
  exact truth panel, hot-cell fraction, occupancy skew, and mean
  cell coherence, each thresholded with pure-integer arithmetic so
  the verdict (not just the metrics) is hash-exact against the
  DuckDB twin.

Reference scope: beyond-reference extension surface; methods public
(IVF coarse quantization per Jegou et al. 2011; recall-based index
health checks are standard ANN operations practice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm23 import MICRO

# q160/q183's certified geometry: 16 md5-seeded centroids (seed-only,
# lloyd_iters=0 -- closed-form, so the DuckDB twin is exact), 4-cell
# probe, a 20-query panel, top-10.
_Q272_CELLS = 16
_Q272_PROBE = 4
_Q272_PANEL = 20
_Q272_K = 10

# Retrain thresholds (micro units). Values are policy constants; the
# gate hashes the BOOLEANS too, so both engines must derive them from
# the same integer metrics -- they do, by construction.
_Q272_RECALL_MIN = 500_000   # recall@k < 0.50 -> retrain
_Q272_HOT_MAX = 250_000      # >25% of cells hot -> retrain
_Q272_SKEW_MAX = 4_000_000   # max/mean occupancy > 4x -> retrain
_Q272_COH_MIN = 100_000      # mean member-centroid cosine < 0.10 -> retrain


def q272_ann_health_verdict(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The nightly ANN index health monitor: one seeded IVF quantizer
    (q160's exact-twin discipline), three health signals, one verdict
    row. Signals: (1) recall@k of the probed path against the exact
    brute-force truth on a fixed query panel (the q202/q203 recall
    methodology applied to the SERVING path, not the candidate
    generator); (2) occupancy balance -- hot-cell fraction (q183's
    2x-mean rule in integer form: n_vecs * n_cells > 2 * total) and
    max/mean skew; (3) mean cell coherence (member-to-centroid cosine,
    micro-quantized before summing so the mean is order-independent).
    ``retrain_needed`` fires when any thresholded signal breaches --
    the column an operations pager keys on.

    100 TB shape: corpus assignment is one narrow Arrow matmul pass
    (no shuffle); per-cell stats are a cell-keyed aggregate with
    map-side combine; the probe side touches n_probe/n_centroids of
    the corpus per panel query via an equi-join on the cell id; the
    exact truth panel is the MEASUREMENT cost, paid on a fixed-size
    panel (q37 class) -- at 100 TB the panel stays a few hundred
    queries while the index scales, so monitor cost is flat. All
    comparisons are integer micro arithmetic: the verdict row hashes
    identically on any engine.

    Cites: q183 (plans/llm5.py) cell telemetry, q202/q203
    (plans/llm12.py) recall methodology, q259 (plans/llm31.py) seeded
    ANN panel discipline."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"),
    )
    centroids = S.ivf_train_centroids(
        e, n_centroids=_Q272_CELLS, lloyd_iters=0
    )
    index = S.ivf_index(e, centroids)
    cframe = spark.createDataFrame(
        [(i, list(c)) for i, c in enumerate(centroids)],
        "cluster int, sv array<double>",
    )
    cos = S.make_cosine_udf()
    sim_micro = F.floor(
        F.round(cos(F.col("cv"), F.col("sv")), 6) * F.lit(MICRO)
        + F.lit(0.5)
    ).cast("long")
    per_cell = (
        index.join(F.broadcast(cframe), "cluster")
        .select("cluster", sim_micro.alias("_sm"))
        .groupBy("cluster")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.floor(F.sum("_sm") / F.count("*")).cast("long")
            .alias("mean_sim_micro"),
        )
        # cell-count-sized; consumed by cell_tot AND hot — without a
        # barrier the assignment+coherence pass ran twice (r15,
        # guide §1.2)
        .localCheckpoint()
    )
    cell_tot = per_cell.agg(
        F.count("*").cast("long").alias("n_cells"),
        F.sum("n_vecs").cast("long").alias("_total"),
        F.max("n_vecs").cast("long").alias("_max_occ"),
        F.floor(F.sum("mean_sim_micro") / F.count("*")).cast("long")
        .alias("coherence_micro"),
    )
    hot = (
        per_cell.crossJoin(F.broadcast(cell_tot.select("n_cells", "_total")))
        .select(
            (F.col("n_vecs") * F.col("n_cells") > 2 * F.col("_total"))
            .cast("long")
            .alias("_h")
        )
        .agg(F.sum("_h").cast("long").alias("hot_cells"))
    )
    panel = e.filter(F.col("vec_id") < _Q272_PANEL)
    ann = S.knn_ann_ivf_probe(
        index, centroids, panel, k=_Q272_K, n_probe=_Q272_PROBE
    )
    # panel x k rows; consumed by hits AND truth — without a barrier
    # the exact brute-force measurement pass (the query's single
    # most expensive leg) planned and ran twice (r15, guide §1.2)
    exact = S.knn_bruteforce(e, panel, k=_Q272_K).localCheckpoint()
    hits = (
        ann.select("query_id", "neighbor_id")
        .join(
            exact.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .agg(F.count(F.lit(1)).cast("long").alias("_n_hits"))
    )
    truth = exact.agg(
        F.count_distinct("query_id").cast("long").alias("n_queries"),
        F.count(F.lit(1)).cast("long").alias("_n_truth"),
    )
    return (
        truth.crossJoin(F.broadcast(hits))
        .crossJoin(F.broadcast(cell_tot))
        .crossJoin(F.broadcast(hot))
        .select(
            "n_queries",
            F.lit(_Q272_K).cast("int").alias("k"),
            F.expr(f"_n_hits * {MICRO} div _n_truth").cast("long")
            .alias("recall_micro"),
            "n_cells",
            "hot_cells",
            F.expr(f"hot_cells * {MICRO} div n_cells").cast("long")
            .alias("hot_frac_micro"),
            F.expr(f"_max_occ * n_cells * {MICRO} div _total")
            .cast("long")
            .alias("occ_skew_micro"),
            "coherence_micro",
        )
        .select(
            "*",
            (F.col("recall_micro") < _Q272_RECALL_MIN).alias("recall_low"),
            (F.col("hot_frac_micro") > _Q272_HOT_MAX).alias("hot_high"),
            (F.col("occ_skew_micro") > _Q272_SKEW_MAX).alias("skew_high"),
            (F.col("coherence_micro") < _Q272_COH_MIN).alias(
                "coherence_low"
            ),
        )
        .select(
            "*",
            (
                F.col("recall_low")
                | F.col("hot_high")
                | F.col("skew_high")
                | F.col("coherence_low")
            ).alias("retrain_needed"),
        )
    )


ORACLE_Q272 = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1
           AS cluster
  FROM c
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT {_Q272_CELLS}
),
asg AS (
  SELECT vec_id AS neighbor_id, cv, cluster FROM (
    SELECT c.vec_id, c.cv, seeds.cluster,
           row_number() OVER (PARTITION BY c.vec_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cluster ASC)
             AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
pc AS (
  SELECT a.cluster, CAST(count(*) AS BIGINT) AS n_vecs,
         CAST(floor(SUM(CAST(floor(
             round(list_cosine_similarity(a.cv, s.sv), 6) * {MICRO} + 0.5)
           AS BIGINT)) / count(*)) AS BIGINT) AS mean_sim_micro
  FROM asg a JOIN seeds s USING (cluster)
  GROUP BY a.cluster
),
ct AS (
  SELECT CAST(count(*) AS BIGINT) AS n_cells,
         CAST(SUM(n_vecs) AS BIGINT) AS total,
         CAST(MAX(n_vecs) AS BIGINT) AS max_occ,
         CAST(floor(SUM(mean_sim_micro) / count(*)) AS BIGINT)
           AS coherence_micro
  FROM pc
),
hot AS (
  SELECT CAST(SUM(CASE WHEN pc.n_vecs * ct.n_cells > 2 * ct.total
                       THEN 1 ELSE 0 END) AS BIGINT) AS hot_cells
  FROM pc CROSS JOIN ct
),
q AS (SELECT vec_id AS query_id, cv AS qv FROM c
      WHERE vec_id < {_Q272_PANEL}),
probe AS (
  SELECT query_id, qv, cluster FROM (
    SELECT query_id, qv, seeds.cluster,
           row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, sv), 9) DESC,
                        cluster ASC) AS rn
    FROM q CROSS JOIN seeds
  ) WHERE rn <= {_Q272_PROBE}
),
ann AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.neighbor_id,
           row_number() OVER (PARTITION BY p.query_id
               ORDER BY round(list_cosine_similarity(p.qv, a.cv), 6) DESC,
                        a.neighbor_id) AS rank
    FROM probe p JOIN asg a USING (cluster)
    WHERE a.neighbor_id <> p.query_id
  ) WHERE rank <= {_Q272_K}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           row_number() OVER (PARTITION BY q.query_id
               ORDER BY round(list_cosine_similarity(q.qv, c.cv), 6) DESC,
                        c.vec_id) AS rank
    FROM q CROSS JOIN c
    WHERE c.vec_id <> q.query_id
  ) WHERE rank <= {_Q272_K}
),
truth AS (
  SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS n_queries,
         CAST(COUNT(*) AS BIGINT) AS n_truth
  FROM exact
),
hits AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_hits
  FROM ann JOIN exact USING (query_id, neighbor_id)
),
m AS (
  SELECT truth.n_queries, CAST({_Q272_K} AS INTEGER) AS k,
         CAST(hits.n_hits * {MICRO} // truth.n_truth AS BIGINT)
           AS recall_micro,
         ct.n_cells, hot.hot_cells,
         CAST(hot.hot_cells * {MICRO} // ct.n_cells AS BIGINT)
           AS hot_frac_micro,
         CAST(ct.max_occ * ct.n_cells * {MICRO} // ct.total AS BIGINT)
           AS occ_skew_micro,
         ct.coherence_micro
  FROM truth CROSS JOIN hits CROSS JOIN ct CROSS JOIN hot
)
SELECT *,
       (recall_low OR hot_high OR skew_high OR coherence_low)
         AS retrain_needed
FROM (
  SELECT *,
         recall_micro < {_Q272_RECALL_MIN} AS recall_low,
         hot_frac_micro > {_Q272_HOT_MAX} AS hot_high,
         occ_skew_micro > {_Q272_SKEW_MAX} AS skew_high,
         coherence_micro < {_Q272_COH_MIN} AS coherence_low
  FROM m
)
"""


# ---------------------------------------------------------------------------
# q273 vocabulary drift (top-V Jaccard between corpus halves)
# ---------------------------------------------------------------------------

_Q273_V = 32


def q273_vocab_drift_jaccard(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-language drift of the head vocabulary between a reference
    half (even doc_id) and a live half (odd doc_id): top-V terms by
    count on each side, their intersection, Jaccard, and the
    new-term fraction -- the tokenizer-governance monitor that says
    when a frozen vocab (q237's cut) has drifted from what the crawl
    now delivers.

    100 TB shape: one exploded token aggregate with map-side combine
    (the q270 stacked-agg discipline), then the per-(lang, half)
    top-V via util.grouped_topk -- the two-stage exact top-k whose
    stage-1 sorts are 1/64th of a group and whose stage-2 frame is
    <= 64*V rows per group, never a one-task-per-language vocab sort
    (the q270/q237 hazard, group-partitioned form). The final
    Jaccard join runs on two V-row-per-language frames."""
    from synthea_etl_spark.operators.util import grouped_topk
    import synthea_etl_spark.operators.text as T

    d = load(spark, sf_dir, "documents")
    tok = d.select(
        "lang",
        (F.col("doc_id") % 2).cast("int").alias("half"),
        F.explode(T.tokens("text")).alias("t"),
    ).filter(F.length("t") > 0)
    counts = tok.groupBy("lang", "half", "t").agg(
        F.count("*").cast("long").alias("c")
    )
    top = grouped_topk(
        counts,
        ["lang", "half"],
        [F.desc("c"), F.asc("t")],
        _Q273_V,
        bucket_col="t",
    ).localCheckpoint()
    # ^ V-rows-per-(lang, half); consumed by ref/live which feed
    # nr/nl/ni — without a barrier the corpus explode + top-V ran
    # FOUR times (r15, guide §1.2)
    ref = top.filter(F.col("half") == 0).select("lang", "t")
    live = top.filter(F.col("half") == 1).select("lang", "t")
    nr = ref.groupBy("lang").agg(F.count("*").cast("long").alias("n_ref"))
    nl = live.groupBy("lang").agg(F.count("*").cast("long").alias("n_live"))
    ni = (
        ref.join(live, ["lang", "t"])
        .groupBy("lang")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    return (
        nr.join(nl, "lang")
        .join(ni, "lang", "left")
        .fillna(0, subset=["n_common"])
        .select(
            "lang",
            "n_ref",
            "n_live",
            "n_common",
            F.expr(
                f"n_common * {MICRO} div (n_ref + n_live - n_common)"
            ).cast("long").alias("jaccard_micro"),
            F.expr(f"(n_live - n_common) * {MICRO} div n_live")
            .cast("long")
            .alias("new_term_frac_micro"),
        )
    )


ORACLE_Q273 = f"""
WITH tok AS (
  SELECT lang, CAST(doc_id % 2 AS INTEGER) AS half,
         UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
counts AS (
  SELECT lang, half, t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok WHERE length(t) > 0 GROUP BY lang, half, t
),
top AS (
  SELECT lang, half, t FROM (
    SELECT *, row_number() OVER (PARTITION BY lang, half
        ORDER BY c DESC, t ASC) AS r
    FROM counts
  ) WHERE r <= {_Q273_V}
),
nr AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_ref
       FROM top WHERE half = 0 GROUP BY lang),
nl AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_live
       FROM top WHERE half = 1 GROUP BY lang),
ni AS (
  SELECT a.lang, CAST(COUNT(*) AS BIGINT) AS n_common
  FROM top a JOIN top b ON a.lang = b.lang AND a.t = b.t
  WHERE a.half = 0 AND b.half = 1
  GROUP BY a.lang
)
SELECT nr.lang, nr.n_ref, nl.n_live,
       COALESCE(ni.n_common, 0) AS n_common,
       CAST(COALESCE(ni.n_common, 0) * {MICRO}
            // (nr.n_ref + nl.n_live - COALESCE(ni.n_common, 0))
         AS BIGINT) AS jaccard_micro,
       CAST((nl.n_live - COALESCE(ni.n_common, 0)) * {MICRO} // nl.n_live
         AS BIGINT) AS new_term_frac_micro
FROM nr JOIN nl ON nr.lang = nl.lang
LEFT JOIN ni ON nr.lang = ni.lang
"""


# ---------------------------------------------------------------------------
# q274 near-dup cluster source purity
# ---------------------------------------------------------------------------

def q274_cluster_source_purity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Source-purity histogram of the near-dup clusters: for each
    MinHash-LSH cluster (q33 candidates -> connected components),
    how many distinct sources its members span -- then the histogram
    (n_sources, n_clusters, n_docs). Clusters spanning >1 source are
    cross-source verbatim propagation (mirrors, syndication,
    laundered scrapes): the dedup-governance signal that says which
    survivor-selection policy (per-source vs global) a corpus needs.

    100 TB shape: rides the certified banded candidate path + CC
    (never all-pairs; CC checkpoints its own edges, dedup.py:647).
    The purity count is TWO STACKED AGGREGATES -- (cluster, source)
    grain then cluster grain -- not count_distinct alongside count,
    which would Expand-double the exploded rows (the q270 lesson,
    measured there). The histogram grain is tiny."""
    from synthea_etl_spark.operators.dedup import connected_components
    from synthea_etl_spark.plans.llm import q33_minhash_lsh_candidates

    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = q33_minhash_lsh_candidates(spark, sf_dir).localCheckpoint()
    comp = connected_components(pairs)
    member = comp.join(d, comp["id"] == d["doc_id"]).select(
        "cluster_id", "source"
    )
    per_cs = member.groupBy("cluster_id", "source").agg(
        F.count("*").cast("long").alias("_nd")
    )
    per_cluster = per_cs.groupBy("cluster_id").agg(
        F.sum("_nd").cast("long").alias("_n_docs"),
        F.count("*").cast("long").alias("n_sources"),
    )
    return per_cluster.groupBy("n_sources").agg(
        F.count("*").cast("long").alias("n_clusters"),
        F.sum("_n_docs").cast("long").alias("n_docs"),
    )


def _oracle_q274() -> str:
    from synthea_etl_spark.plans.llm import _sql_minhash_oracle

    return f"""
WITH RECURSIVE cand AS ({_sql_minhash_oracle().strip()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL SELECT id_b, id_a FROM cand
),
reach(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
),
comp AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
member AS (
  SELECT comp.cluster_id, d.source
  FROM comp JOIN documents d ON comp.id = d.doc_id
),
per_cs AS (
  SELECT cluster_id, source, CAST(COUNT(*) AS BIGINT) AS nd
  FROM member GROUP BY cluster_id, source
),
per_cluster AS (
  SELECT cluster_id, CAST(SUM(nd) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_sources
  FROM per_cs GROUP BY cluster_id
)
SELECT n_sources, CAST(COUNT(*) AS BIGINT) AS n_clusters,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs
FROM per_cluster GROUP BY n_sources
"""


# ---------------------------------------------------------------------------
# q275 stopword-ratio vs quality-margin calibration bins
# ---------------------------------------------------------------------------

def q275_stopword_quality_bins(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Calibration of the cheap signal against the expensive one:
    bin documents by stopword ratio (fixed-width tenths -- NO global
    ntile window, so no single-task sort) and report each bin's doc
    count, mean quality-model margin, and exact stopword permille.
    A monotone margin-vs-bin curve validates stopword ratio as a
    pre-filter; a flat one says the cheap feature carries no signal
    for this corpus.

    100 TB shape: ONE exploded pass computes the weight and the
    stopword flag per token (no second scan), one doc-grain
    aggregate, one 10-row bin aggregate; the mean margin uses q269's
    positive-offset integer trick so no negative dividend ever meets
    integer division (div truncation direction differs per engine
    only below zero)."""
    import synthea_etl_spark.operators.text as T
    from synthea_etl_spark.operators.retrieval import _bucket, _weight

    d = load(spark, sf_dir, "documents")
    tok = d.filter(F.length(F.trim("text")) > 0).select(
        "doc_id", F.explode(T.tokens("text")).alias("t")
    )
    per_doc = (
        tok.select(
            "doc_id",
            _weight(_bucket(F.col("t"))).alias("w"),
            F.col("t").isin(*T.STOPWORDS_EN).cast("long").alias("s"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("w").cast("long").alias("raw_margin"),
            F.sum("s").cast("long").alias("n_stop"),
        )
    )
    binned = per_doc.withColumn(
        "bin",
        F.least(F.expr("n_stop * 10 div n_tokens"), F.lit(9)).cast("int"),
    )
    return binned.groupBy("bin").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr(
            f"(sum(raw_margin) + 1000 * sum(n_tokens)) * {MICRO}"
            f" div (1000 * sum(n_tokens)) - {MICRO}"
        ).cast("long").alias("mean_margin_micro"),
        F.expr("sum(n_stop) * 1000 div sum(n_tokens)")
        .cast("long")
        .alias("stop_permille"),
    )


_Q275_STOP_SQL = "('the', 'a', 'of', 'and', 'to', 'in', 'is')"

ORACLE_Q275 = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
wt AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w' || CAST(
             CAST(concat('0x', substr(md5('q' || t), 1, 8)) AS BIGINT)
               % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w,
         CASE WHEN t IN {_Q275_STOP_SQL} THEN 1 ELSE 0 END AS s
  FROM tok
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w) AS BIGINT) AS raw_margin,
         CAST(SUM(s) AS BIGINT) AS n_stop
  FROM wt GROUP BY doc_id
),
binned AS (
  SELECT *, CAST(LEAST(n_stop * 10 // n_tokens, 9) AS INTEGER) AS bin
  FROM per_doc
)
SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST((SUM(raw_margin) + 1000 * SUM(n_tokens)) * {MICRO}
            // (1000 * SUM(n_tokens)) - {MICRO} AS BIGINT)
         AS mean_margin_micro,
       CAST(SUM(n_stop) * 1000 // SUM(n_tokens) AS BIGINT)
         AS stop_permille
FROM binned GROUP BY bin
"""


# ---------------------------------------------------------------------------
# q276 prompt prefix-cache accounting
# ---------------------------------------------------------------------------

_Q276_KS = (4, 8, 16)


def q276_prefix_cache_accounting(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KV-prefix-cache economics over the prompt corpus: at each
    prefix depth k, group documents by their first-min(k, len)
    tokens (md5 key -- the q233 prompt-key derivation generalized to
    a depth sweep) and account the reuse: group count, largest
    group, reuse fraction, and the exact prefill tokens a prefix
    cache would save (sum over groups of (n-1) * prefix_len). The
    capacity-planning query behind serving-cache and packed-SFT
    prefill budgets.

    100 TB shape: the token array is computed ONCE per doc, the
    depth sweep explodes 3 rows per doc (k is a tiny constant axis),
    and each depth is one md5-key aggregate with map-side combine ->
    a 3-row report. Every statistic is an exact integer."""
    import synthea_etl_spark.operators.text as T

    d = load(spark, sf_dir, "documents")
    base = (
        d.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", T.tokens("text").alias("_toks"))
        .filter(F.size("_toks") > 0)
        .select(
            "doc_id",
            "_toks",
            F.explode(
                F.array(*[F.lit(int(k)) for k in _Q276_KS])
            ).alias("k"),
        )
        .select(
            "k",
            F.md5(
                F.concat_ws(" ", F.expr("slice(_toks, 1, k)"))
            ).alias("pkey"),
            F.least(F.size("_toks"), F.col("k")).cast("long").alias(
                "plen"
            ),
        )
    )
    groups = base.groupBy("k", "pkey").agg(
        F.count("*").cast("long").alias("n"),
        F.min("plen").alias("_plen"),
    )
    return groups.groupBy("k").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count("*").cast("long").alias("n_groups"),
        F.max("n").cast("long").alias("max_group_n"),
        F.expr(f"(sum(n) - count(*)) * {MICRO} div sum(n)")
        .cast("long")
        .alias("reuse_micro"),
        F.sum((F.col("n") - 1) * F.col("_plen"))
        .cast("long")
        .alias("tokens_saved"),
    )


ORACLE_Q276 = f"""
WITH base AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
ks AS (SELECT UNNEST([{', '.join(str(k) for k in _Q276_KS)}]) AS k),
keyed AS (
  SELECT k,
         md5(array_to_string(w[1:LEAST(len(w), k)], ' ')) AS pkey,
         CAST(LEAST(len(w), k) AS BIGINT) AS plen
  FROM base CROSS JOIN ks
  WHERE len(w) > 0
),
groups AS (
  SELECT k, pkey, CAST(COUNT(*) AS BIGINT) AS n, MIN(plen) AS plen
  FROM keyed GROUP BY k, pkey
)
SELECT CAST(k AS INTEGER) AS k,
       CAST(SUM(n) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(MAX(n) AS BIGINT) AS max_group_n,
       CAST((SUM(n) - COUNT(*)) * {MICRO} // SUM(n) AS BIGINT)
         AS reuse_micro,
       CAST(SUM((n - 1) * plen) AS BIGINT) AS tokens_saved
FROM groups GROUP BY k
"""


# ---------------------------------------------------------------------------
# q277 embedding dimension health audit
# ---------------------------------------------------------------------------

def q277_embedding_dim_health(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension health audit of the embedding table: count,
    exact micro-quantized component sum, min/max/range, and a dead
    flag (range 0 -- a dimension carrying no information, the
    symptom of a truncated export or a collapsed encoder). The
    data-quality gate an embedding pipeline runs before building
    ANN indexes on a new drop.

    100 TB shape: rebalance the narrow (id, vector) scan, ONE
    posexplode, one dim-keyed aggregate with map-side combine (the
    dim cardinality is the vector width -- partial aggregation
    collapses each partition to width rows before the exchange).
    Sums are reported as SUMS, not means: a micro-quantized mean
    would integer-divide a possibly-negative total, and div
    truncation direction below zero is engine-specific -- the sum
    itself is exact on any engine."""
    from synthea_etl_spark.operators.util import rebalance_by_key

    e = rebalance_by_key(
        load(spark, sf_dir, "embeddings").select("vec_id", "embedding"),
        "vec_id",
    )
    x = F.col("v") * MICRO
    vm = (
        F.when(x >= 0, F.floor(x + F.lit(0.5)))
        .otherwise(-F.floor(-x + F.lit(0.5)))
        .cast("long")
    )
    comp = e.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    ).select(F.col("dim").cast("int").alias("dim"), vm.alias("vm"))
    return comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n_vecs"),
        F.sum("vm").cast("long").alias("sum_micro"),
        F.min("vm").cast("long").alias("min_micro"),
        F.max("vm").cast("long").alias("max_micro"),
        (F.max("vm") - F.min("vm")).cast("long").alias("range_micro"),
        (F.max("vm") == F.min("vm")).alias("dead"),
    )


ORACLE_Q277 = f"""
WITH e AS (SELECT CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
comp AS (
  SELECT CAST(u.i - 1 AS INTEGER) AS dim,
         CASE WHEN emb[u.i] >= 0
              THEN CAST(floor(emb[u.i] * {MICRO} + 0.5) AS BIGINT)
              ELSE -CAST(floor(-emb[u.i] * {MICRO} + 0.5) AS BIGINT)
         END AS vm
  FROM e, LATERAL (SELECT UNNEST(generate_series(1, len(emb))) AS i) u
)
SELECT dim, CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(vm) AS BIGINT) AS sum_micro,
       CAST(MIN(vm) AS BIGINT) AS min_micro,
       CAST(MAX(vm) AS BIGINT) AS max_micro,
       CAST(MAX(vm) - MIN(vm) AS BIGINT) AS range_micro,
       MAX(vm) = MIN(vm) AS dead
FROM comp GROUP BY dim
"""


# ---------------------------------------------------------------------------
# q278 counting-Bloom membership audit (11th stream-store family)
# ---------------------------------------------------------------------------

_Q278_SYNTH = 500


def q278_bloom_membership_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gate query for the counting-Bloom membership store (the 11th
    stream-maintained family): build the store in-query from two
    batch slices with a mid-stream compaction (the store lifecycle it
    certifies -- q240/q266 class), probe it with a member panel
    (corpus fingerprints, doc_id % 17 == 3) and a synthetic absent
    panel, and report per class: exact membership, Bloom verdicts,
    false negatives (PROVEN ZERO as the in-result ``fn_zero`` column
    -- every ingested fingerprint's K buckets are incremented, so a
    member can never probe absent; the q255 discipline), false
    positives, and the realized FPR against the collision bound.

    100 TB shape: the production path is the probe -- K broadcast-
    joined bucket lookups per fingerprint against the watermark-
    filtered totals, no corpus access; ingest is sparse additive
    slices (<= K rows per doc) riding the counting-store machinery,
    so compaction and right-to-erasure (negative slice) are the
    certified paths. The exact side here is the gate-scale truth the
    store exists to avoid recomputing."""
    import shutil
    import tempfile

    from synthea_etl_spark.operators.dedup import (
        bloom_probe_from_store,
        bloom_slice_from_fps,
        compact_counting_slices,
        doc_fingerprint,
        publish_counting_slice,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="q278_bloom_store_")
    # ONE fingerprint pass over the corpus, persisted: the three
    # slice writes, the member panel, and the exact-membership truth
    # all read it — without this the gate pays ~5 corpus scans for a
    # lifecycle the stream pays once per batch (measured 9.3 s -> the
    # committed wall at organic sf10).
    # EAGER localCheckpoint, not persist: the probe/exact/slice
    # branches launch concurrently inside later jobs, and a lazy
    # cache is racy there — each branch recomputes the parquet scan
    # before the cache fills (profiled: 4 parallel 19 MB rescans at
    # organic sf10). The checkpoint materializes the fingerprint
    # pass ONCE, up front, and cuts the lineage.
    fps = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", doc_fingerprint().alias("fp"))
        .localCheckpoint()
    )
    try:
        for b in range(2):
            publish_counting_slice(
                bloom_slice_from_fps(
                    fps.filter(F.col("doc_id") % 2 == b)
                ),
                store,
                f"batch{b}",
            )
            if b == 0:
                compact_counting_slices(spark, store, 0, ["b"], "c")
        members = (
            fps.filter(F.col("doc_id") % 17 == 3)
            .select("fp")
            .distinct()
            .withColumn("probe_class", F.lit("member"))
        )
        synth = spark.range(_Q278_SYNTH).select(
            F.md5(
                F.concat(F.lit("absent:"), F.col("id").cast("string"))
            ).alias("fp"),
            F.lit("synthetic").alias("probe_class"),
        )
        probes = members.unionByName(synth)
        verdict = bloom_probe_from_store(spark, store, probes)
        corpus = fps.select("fp").distinct().withColumn("_in", F.lit(1))
        out = (
            probes.join(verdict, "fp")
            .join(corpus, "fp", "left")
            .select(
                "probe_class",
                F.col("_in").isNotNull().cast("long").alias("_e"),
                F.col("present").cast("long").alias("_p"),
            )
            .groupBy("probe_class")
            .agg(
                F.count("*").cast("long").alias("n_probes"),
                F.sum("_e").cast("long").alias("n_exact_present"),
                F.sum("_p").cast("long").alias("n_bloom_present"),
                F.sum(F.expr("_e * (1 - _p)")).cast("long")
                .alias("n_false_neg"),
                F.sum(F.expr("(1 - _e) * _p")).cast("long")
                .alias("n_false_pos"),
            )
            .select(
                "*",
                F.expr(
                    f"n_false_pos * {MICRO}"
                    " div greatest(1, n_probes - n_exact_present)"
                ).cast("long").alias("fpr_micro"),
                (F.col("n_false_neg") == 0).alias("fn_zero"),
            )
        )
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _oracle_q278() -> str:
    from synthea_etl_spark.operators.dedup import BLOOM_K, BLOOM_M

    idx = ", ".join(str(i) for i in range(BLOOM_K))
    return f"""
WITH nonempty AS (
  SELECT md5(trim(text)) AS fp FROM documents
  WHERE length(trim(text)) > 0
),
corpus AS (SELECT DISTINCT fp FROM nonempty),
buckets AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM corpus CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
members AS (
  SELECT DISTINCT md5(trim(text)) AS fp, 'member' AS probe_class
  FROM documents
  WHERE length(trim(text)) > 0 AND doc_id % 17 = 3
),
synth AS (
  SELECT md5('absent:' || CAST(r AS VARCHAR)) AS fp,
         'synthetic' AS probe_class
  FROM range({_Q278_SYNTH}) t(r)
),
probes AS (SELECT * FROM members UNION ALL SELECT * FROM synth),
pb AS (
  SELECT p.fp, p.probe_class,
         CAST(concat('0x', substr(md5(p.fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM probes p CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
hit AS (
  SELECT pb.fp, pb.probe_class,
         SUM(CASE WHEN bk.b IS NOT NULL THEN 1 ELSE 0 END) = {BLOOM_K}
           AS present
  FROM pb LEFT JOIN buckets bk USING (b)
  GROUP BY pb.fp, pb.probe_class
),
ann AS (
  SELECT h.probe_class,
         CASE WHEN c.fp IS NOT NULL THEN 1 ELSE 0 END AS e,
         CASE WHEN h.present THEN 1 ELSE 0 END AS p
  FROM hit h LEFT JOIN corpus c ON h.fp = c.fp
)
SELECT probe_class, CAST(COUNT(*) AS BIGINT) AS n_probes,
       CAST(SUM(e) AS BIGINT) AS n_exact_present,
       CAST(SUM(p) AS BIGINT) AS n_bloom_present,
       CAST(SUM(e * (1 - p)) AS BIGINT) AS n_false_neg,
       CAST(SUM((1 - e) * p) AS BIGINT) AS n_false_pos,
       CAST(SUM((1 - e) * p) * {MICRO}
            // GREATEST(1, COUNT(*) - SUM(e)) AS BIGINT) AS fpr_micro,
       SUM(e * (1 - p)) = 0 AS fn_zero
FROM ann GROUP BY probe_class
"""


# ---------------------------------------------------------------------------
# q279 Bloom-precheck dedup funnel / q280 bounded novelty audit
# ---------------------------------------------------------------------------

def q279_bloom_dedup_funnel(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The 11th family's operational use: an INCOMING batch
    (doc_id % 7 == 1) is prechecked against the Bloom store of the
    ALREADY-INGESTED corpus (the other 6/7) before any exact dedup
    work. One row: batch size, Bloom hits (the only docs that need
    exact verification), exact duplicates among them, the realized
    precheck precision, and the exact-work-avoided fraction — the
    measurement that justifies fronting an exact-dedup pipeline with
    a store probe. ``fn_zero`` proves in-result that no true
    duplicate escaped the precheck (the Bloom guarantee: exact dups
    are a subset of Bloom hits).

    100 TB shape: the store probe is K bucket lookups per batch doc
    (batch-sized work against store-sized state); the exact join
    runs ONLY on the Bloom-hit subset — at honest duplication rates
    that is the whole point: (1 - hit-rate) of the batch never pays
    the exact-verification join."""
    import shutil
    import tempfile

    from synthea_etl_spark.operators.dedup import (
        bloom_probe_from_store,
        bloom_slice_from_fps,
        doc_fingerprint,
        publish_counting_slice,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    store = tempfile.mkdtemp(prefix="q279_bloom_store_")
    # EAGER localCheckpoint, not persist: the probe/exact/slice
    # branches launch concurrently inside later jobs, and a lazy
    # cache is racy there — each branch recomputes the parquet scan
    # before the cache fills (profiled: 4 parallel 19 MB rescans at
    # organic sf10). The checkpoint materializes the fingerprint
    # pass ONCE, up front, and cuts the lineage.
    fps = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", doc_fingerprint().alias("fp"))
        .localCheckpoint()
    )
    try:
        ingested = fps.filter(F.col("doc_id") % 7 != 1)
        batch = fps.filter(F.col("doc_id") % 7 == 1)
        # one published slice, no in-query compaction: the slice/
        # compaction/erasure lifecycle is q278's and the drive's
        # subject; this query certifies the USE (precheck funnel), so
        # it pays only the store writes a stream batch pays
        publish_counting_slice(
            bloom_slice_from_fps(ingested), store, "batch0"
        )
        verdict = bloom_probe_from_store(
            spark, store, batch.select("fp")
        )
        ing_fps = ingested.select("fp").distinct().withColumn(
            "_in", F.lit(1)
        )
        ann = (
            batch.join(verdict, "fp")
            .join(ing_fps, "fp", "left")
            .select(
                F.col("present").cast("long").alias("_h"),
                F.col("_in").isNotNull().cast("long").alias("_e"),
            )
        )
        out = ann.agg(
            F.count("*").cast("long").alias("n_batch"),
            F.sum("_h").cast("long").alias("n_bloom_hits"),
            F.sum("_e").cast("long").alias("n_exact_dups"),
            F.sum(F.expr("_e * (1 - _h)")).cast("long")
            .alias("n_escaped"),
        ).select(
            "*",
            F.expr(
                f"n_exact_dups * {MICRO} div greatest(1, n_bloom_hits)"
            ).cast("long").alias("precision_micro"),
            F.expr(
                f"(n_batch - n_bloom_hits) * {MICRO} div n_batch"
            ).cast("long").alias("exact_work_avoided_micro"),
            (F.col("n_escaped") == 0).alias("fn_zero"),
        )
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        shutil.rmtree(store, ignore_errors=True)


def _oracle_q279() -> str:
    from synthea_etl_spark.operators.dedup import BLOOM_K, BLOOM_M

    idx = ", ".join(str(i) for i in range(BLOOM_K))
    return f"""
WITH fps AS (
  SELECT doc_id, md5(trim(text)) AS fp FROM documents
  WHERE length(trim(text)) > 0
),
ingested AS (SELECT fp FROM fps WHERE doc_id % 7 <> 1),
batch AS (SELECT fp FROM fps WHERE doc_id % 7 = 1),
buckets AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM (SELECT DISTINCT fp FROM ingested)
       CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
pb AS (
  SELECT p.fp,
         CAST(concat('0x', substr(md5(p.fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM (SELECT DISTINCT fp FROM batch) p
       CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
hit AS (
  SELECT pb.fp,
         SUM(CASE WHEN bk.b IS NOT NULL THEN 1 ELSE 0 END) = {BLOOM_K}
           AS present
  FROM pb LEFT JOIN buckets bk USING (b)
  GROUP BY pb.fp
),
ann AS (
  SELECT CASE WHEN h.present THEN 1 ELSE 0 END AS h,
         CASE WHEN i.fp IS NOT NULL THEN 1 ELSE 0 END AS e
  FROM batch b
  JOIN hit h ON b.fp = h.fp
  LEFT JOIN (SELECT DISTINCT fp FROM ingested) i ON b.fp = i.fp
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
       CAST(SUM(h) AS BIGINT) AS n_bloom_hits,
       CAST(SUM(e) AS BIGINT) AS n_exact_dups,
       CAST(SUM(e * (1 - h)) AS BIGINT) AS n_escaped,
       CAST(SUM(e) * {MICRO} // GREATEST(1, SUM(h)) AS BIGINT)
         AS precision_micro,
       CAST((COUNT(*) - SUM(h)) * {MICRO} // COUNT(*) AS BIGINT)
         AS exact_work_avoided_micro,
       SUM(e * (1 - h)) = 0 AS fn_zero
FROM ann
"""


def q280_bloom_novelty_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source novelty of a live half (odd doc_id) against the
    Bloom store of a reference half (even doc_id), WITH the bound
    semantics made explicit: a Bloom-absent fingerprint is PROVEN
    novel (no false negatives), a Bloom-present one is only maybe-
    duplicate — so the store gives a certified LOWER bound on
    novelty, and the exact join measures how tight it is at the
    realized load factor. ``bound_ok`` verifies novel_min <=
    novel_exact in-result (the q255 discipline): a violated bound
    would mean a false negative, i.e. a broken store.

    100 TB shape: the bound is a property of the Bloom
    REPRESENTATION, so this query computes the reference bucket set
    in-plan (the store-backed probe path is q278/q279's certified
    subject — no store write here, one fewer lifecycle to pay): one
    bucket aggregate over the reference half, an inner bucket join
    against the live half's fingerprints (the q278 inner+recover
    shape), and the exact semi-truth the monitor replaces with the
    bound."""
    from synthea_etl_spark.operators.dedup import (
        BLOOM_K,
        bloom_buckets,
        bloom_slice_from_fps,
        doc_fingerprint,
    )

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    # ONE corpus pass to fingerprint grain: in_ref (exact membership
    # of the reference half) and the live half's source set come out
    # of a single groupBy — no separate ref-distinct / live-distinct
    # / slice scans (profiled: three 20 MB rescans, or three 74 MB
    # checkpoint rereads, in the branch-per-frame shape). The
    # checkpointed per-fp frame is narrow and every later branch is
    # fp-grain-sized.
    per_fp = (
        docs.filter(F.length(F.trim("text")) > 0)
        .select("doc_id", "source", doc_fingerprint().alias("fp"))
        .groupBy("fp")
        .agg(
            F.max((F.col("doc_id") % 2 == 0).cast("int")).alias(
                "in_ref"
            ),
            F.collect_set(
                F.when(F.col("doc_id") % 2 == 1, F.col("source"))
            ).alias("_live_srcs"),
        )
        .localCheckpoint()
    )
    ref_buckets = bloom_slice_from_fps(
        per_fp.filter(F.col("in_ref") == 1), "fp"
    ).select("b")
    live_fps = per_fp.filter(F.size("_live_srcs") > 0).select(
        "fp", "in_ref", F.explode("_live_srcs").alias("source")
    )
    # explode from the fp GRAIN (per_fp), not from live_fps's
    # (fp, source) rows: a multi-source fp must not double its
    # bucket rows, but a same-fp hash COLLISION must keep its
    # multiplicity (present = K matched rows, duplicates included —
    # the bloom_probe_from_store / oracle semantics; a distinct here
    # would turn an all-live collided fp into a false negative)
    pb = per_fp.filter(F.size("_live_srcs") > 0).select(
        "fp", F.explode(bloom_buckets(F.col("fp"))).alias("b")
    )
    n_live = (
        ref_buckets.join(F.broadcast(pb), "b")
        .groupBy("fp")
        .agg(F.count("*").cast("int").alias("_n"))
    )
    ann = live_fps.join(n_live, "fp", "left").select(
        "source",
        (F.coalesce(F.col("_n"), F.lit(0)) < BLOOM_K)
        .cast("long")
        .alias("_novel_min"),
        (F.col("in_ref") == 0).cast("long").alias("_novel_exact"),
    )
    return (
        ann.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_live_fps"),
            F.sum("_novel_min").cast("long").alias("novel_min"),
            F.sum("_novel_exact").cast("long").alias("novel_exact"),
        )
        .select(
            "*",
            F.expr(f"novel_min * {MICRO} div n_live_fps")
            .cast("long")
            .alias("novelty_lower_micro"),
            F.expr(f"novel_exact * {MICRO} div n_live_fps")
            .cast("long")
            .alias("novelty_exact_micro"),
            (F.col("novel_min") <= F.col("novel_exact")).alias(
                "bound_ok"
            ),
        )
    )


def _oracle_q280() -> str:
    from synthea_etl_spark.operators.dedup import BLOOM_K, BLOOM_M

    idx = ", ".join(str(i) for i in range(BLOOM_K))
    return f"""
WITH fps AS (
  SELECT doc_id, source, md5(trim(text)) AS fp FROM documents
  WHERE length(trim(text)) > 0
),
ref AS (SELECT fp FROM fps WHERE doc_id % 2 = 0),
live AS (SELECT DISTINCT source, fp FROM fps WHERE doc_id % 2 = 1),
buckets AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM (SELECT DISTINCT fp FROM ref)
       CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
pb AS (
  SELECT p.fp,
         CAST(concat('0x', substr(md5(p.fp || ':' || CAST(i AS VARCHAR)),
                                  1, 8)) AS BIGINT) % {BLOOM_M} AS b
  FROM (SELECT DISTINCT fp FROM live) p
       CROSS JOIN (SELECT UNNEST([{idx}]) AS i) u
),
hit AS (
  SELECT pb.fp,
         SUM(CASE WHEN bk.b IS NOT NULL THEN 1 ELSE 0 END) = {BLOOM_K}
           AS present
  FROM pb LEFT JOIN buckets bk USING (b)
  GROUP BY pb.fp
),
ann AS (
  SELECT l.source,
         CASE WHEN h.present THEN 0 ELSE 1 END AS novel_min,
         CASE WHEN r.fp IS NULL THEN 1 ELSE 0 END AS novel_exact
  FROM live l
  JOIN hit h ON l.fp = h.fp
  LEFT JOIN (SELECT DISTINCT fp FROM ref) r ON l.fp = r.fp
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_live_fps,
       CAST(SUM(novel_min) AS BIGINT) AS novel_min,
       CAST(SUM(novel_exact) AS BIGINT) AS novel_exact,
       CAST(SUM(novel_min) * {MICRO} // COUNT(*) AS BIGINT)
         AS novelty_lower_micro,
       CAST(SUM(novel_exact) * {MICRO} // COUNT(*) AS BIGINT)
         AS novelty_exact_micro,
       SUM(novel_min) <= SUM(novel_exact) AS bound_ok
FROM ann GROUP BY source
"""


# ---------------------------------------------------------------------------
# q281 per-source curation shortlist (grouped top-k at corpus scale)
# ---------------------------------------------------------------------------

_Q281_K = 10


def q281_source_quality_shortlist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source top-k documents by quality-model margin — the
    curation shortlist a data team pulls for manual review ("show me
    each source's best docs"). Rank key is the exact integer
    normalized margin (raw_margin * MICRO div n_tokens: raw_margin
    is bounded by 1000 * n_tokens, so the dividend is positive after
    the +1000 offset — the q269/q275 integer-division discipline),
    tie-broken by doc_id.

    100 TB shape: the scoring pass is one exploded aggregate to doc
    grain; the per-source cut is util.grouped_topk — sources are the
    canonical few-huge-groups case (~20 keys over billions of docs),
    where a plain partitioned window serializes into ~20 giant sort
    tasks and grouped_topk's bucketed stage-1 sorts are each
    1/64th of a source (stage 2 re-ranks <= 64k rows per source).
    The oracle is the plain per-source row_number — exactness of the
    two-stage cut is the operator's contract (property-tested across
    bucket counts in test_llm32)."""
    from synthea_etl_spark.operators.retrieval import quality_model_score
    from synthea_etl_spark.operators.util import grouped_topk

    d = load(spark, sf_dir, "documents")
    scored = quality_model_score(d, "text", "doc_id").select(
        "doc_id", "raw_margin", "n_tokens"
    )
    src = d.select("doc_id", "source")
    keyed = scored.join(src, "doc_id").select(
        "source",
        "doc_id",
        "n_tokens",
        F.expr(
            f"(raw_margin + 1000 * n_tokens) * {MICRO}"
            f" div (1000 * n_tokens) - {MICRO}"
        ).cast("long").alias("margin_micro"),
    )
    return grouped_topk(
        keyed,
        ["source"],
        [F.desc("margin_micro"), F.asc("doc_id")],
        _Q281_K,
        bucket_col="doc_id",
    ).select(
        "source",
        F.col("rank").cast("long").alias("rank"),
        "doc_id",
        "margin_micro",
        F.col("n_tokens").cast("long").alias("n_tokens"),
    )


ORACLE_Q281 = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
wt AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w' || CAST(
             CAST(concat('0x', substr(md5('q' || t), 1, 8)) AS BIGINT)
               % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w
  FROM tok
),
per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(w) AS BIGINT) AS raw_margin
  FROM wt GROUP BY doc_id
),
keyed AS (
  SELECT d.source, p.doc_id, p.n_tokens,
         CAST((p.raw_margin + 1000 * p.n_tokens) * {MICRO}
              // (1000 * p.n_tokens) - {MICRO} AS BIGINT) AS margin_micro
  FROM per_doc p JOIN documents d USING (doc_id)
)
SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, margin_micro,
       n_tokens
FROM (
  SELECT *, row_number() OVER (PARTITION BY source
      ORDER BY margin_micro DESC, doc_id ASC) AS rank
  FROM keyed
) WHERE rank <= {_Q281_K}
"""


# ---------------------------------------------------------------------------
# q282 near-dup representative policy audit
# ---------------------------------------------------------------------------

def q282_rep_policy_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which survivor does dedup KEEP? Compare the two standard
    representative policies over the same near-dup clusters (q33
    candidates -> CC): ``min_doc`` (the deterministic default every
    store in this repo uses) vs ``best_quality`` (max quality-model
    margin, doc_id tiebreak). One row per policy: kept-doc count
    (identical by construction — one rep per cluster plus all
    unclustered docs), kept token mass, and the mean kept margin —
    the measurement that tells a curation team what the cheap
    min_doc convention costs in retained quality.

    100 TB shape: clusters ride the certified banded path + CC; the
    best-quality rep is a per-cluster ARGMAX — an aggregate
    (max_by over a (margin, -doc_id) struct comparator, the q257
    lesson), never a per-cluster sort window; kept sets are
    anti/semi joins on the doc partitioning; means use the
    positive-offset integer trick (margin_micro in [-1e6, 1e6] is
    offset by +1e6 before the div)."""
    from synthea_etl_spark.operators.dedup import connected_components
    from synthea_etl_spark.operators.retrieval import quality_model_score
    from synthea_etl_spark.plans.llm import q33_minhash_lsh_candidates

    d = load(spark, sf_dir, "documents")
    # the scored frame feeds member + both policies' kept aggregates
    # (3+ consumers): eager checkpoint so the explode-scan scoring
    # pass runs once (the q278 lazy-cache lesson)
    scored = (
        quality_model_score(d, "text", "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.expr(
                f"(raw_margin + 1000 * n_tokens) * {MICRO}"
                f" div (1000 * n_tokens) - {MICRO}"
            ).cast("long").alias("margin_micro"),
        )
        .localCheckpoint()
    )
    pairs = q33_minhash_lsh_candidates(spark, sf_dir).localCheckpoint()
    comp = connected_components(pairs)
    member = comp.join(
        scored, comp["id"] == scored["doc_id"]
    ).select("cluster_id", "doc_id", "margin_micro", "n_tokens")

    # r15 optimization (guide §2.4, §1.2): the first cut ran, PER
    # POLICY, a cluster aggregate + a member-vs-reps anti-join + a
    # corpus-sized scored-vs-dropped anti-join + a full kept
    # aggregate — 4 doc-keyed joins and 2 corpus aggregates total.
    # kept = scored \ dropped and dropped ⊆ member, so kept totals
    # are CORPUS TOTALS minus DROPPED totals (exact int64 sums);
    # both policies' reps come from ONE cluster aggregate, dropped
    # stats for both from ONE join of member back to it (cluster-
    # keyed, the partitioning the aggregate just produced) + ONE
    # aggregate. Proven equivalent: a cluster's dropped set under a
    # policy is exactly its members minus its (always-member) rep,
    # and sums/counts are additive over the partition.
    reps = member.groupBy("cluster_id").agg(
        F.min("doc_id").alias("rep_min"),
        F.max_by(
            "doc_id",
            F.struct(F.col("margin_micro"), (-F.col("doc_id")).alias("nid")),
        ).alias("rep_q"),
    )
    dropped = (
        member.join(reps, "cluster_id")
        .select(
            "doc_id",
            "margin_micro",
            "n_tokens",
            (F.col("doc_id") != F.col("rep_min")).alias("_d_min"),
            (F.col("doc_id") != F.col("rep_q")).alias("_d_q"),
        )
        .agg(
            F.sum(F.col("_d_min").cast("long")).alias("n_min"),
            F.sum(F.when(F.col("_d_min"), F.col("n_tokens"))).alias("t_min"),
            F.sum(F.when(F.col("_d_min"), F.col("margin_micro"))).alias(
                "m_min"
            ),
            F.sum(F.col("_d_q").cast("long")).alias("n_q"),
            F.sum(F.when(F.col("_d_q"), F.col("n_tokens"))).alias("t_q"),
            F.sum(F.when(F.col("_d_q"), F.col("margin_micro"))).alias("m_q"),
        )
    )
    totals = scored.agg(
        F.count("*").cast("long").alias("n_all"),
        F.sum("n_tokens").cast("long").alias("t_all"),
        F.sum("margin_micro").cast("long").alias("m_all"),
    )

    def kept_row(policy: str, nd, td, md) -> DataFrame:
        kept_n = F.col("n_all") - F.coalesce(nd, F.lit(0)).cast("long")
        kept_t = F.col("t_all") - F.coalesce(td, F.lit(0)).cast("long")
        kept_m = F.col("m_all") - F.coalesce(md, F.lit(0)).cast("long")
        return (
            totals.crossJoin(F.broadcast(dropped))
            .select(
                F.lit(policy).alias("policy"),
                kept_n.cast("long").alias("n_kept"),
                kept_t.cast("long").alias("tokens_kept"),
                kept_m.cast("long").alias("_m_kept"),
            )
            # same exact-integer mean as the first cut: non-negative
            # offset numerator, integer `div` (== floor there)
            .select(
                "policy",
                "n_kept",
                "tokens_kept",
                F.expr(
                    f"(_m_kept + {MICRO} * n_kept) div n_kept - {MICRO}"
                ).cast("long").alias("mean_margin_kept_micro"),
            )
        )

    return kept_row(
        "min_doc", F.col("n_min"), F.col("t_min"), F.col("m_min")
    ).unionByName(
        kept_row("best_quality", F.col("n_q"), F.col("t_q"), F.col("m_q"))
    )


def _oracle_q282() -> str:
    from synthea_etl_spark.plans.llm import _sql_minhash_oracle

    return f"""
WITH RECURSIVE cand AS ({_sql_minhash_oracle().strip()}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM cand
  UNION ALL SELECT id_b, id_a FROM cand
),
reach(id, label) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id
),
comp AS (SELECT id, MIN(label) AS cluster_id FROM reach GROUP BY id),
tok AS (
  SELECT doc_id, UNNEST(string_split_regex(trim(text), '\\s+')) AS t
  FROM documents WHERE length(trim(text)) > 0
),
wt AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w' || CAST(
             CAST(concat('0x', substr(md5('q' || t), 1, 8)) AS BIGINT)
               % 4096 AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w
  FROM tok
),
scored AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST((SUM(w) + 1000 * COUNT(*)) * {MICRO}
              // (1000 * COUNT(*)) - {MICRO} AS BIGINT) AS margin_micro
  FROM wt GROUP BY doc_id
),
member AS (
  SELECT c.cluster_id, s.doc_id, s.margin_micro
  FROM comp c JOIN scored s ON c.id = s.doc_id
),
reps AS (
  SELECT 'min_doc' AS policy, cluster_id,
         MIN(doc_id) AS rep
  FROM member GROUP BY cluster_id
  UNION ALL
  SELECT 'best_quality' AS policy, cluster_id, rep FROM (
    SELECT cluster_id, doc_id AS rep,
           row_number() OVER (PARTITION BY cluster_id
               ORDER BY margin_micro DESC, doc_id ASC) AS rn
    FROM member
  ) WHERE rn = 1
),
dropped AS (
  SELECT p.policy, m.doc_id
  FROM (VALUES ('min_doc'), ('best_quality')) p(policy)
  JOIN member m ON TRUE
  LEFT JOIN reps r ON r.policy = p.policy AND r.rep = m.doc_id
  WHERE r.rep IS NULL
)
SELECT policy, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_kept,
       CAST((SUM(margin_micro) + {MICRO} * COUNT(*))
            // COUNT(*) - {MICRO} AS BIGINT) AS mean_margin_kept_micro
FROM (
  SELECT p.policy, s.doc_id, s.n_tokens, s.margin_micro
  FROM (VALUES ('min_doc'), ('best_quality')) p(policy)
  CROSS JOIN scored s
  LEFT JOIN dropped d ON d.policy = p.policy AND d.doc_id = s.doc_id
  WHERE d.doc_id IS NULL
)
GROUP BY policy
"""


# ---------------------------------------------------------------------------
# q283 token-budget forecast with PROVEN bounds from the log-bin hist
# ---------------------------------------------------------------------------

_Q283_BUDGET = 20_000


def q283_budget_forecast_bounds(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Capacity planning from the length-histogram representation
    (family 10): per source, how many shortest-first documents fit a
    fixed token budget? The histogram answers with PROVEN bounds —
    every doc in bin b has lb(b) <= tokens <= lb(b) + lb(b) div 8
    (q266's verified one-bin guarantee), so an ascending-bin walk
    with partial-boundary-bin division yields fit_min (certain to
    fit: charged at the UPPER per-doc mass) and fit_max (charged at
    the LOWER mass). ``bound_ok`` verifies fit_min <= fit_exact <=
    fit_max in-result against the exact shortest-first packing (the
    q255 discipline). Bins are value-disjoint and ascending, so the
    exact packing is a prefix of the bin order — the bound argument
    is exact, not heuristic.

    100 TB shape: the production path is STORE-SIZED — one histogram
    aggregate (or the maintained store's totals), a per-source
    cumulative walk over ~80 bins, integer division for the boundary
    bin. The exact side here is the gate-scale measurement twin the
    bound replaces (a per-source sort of every document)."""
    import synthea_etl_spark.operators.text as T
    from synthea_etl_spark.operators.dedup import (
        _LOG_BIN_LB_SQL,
        length_hist_slice,
    )

    d = load(spark, sf_dir, "documents")
    hist = length_hist_slice(d)
    lb = F.expr(_LOG_BIN_LB_SQL.format(b="b")).cast("long")
    w = (
        Window.partitionBy("source")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    B = _Q283_BUDGET
    binned = (
        hist.select("source", "b", "c", lb.alias("lb"))
        .withColumn("ub", F.col("lb") + F.expr("lb div 8"))
        .withColumn("cum_docs_prev", F.coalesce(F.sum("c").over(w), F.lit(0)))
        .withColumn(
            "cum_lb_prev",
            F.coalesce(F.sum(F.col("c") * F.col("lb")).over(w), F.lit(0)),
        )
        .withColumn(
            "cum_ub_prev",
            F.coalesce(F.sum(F.col("c") * F.col("ub")).over(w), F.lit(0)),
        )
    )
    fit = binned.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_docs"),
        F.max(
            F.col("cum_docs_prev")
            + F.least(
                F.col("c"),
                F.greatest(
                    F.lit(0),
                    F.expr(f"({B} - cum_ub_prev) div ub"),
                ),
            )
        ).cast("long").alias("fit_min"),
        F.max(
            F.col("cum_docs_prev")
            + F.least(
                F.col("c"),
                F.greatest(
                    F.lit(0),
                    F.expr(f"({B} - cum_lb_prev) div lb"),
                ),
            )
        ).cast("long").alias("fit_max"),
    )
    base = (
        d.filter(F.length(F.trim("text")) > 0)
        .select(
            "source",
            "doc_id",
            T.token_count("text").cast("long").alias("_n"),
        )
        .filter(F.col("_n") > 0)
    )
    we = (
        Window.partitionBy("source")
        .orderBy("_n", "doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    exact = (
        base.withColumn("_cum", F.sum("_n").over(we))
        .filter(F.col("_cum") <= B)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("fit_exact"))
    )
    return (
        fit.join(exact, "source", "left")
        .fillna(0, subset=["fit_exact"])
        .select(
            "source",
            F.lit(B).cast("long").alias("budget_tokens"),
            "n_docs",
            "fit_min",
            "fit_exact",
            "fit_max",
            (
                (F.col("fit_min") <= F.col("fit_exact"))
                & (F.col("fit_exact") <= F.col("fit_max"))
            ).alias("bound_ok"),
        )
    )


def _oracle_q283() -> str:
    B = _Q283_BUDGET
    # DuckDB spellings of the log-bin and lower-bound expressions
    # (Spark's `div`/`shiftright` are `//`/`>>` there — the q266
    # oracle's idiom)
    bin_sql = (
        "CASE WHEN n < 8 THEN n ELSE (length(bin(n)) - 1) * 8"
        " + ((n >> (length(bin(n)) - 1 - 3)) & 7) END"
    )
    lb_sql = (
        "CASE WHEN b < 8 THEN b"
        " ELSE (8 + (b % 8)) << (b // 8 - 3) END"
    )
    return f"""
WITH base AS (
  SELECT source, doc_id,
         CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n
  FROM documents WHERE length(trim(text)) > 0
),
pos AS (SELECT * FROM base WHERE n > 0),
hist AS (
  SELECT source, CAST({bin_sql} AS BIGINT) AS b,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM pos GROUP BY source, CAST({bin_sql} AS BIGINT)
),
binned AS (
  SELECT source, b, c,
         CAST({lb_sql} AS BIGINT) AS lb,
         CAST({lb_sql} AS BIGINT)
           + CAST({lb_sql} AS BIGINT) // 8 AS ub
  FROM hist
),
cum AS (
  SELECT *,
         COALESCE(SUM(c) OVER (PARTITION BY source ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_docs_prev,
         COALESCE(SUM(c * lb) OVER (PARTITION BY source ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_lb_prev,
         COALESCE(SUM(c * ub) OVER (PARTITION BY source ORDER BY b
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_ub_prev
  FROM binned
),
fit AS (
  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
         CAST(MAX(cum_docs_prev + LEAST(c, GREATEST(0,
             ({B} - cum_ub_prev) // ub))) AS BIGINT) AS fit_min,
         CAST(MAX(cum_docs_prev + LEAST(c, GREATEST(0,
             ({B} - cum_lb_prev) // lb))) AS BIGINT) AS fit_max
  FROM cum GROUP BY source
),
exact AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS fit_exact FROM (
    SELECT source,
           SUM(n) OVER (PARTITION BY source ORDER BY n, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum
    FROM pos
  ) WHERE cum <= {B}
  GROUP BY source
)
SELECT f.source, CAST({B} AS BIGINT) AS budget_tokens, f.n_docs,
       f.fit_min, COALESCE(e.fit_exact, 0) AS fit_exact, f.fit_max,
       f.fit_min <= COALESCE(e.fit_exact, 0)
         AND COALESCE(e.fit_exact, 0) <= f.fit_max AS bound_ok
FROM fit f LEFT JOIN exact e ON f.source = e.source
"""


QUERIES: dict[str, QuerySpec] = {
    "q272_ann_health_verdict": QuerySpec(
        q272_ann_health_verdict,
        ORACLE_Q272,
        "nightly ANN index health monitor: probed-path recall@k vs"
        " exact truth + occupancy/coherence thresholds -> one"
        " integer-exact retrain verdict row",
        ("llm", "similarity", "governance"),
    ),
    "q273_vocab_drift_jaccard": QuerySpec(
        q273_vocab_drift_jaccard,
        ORACLE_Q273,
        "per-language top-V vocabulary Jaccard between reference and"
        " live corpus halves via two-stage grouped top-k",
        ("llm", "text", "governance"),
    ),
    "q274_cluster_source_purity": QuerySpec(
        q274_cluster_source_purity,
        _oracle_q274(),
        "source-span histogram of near-dup clusters -- cross-source"
        " verbatim propagation signal",
        ("llm", "dedup", "governance"),
    ),
    "q275_stopword_quality_bins": QuerySpec(
        q275_stopword_quality_bins,
        ORACLE_Q275,
        "stopword-ratio bins vs mean quality-model margin -- cheap-"
        "signal calibration curve",
        ("llm", "quality", "governance"),
    ),
    "q276_prefix_cache_accounting": QuerySpec(
        q276_prefix_cache_accounting,
        ORACLE_Q276,
        "prefix-cache reuse and exact prefill-tokens-saved at depths"
        " 4/8/16 over the prompt corpus",
        ("llm", "sft", "governance"),
    ),
    "q277_embedding_dim_health": QuerySpec(
        q277_embedding_dim_health,
        ORACLE_Q277,
        "per-dimension embedding audit: exact micro sums, ranges,"
        " dead-dimension flags",
        ("llm", "similarity", "quality"),
    ),
    "q278_bloom_membership_audit": QuerySpec(
        q278_bloom_membership_audit,
        _oracle_q278(),
        "counting-Bloom membership store: zero-false-negative proof"
        " + realized FPR vs exact membership",
        ("llm", "dedup", "streaming"),
    ),
    "q279_bloom_dedup_funnel": QuerySpec(
        q279_bloom_dedup_funnel,
        _oracle_q279(),
        "Bloom-precheck dedup funnel: exact work avoided, precheck"
        " precision, in-result no-escape proof",
        ("llm", "dedup", "streaming"),
    ),
    "q280_bloom_novelty_bounds": QuerySpec(
        q280_bloom_novelty_bounds,
        _oracle_q280(),
        "per-source novelty with a certified Bloom lower bound vs"
        " the exact rate",
        ("llm", "dedup", "governance"),
    ),
    "q281_source_quality_shortlist": QuerySpec(
        q281_source_quality_shortlist,
        ORACLE_Q281,
        "per-source top-k curation shortlist by exact integer quality"
        " margin via skew-free grouped top-k",
        ("llm", "quality", "curation"),
    ),
    "q282_rep_policy_audit": QuerySpec(
        q282_rep_policy_audit,
        _oracle_q282(),
        "near-dup representative policy comparison: min_doc vs"
        " best-quality rep, kept mass and mean margin",
        ("llm", "dedup", "quality"),
    ),
    "q283_budget_forecast_bounds": QuerySpec(
        q283_budget_forecast_bounds,
        _oracle_q283(),
        "per-source shortest-first budget fit with proven histogram"
        " bounds verified against the exact packing",
        ("llm", "governance", "curation"),
    ),
}
