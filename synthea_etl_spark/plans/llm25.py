"""Round-13 LLM-pipeline queries, batch 4: corpus saturation,
packing-strategy economics, and crawl politeness capacity.

- q241 n-gram saturation by ingestion decile (the "will we run out
  of data" measurement, Villalobos et al. 2022; FineWeb's
  diminishing-returns ablation): per decile of the ingestion order,
  how many of its distinct 8-gram observations are NEW to the
  corpus — the curve that says whether the next crawl batch still
  buys novel text.
- q242 packing-strategy economics (Krell et al. 2021, "Efficient
  sequence packing"): per source, the exact cost of the two
  closed-form packing strategies — pad-each-doc-to-a-multiple
  (waste = padding tokens) vs concat-and-chunk (waste = documents
  split across pack boundaries, q97's certified offsets) — the
  table that prices the straddle-vs-padding trade before a
  training run freezes its collator.
- q243 politeness-constrained fetch capacity: HOST-affine
  rendezvous sharding (politeness requires a host to live on one
  fetcher — the q234 evaluator keyed by host instead of URL) plus
  per-shard makespan under per-host crawl delays: a host's fetch
  time is serialized by its delay, hosts within a shard run in
  parallel, so shard makespan = max host time and busy = sum — the
  capacity-planning twin of q228's budget allocation.

Reference scope: beyond-reference extension surface; methods public
(Villalobos 2022; Krell 2021; HRW: Thaler & Ravishankar 1998).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from synthea_etl_spark.operators.dedup import _hex_int, exploded_shingles
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm2 import PACK_BUDGET
from synthea_etl_spark.plans.llm22 import _HRW_SHARDS

MICRO = 1_000_000

_SAT_DECILES = 10
# q242: strategy A pads every document to a multiple of this
_PAD_QUANTUM = 64


def q241_ngram_saturation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-saturation curve: ingestion order = doc_id; decile =
    doc_id * 10 div (max_id + 1). Per decile, distinct (doc, 8-gram)
    observations vs those whose gram is FIRST seen there (first =
    min doc_id over the gram partition — a gram is 'new' exactly
    once, in its first document's decile). novelty_micro falls with
    decile iff the crawl is saturating. Returns (decile, n_gram_obs,
    n_new_grams, novelty_micro).

    100 TB shape: q235's audited subtree — compact-doc repartition,
    distinct (doc, fp) rows, ONE min-window over the fp partition —
    plus a 10-row final aggregate. The 1-row max-id frame crosses in
    as a broadcast (the q72 class)."""
    d = load(spark, sf_dir, "documents")
    tot = d.agg((F.max("doc_id") + 1).cast("long").alias("_m"))
    grams = (
        exploded_shingles(
            d.select("doc_id", "text"), "text", "doc_id", shingle_n=8
        )
        .select("doc_id", _hex_int(F.col("s"), 8).alias("fp"))
        .distinct()
    )
    wf = Window.partitionBy("fp")
    return (
        grams.withColumn("_first", F.min("doc_id").over(wf))
        .crossJoin(F.broadcast(tot))
        .select(
            F.expr(f"doc_id * {_SAT_DECILES} div _m").alias("decile"),
            (F.col("doc_id") == F.col("_first")).alias("_new"),
        )
        .groupBy("decile")
        .agg(
            F.count("*").cast("long").alias("n_gram_obs"),
            F.sum(F.col("_new").cast("long")).cast("long").alias("n_new_grams"),
        )
        .select(
            "decile",
            "n_gram_obs",
            "n_new_grams",
            F.expr(f"n_new_grams * {MICRO} div n_gram_obs").alias(
                "novelty_micro"
            ),
        )
    )


ORACLE_Q241 = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tot AS (SELECT CAST(MAX(doc_id) + 1 AS BIGINT) AS m FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT) AS fp
  FROM (
    SELECT doc_id,
           w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] || ' ' ||
           w[i+4] || ' ' || w[i+5] || ' ' || w[i+6] || ' ' || w[i+7] AS g
    FROM toks, LATERAL (
      SELECT UNNEST(generate_series(1, len(w) - 7)) AS i) u
    WHERE len(w) >= 8
  )
),
flagged AS (
  SELECT doc_id,
         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS is_new
  FROM grams
),
agg AS (
  SELECT doc_id * {_SAT_DECILES} // t.m AS decile,
         CAST(COUNT(*) AS BIGINT) AS n_gram_obs,
         CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_grams
  FROM flagged CROSS JOIN tot t
  GROUP BY 1
)
SELECT decile, n_gram_obs, n_new_grams,
       CAST(n_new_grams * {MICRO} // n_gram_obs AS BIGINT) AS novelty_micro
FROM agg
"""


def q242_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-strategy cost table per source. Strategy A
    (pad-to-{64}): every doc pads to a multiple of the quantum —
    waste is pure arithmetic on token counts. Strategy B
    (concat-and-chunk at {2048}, q97's certified offsets via
    distributed_cumsum): no padding, but a document whose span
    crosses pack boundaries is SPLIT — splits per doc =
    (start + n - 1) div B - start div B for n > 0. Returns (source,
    n_docs, n_tokens, pad_tokens, pad_waste_micro,
    n_boundary_splits, n_split_docs).

    100 TB shape: strategy A is a zero-shuffle projection; strategy
    B reuses the deterministic range-shard cumsum behind q97 (NO
    single-partition window — util.distributed_cumsum) with
    ``source`` CARRIED THROUGH it, so there is no join-back of the
    offsets to the corpus (the first cut joined pack_sequences'
    output on doc_id — a 2×-corpus-rows SMJ shuffle that the
    carry-through removes; same offsets, q97's certified operator
    and arguments). The final grain is source-sized. The
    doc_id-unique precondition is pack_sequences' documented
    contract."""
    from synthea_etl_spark.operators.text import token_count
    from synthea_etl_spark.operators.util import distributed_cumsum

    d = load(spark, sf_dir, "documents")
    # localCheckpoint: distributed_cumsum consumes its input in
    # THREE jobs (order stats, shard totals, local prefix) — without
    # the cut each one replays the tokenize scan (the q226
    # lineage-replay lesson); the counted frame is ~20 B/doc
    counted = d.select(
        "doc_id", "source", token_count("text").cast("long").alias("n_tokens")
    ).localCheckpoint()
    joined = distributed_cumsum(
        counted, "doc_id", "n_tokens", out_col="start_offset", exclusive=True
    )
    splits = F.when(
        F.col("n_tokens") > 0,
        F.expr(
            f"(start_offset + n_tokens - 1) div {PACK_BUDGET}"
            f" - start_offset div {PACK_BUDGET}"
        ),
    ).otherwise(F.lit(0)).cast("long")
    pad = (
        (_PAD_QUANTUM - F.col("n_tokens") % _PAD_QUANTUM) % _PAD_QUANTUM
    ).cast("long")
    return (
        joined.select(
            "source",
            "n_tokens",
            pad.alias("_pad"),
            splits.alias("_splits"),
        )
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            F.sum("_pad").cast("long").alias("pad_tokens"),
            F.sum("_splits").cast("long").alias("n_boundary_splits"),
            F.sum((F.col("_splits") > 0).cast("long"))
            .cast("long")
            .alias("n_split_docs"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "pad_tokens",
            F.expr(
                f"pad_tokens * {MICRO} div (n_tokens + pad_tokens)"
            ).alias("pad_waste_micro"),
            "n_boundary_splits",
            "n_split_docs",
        )
    )


ORACLE_Q242 = f"""
WITH counted AS (
  SELECT doc_id, source,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END
           AS BIGINT) AS n_tokens
  FROM documents
),
offs AS (
  SELECT *,
         CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_offset
  FROM counted
),
per_doc AS (
  SELECT source, n_tokens,
         ({_PAD_QUANTUM} - n_tokens % {_PAD_QUANTUM}) % {_PAD_QUANTUM}
           AS pad,
         CASE WHEN n_tokens > 0
              THEN (start_offset + n_tokens - 1) // {PACK_BUDGET}
                   - start_offset // {PACK_BUDGET}
              ELSE 0 END AS splits
  FROM offs
),
agg AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         CAST(SUM(pad) AS BIGINT) AS pad_tokens,
         CAST(SUM(splits) AS BIGINT) AS n_boundary_splits,
         CAST(SUM(CASE WHEN splits > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_split_docs
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_tokens, pad_tokens,
       CAST(pad_tokens * {MICRO} // (n_tokens + pad_tokens) AS BIGINT)
         AS pad_waste_micro,
       n_boundary_splits, n_split_docs
FROM agg
"""


def q243_politeness_capacity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fetch-capacity planning under politeness: hosts (not URLs —
    a host must live on ONE fetcher for crawl-delay enforcement)
    are HRW-assigned to {8} shards with the q234 evaluator; each
    host's fetch time serializes as n_urls * crawl_delay (delay =
    h % 3 + 1 s, the synthesized tiering), hosts within a shard run
    in parallel. Per shard: host count, URL count, makespan (max
    host time) and busy time (sum) — the imbalance the HRW hash is
    supposed to keep small, now measured exactly.

    100 TB shape: one host-sized aggregate off the corpus scan
    (map-side combined), then the 8-struct HRW argmax and the final
    8-row aggregate both run on the HOST dim — the corpus is
    touched once for URL counts."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = (F.expr("doc_id div 4") % 40).cast("long")
    per_host = (
        docs.select(h.alias("h"))
        .groupBy("h")
        .agg(F.count("*").cast("long").alias("n_urls"))
        .select(
            "h",
            F.concat(F.lit("site"), F.col("h").cast("string"), F.lit(".com"))
            .alias("host"),
            "n_urls",
            (F.col("h") % 3 + 1).cast("long").alias("delay_s"),
        )
    )

    def cand(s: int):
        return F.struct(
            _hex_int(F.concat(F.col("host"), F.lit(f"#{s}")), 8).alias("h"),
            F.lit(s).cast("long").alias("s"),
        )

    shard = F.greatest(*[cand(s) for s in range(_HRW_SHARDS)]).getField("s")
    return (
        per_host.withColumn("shard", shard)
        .withColumn("host_time_s", F.col("n_urls") * F.col("delay_s"))
        .groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_hosts"),
            F.sum("n_urls").cast("long").alias("n_urls"),
            F.max("host_time_s").cast("long").alias("makespan_s"),
            F.sum("host_time_s").cast("long").alias("busy_s"),
        )
    )


def _oracle_q243() -> str:
    hx = "CAST(concat('0x', substr(md5(host || '#' || {s}), 1, 8)) AS BIGINT)"
    lst = ", ".join(
        f"[{hx.format(s=s)}, CAST({s} AS BIGINT)]"
        for s in range(_HRW_SHARDS)
    )
    return f"""
WITH per_host AS (
  SELECT (doc_id // 4) % 40 AS h, CAST(COUNT(*) AS BIGINT) AS n_urls
  FROM documents GROUP BY 1
),
hosts AS (
  SELECT h, 'site' || h || '.com' AS host, n_urls,
         CAST(h % 3 + 1 AS BIGINT) AS delay_s
  FROM per_host
),
assigned AS (
  SELECT *, list_max([{lst}])[2] AS shard,
         n_urls * delay_s AS host_time_s
  FROM hosts
)
SELECT shard,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_urls) AS BIGINT) AS n_urls,
       CAST(MAX(host_time_s) AS BIGINT) AS makespan_s,
       CAST(SUM(host_time_s) AS BIGINT) AS busy_s
FROM assigned GROUP BY shard
"""


QUERIES: dict[str, QuerySpec] = {
    "q241_ngram_saturation": QuerySpec(
        q241_ngram_saturation,
        ORACLE_Q241,
        "corpus 8-gram novelty curve by ingestion decile"
        " (saturation / diminishing-returns measurement)",
        ("llm", "crawl", "dedup"),
    ),
    "q242_packing_efficiency": QuerySpec(
        q242_packing_efficiency,
        ORACLE_Q242,
        "padding-vs-straddle packing cost table per source over"
        " q97's certified offsets",
        ("llm", "curation", "governance"),
    ),
    "q243_politeness_capacity": QuerySpec(
        q243_politeness_capacity,
        _oracle_q243(),
        "host-affine HRW fetch shards: per-shard makespan/busy under"
        " per-host crawl delays",
        ("llm", "crawl", "governance"),
    ),
}
