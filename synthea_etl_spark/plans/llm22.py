"""Round-13 LLM-pipeline queries, batch 1: SFT/instruction-data
curation and crawl-infrastructure assignment.

- q232 turn structure: structural QA over chat-style training
  records (role alternation, per-role token budgets, well-formedness
  verdict) — the validation pass every SFT pipeline runs before
  template rendering. Conversations are derived deterministically
  from the document token stream (8-token turns, user/assistant
  alternating) so the oracle can rebuild them bit-for-bit.
- q233 prompt-key dedup: near-dup grouping by the normalized PROMPT
  (first turn) rather than the whole record — the standard SFT
  dedup axis (duplicate prompts with different responses leak eval
  prompts and skew loss weighting). Window-over-key shape (the q210
  lesson: one exchange, no join-back).
- q234 rendezvous (HRW) crawl sharding: highest-random-weight
  assignment of URLs to fetcher shards (Thaler & Ravishankar 1998)
  plus the minimal-disruption property under one shard failure,
  verified exactly per URL: keys move ONLY off the failed shard.
- q235 memorization risk: per-document fraction of its distinct
  8-gram fingerprints that recur in other documents (Carlini et al.
  2022, "Quantifying Memorization": duplicated spans dominate
  extractable memorization; Lee et al. 2021 motivates the 8-gram
  granularity). Corpus-frequency window over the fingerprint
  partition, then a per-doc aggregate.

Reference scope: beyond-reference extension surface; methods public
(HRW: Thaler & Ravishankar 1998; memorization: Carlini et al. 2022 /
Lee et al. 2021; SFT dedup practice: Ouyang et al. 2022 appendix).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.dedup import (
    PROMPT_KEY_TOKENS,
    _hex_int,
    exploded_shingles,
)
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000

# conversation derivation: fixed-width turns over the token stream,
# roles alternating user/assistant starting at user. The turn width
# IS the prompt-key length (the prompt is the first turn), and the
# prompt-key length is the STORE family's contract constant — one
# name, so the q233 batch query, q240's store path, and
# pipeline.prompt_key_ingest_stream can never disagree (round-13
# review close).
_TURN_TOKENS = PROMPT_KEY_TOKENS
_PROMPT_TOKENS = PROMPT_KEY_TOKENS
# q234: fetcher fleet size and the shard whose failure we replay
_HRW_SHARDS = 8
_HRW_FAILED = 3
# q235: a gram is risky when it appears in >= this many docs; a doc
# is at risk when >= 5% of its grams are risky
_MEM_MIN_DOCS = 2
_MEM_RISK_MICRO = 50_000

# SQL twin of T.tokens over ALL docs (SQL_TOKS in plans.llm drops
# empty-text rows; q232 must keep them as zero-turn records)
_SQL_ALL_TOKS = r"""
toks AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []::VARCHAR[]
              ELSE string_split_regex(trim(text), '\s+') END AS w
  FROM documents
)
"""


def q232_turn_structure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chat-record structural QA: token stream chunked into 8-token
    turns, roles alternating user-first. Per record: turn count,
    per-role token budgets (closed form — no explode), end-role and
    well-formedness verdicts (>= 2 turns, ends on assistant), and a
    per-role transcript hash built by an index-filtered token slice.

    100 TB shape: ZERO shuffles — pure per-row projection. The
    per-role budgets are integer arithmetic on token_count (a full
    user+assistant round is 16 tokens; the remainder splits
    min(rem, 8) / max(rem - 8, 0)), so the corpus is scanned once
    with no exploded intermediate. The role-hash lambda filters run
    interpreted per row (Spark higher-order functions), bounded by
    tokens-per-doc — fine for a scan; the hot arithmetic stays in
    codegen."""
    d = load(spark, sf_dir, "documents")
    w = T.tokens("text")
    n_turns = F.expr(f"(size(_w) + {_TURN_TOKENS - 1}) div {_TURN_TOKENS}")
    n_user = (
        F.expr(f"(size(_w) div {2 * _TURN_TOKENS}) * {_TURN_TOKENS}")
        + F.least(
            F.expr(f"size(_w) % {2 * _TURN_TOKENS}"), F.lit(_TURN_TOKENS)
        ).cast("long")
    ).cast("long")
    # (i div 8) % 2 == p  <=>  i % 16 < 8 (p=0) / >= 8 (p=1): pure
    # integer modulo, no division-then-truncate subtleties
    role_text = {
        "user": F.concat_ws(
            " ",
            F.filter(
                F.col("_w"),
                lambda x, i: i % (2 * _TURN_TOKENS) < _TURN_TOKENS,
            ),
        ),
        "assistant": F.concat_ws(
            " ",
            F.filter(
                F.col("_w"),
                lambda x, i: i % (2 * _TURN_TOKENS) >= _TURN_TOKENS,
            ),
        ),
    }
    out = d.select("doc_id", w.alias("_w")).select(
        "doc_id",
        F.size("_w").cast("long").alias("n_tokens"),
        n_turns.cast("long").alias("n_turns"),
        n_user.alias("n_user_tokens"),
        (F.size("_w").cast("long") - n_user).alias("n_asst_tokens"),
        ((n_turns > 0) & (n_turns % 2 == 0)).alias("ends_on_assistant"),
        ((n_turns >= 2) & (n_turns % 2 == 0)).alias("well_formed"),
        F.md5(role_text["user"]).alias("user_md5"),
        F.md5(role_text["assistant"]).alias("asst_md5"),
    )
    return out


ORACLE_Q232 = f"""
WITH {_SQL_ALL_TOKS},
s AS (
  SELECT doc_id,
         CAST(len(w) AS BIGINT) AS n_tokens,
         CAST((len(w) + {_TURN_TOKENS - 1}) // {_TURN_TOKENS} AS BIGINT)
           AS n_turns,
         CAST((len(w) // {2 * _TURN_TOKENS}) * {_TURN_TOKENS}
              + least(len(w) % {2 * _TURN_TOKENS}, {_TURN_TOKENS})
           AS BIGINT) AS n_user_tokens,
         COALESCE(array_to_string(list_filter(
             w, (x, i) -> (i - 1) % {2 * _TURN_TOKENS} < {_TURN_TOKENS}),
             ' '), '') AS user_text,
         COALESCE(array_to_string(list_filter(
             w, (x, i) -> (i - 1) % {2 * _TURN_TOKENS} >= {_TURN_TOKENS}),
             ' '), '') AS asst_text
  FROM toks
)
SELECT doc_id, n_tokens, n_turns, n_user_tokens,
       n_tokens - n_user_tokens AS n_asst_tokens,
       n_turns > 0 AND n_turns % 2 = 0 AS ends_on_assistant,
       n_turns >= 2 AND n_turns % 2 = 0 AS well_formed,
       md5(user_text) AS user_md5,
       md5(asst_text) AS asst_md5
FROM s
"""


def q233_prompt_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prompt-key dedup for instruction data: records sharing the
    same normalized FIRST TURN (first {8} tokens) form a cluster;
    each cluster elects its min-doc_id representative. Returns
    (doc_id, pkey, cluster_n, is_rep, rep_doc_id) for every record
    with a non-empty prompt.

    100 TB shape: ONE exchange — the pkey hash partition — with both
    the cluster size and the representative computed as windows over
    that partition (round-12 lesson: min-over-partition beats
    groupBy + join-back 3x; the exchange moves (doc_id, 32-char key)
    rows only, never text)."""
    d = load(spark, sf_dir, "documents")
    prompt = F.concat_ws(" ", F.slice(T.tokens("text"), 1, _PROMPT_TOKENS))
    keyed = d.filter(T.token_count("text") > 0).select(
        "doc_id", F.md5(prompt).alias("pkey")
    )
    wk = Window.partitionBy("pkey")
    return keyed.select(
        "doc_id",
        "pkey",
        F.count(F.lit(1)).over(wk).cast("long").alias("cluster_n"),
        (F.col("doc_id") == F.min("doc_id").over(wk)).alias("is_rep"),
        F.min("doc_id").over(wk).cast("long").alias("rep_doc_id"),
    )


ORACLE_Q233 = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
keyed AS (
  SELECT doc_id,
         md5(array_to_string(w[1:{_PROMPT_TOKENS}], ' ')) AS pkey
  FROM toks
)
SELECT doc_id, pkey,
       CAST(COUNT(*) OVER (PARTITION BY pkey) AS BIGINT) AS cluster_n,
       doc_id = MIN(doc_id) OVER (PARTITION BY pkey) AS is_rep,
       CAST(MIN(doc_id) OVER (PARTITION BY pkey) AS BIGINT) AS rep_doc_id
FROM keyed
"""


def q234_hrw_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rendezvous (highest-random-weight) sharding of crawl URLs
    across {8} fetcher shards, plus an exact replay of one shard
    failing: every URL scores each shard with
    hex8(md5(url '#' shard)) and is owned by the argmax (ties to the
    higher shard id — struct max). ``shard_after`` recomputes the
    argmax with shard {3} removed; HRW's minimal-disruption property
    (only the failed shard's keys move, each to its second-choice
    shard) is returned as a per-URL boolean the gate checks exactly.

    100 TB shape: ZERO shuffles, zero joins — the 8 candidate
    (hash, shard) structs are built as literal columns and reduced
    with ``greatest``, all inside whole-stage codegen (the q231
    lesson: per-row construction of small candidate sets beats a
    broadcast dim probe). A real frontier keyed by billions of URLs
    runs this as a projection during partition assignment."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = (F.expr("doc_id div 4") % 40).cast("long")
    url = F.concat(
        F.lit("site"),
        h.cast("string"),
        F.lit(".com/p/"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit("/"),
    )

    def cand(s: int):
        return F.struct(
            _hex_int(F.concat(url, F.lit(f"#{s}")), 8).alias("h"),
            F.lit(s).cast("long").alias("s"),
        )

    all_c = [cand(s) for s in range(_HRW_SHARDS)]
    alive_c = [cand(s) for s in range(_HRW_SHARDS) if s != _HRW_FAILED]
    shard = F.greatest(*all_c).getField("s")
    shard_after = F.greatest(*alive_c).getField("s")
    return docs.select(
        "doc_id",
        url.alias("url"),
        shard.alias("shard"),
        shard_after.alias("shard_after"),
        (shard != shard_after).alias("moved"),
        # HRW invariant, gate-checked per URL: a key moves iff its
        # owner failed
        ((shard != shard_after) == (shard == _HRW_FAILED)).alias(
            "minimal_disruption"
        ),
    )


def _oracle_q234() -> str:
    hx = "CAST(concat('0x', substr(md5(url || '#' || {s}), 1, 8)) AS BIGINT)"
    all_l = ", ".join(
        f"[{hx.format(s=s)}, CAST({s} AS BIGINT)]"
        for s in range(_HRW_SHARDS)
    )
    alive_l = ", ".join(
        f"[{hx.format(s=s)}, CAST({s} AS BIGINT)]"
        for s in range(_HRW_SHARDS)
        if s != _HRW_FAILED
    )
    return f"""
WITH d AS (
  SELECT doc_id,
         'site' || ((doc_id // 4) % 40) || '.com/p/' ||
         CAST(doc_id % 10 AS VARCHAR) || '/' AS url
  FROM documents
),
picked AS (
  SELECT doc_id, url,
         list_max([{all_l}])[2] AS shard,
         list_max([{alive_l}])[2] AS shard_after
  FROM d
)
SELECT doc_id, url, shard, shard_after,
       shard <> shard_after AS moved,
       (shard <> shard_after) = (shard = {_HRW_FAILED})
         AS minimal_disruption
FROM picked
"""


def q235_memorization_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Memorization-risk scoring: per document, the fraction of its
    DISTINCT 8-gram fingerprints that occur in >= {2} documents
    corpus-wide (duplicated spans dominate extractable memorization
    — Carlini et al. 2022; Lee et al. 2021). Returns (doc_id,
    n_grams, n_risky, risk_micro, at_risk) for every doc with at
    least one full 8-gram.

    100 TB shape: exploded_shingles pre-partitions the COMPACT docs
    by doc_id (the shuffle moves text, not grams), the corpus
    frequency is a count window over the fp partition (distinct
    (doc, fp) rows — bounded by corpus grams, no pair join), and the
    final aggregate shuffles (doc_id, flag) pairs. No quadratic
    surface anywhere: this is the linear-scan risk REPORT, not a
    span-pair listing (q163's job)."""
    d = load(spark, sf_dir, "documents")
    grams = (
        exploded_shingles(
            d.select("doc_id", "text"), "text", "doc_id", shingle_n=8
        )
        .select("doc_id", _hex_int(F.col("s"), 8).alias("fp"))
        .distinct()
    )
    wf = Window.partitionBy("fp")
    flagged = grams.select(
        "doc_id",
        (F.count(F.lit(1)).over(wf) >= _MEM_MIN_DOCS).alias("risky"),
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.col("risky").cast("long")).cast("long").alias("n_risky"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_risky",
            F.expr(f"n_risky * {MICRO} div n_grams").alias("risk_micro"),
            (
                F.expr(f"n_risky * {MICRO} div n_grams") >= _MEM_RISK_MICRO
            ).alias("at_risk"),
        )
    )


def _oracle_q235() -> str:
    g = " || ' ' || ".join(f"w[i+{j}]" for j in range(8)).replace(
        "w[i+0]", "w[i]"
    )
    h = "CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)"
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
grams AS (
  SELECT DISTINCT doc_id, {h} AS fp
  FROM (
    SELECT doc_id, {g} AS g
    FROM toks, LATERAL (
      SELECT UNNEST(generate_series(1, len(w) - 7)) AS i) u
    WHERE len(w) >= 8
  )
),
flagged AS (
  SELECT doc_id,
         COUNT(*) OVER (PARTITION BY fp) >= {_MEM_MIN_DOCS} AS risky
  FROM grams
),
agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_grams,
         CAST(SUM(CASE WHEN risky THEN 1 ELSE 0 END) AS BIGINT) AS n_risky
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, n_grams, n_risky,
       CAST(n_risky * {MICRO} // n_grams AS BIGINT) AS risk_micro,
       n_risky * {MICRO} // n_grams >= {_MEM_RISK_MICRO} AS at_risk
FROM agg
"""


QUERIES: dict[str, QuerySpec] = {
    "q232_turn_structure": QuerySpec(
        q232_turn_structure,
        ORACLE_Q232,
        "SFT chat-record structural QA: turn counts, per-role token"
        " budgets and transcript hashes, well-formedness verdict",
        ("llm", "curation", "sft"),
    ),
    "q233_prompt_dedup": QuerySpec(
        q233_prompt_dedup,
        ORACLE_Q233,
        "prompt-key dedup for instruction data (window-over-key"
        " cluster + representative)",
        ("llm", "dedup", "sft"),
    ),
    "q234_hrw_shards": QuerySpec(
        q234_hrw_shards,
        _oracle_q234(),
        "rendezvous-hash URL->fetcher sharding with exact"
        " minimal-disruption replay of a shard failure",
        ("llm", "crawl", "governance"),
    ),
    "q235_memorization_risk": QuerySpec(
        q235_memorization_risk,
        _oracle_q235(),
        "per-doc duplicated-8-gram memorization risk fraction"
        " (corpus-frequency window)",
        ("llm", "dedup", "quality"),
    ),
}
