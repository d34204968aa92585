"""Round-11 LLM-pipeline additions — corpus line-level curation and
crawl governance:

- q212: corpus-frequency BOILERPLATE line removal with text
  reassembly — the CCNet/RefinedWeb step (Wenzek et al. 2019 §4.1;
  Penedo et al. 2023 §3.2): a line that recurs across >= MIN_DOCS
  distinct documents is site boilerplate (nav bars, footers, cookie
  banners) and is removed from EVERY document, and the cleaned
  document text is reassembled in line order. Distinct from q187
  (paragraph dedup elects one winner per duplicate group and counts
  removals): boilerplate removal keeps NO copy and rewrites the
  corpus.
- q213: C4 line-level quality filters (Raffel et al. 2020 §2.2):
  keep lines that end in terminal punctuation, have >= 5 words, and
  contain no blocklisted word; keep the document only if >= 3 lines
  survive. The corpus is punctuation-free word salad, so terminal
  punctuation is synthesized deterministically per line (md5 rule,
  identical in both engines) — the rule logic is fully exercised.
- q214: near-dup LEAKAGE audit across the q211 content-hash split —
  the eval-integrity report every lab runs before trusting a
  held-out set: exact duplicates cannot straddle the split (q211's
  guarantee) but NEAR duplicates can; MinHash/LSH candidate pairs
  (the certified q33 machinery) that connect a train doc to a
  val/test doc are leaks. Per eval doc: distinct train partners +
  leaked flag.
- q215: host reputation / crawl-frontier prioritization — per-host
  doc volume, URL dup-rate (q210's canonicalization), Gopher
  quality share (q188's rule set) and token mass rolled into a
  deterministic tier, the signal a recrawl scheduler consumes.
- q216: crawl snapshot CHURN — previous-vs-current snapshot diff by
  stable key + content fingerprint: new / deleted / changed /
  unchanged per resource, the recrawl-rate input. The corpus has
  one snapshot, so the previous one is synthesized
  deterministically (docstring documents the rule).
- q217: blocklist scoring — category wordlists (severity-weighted)
  evaluated as zero-shuffle array expressions per document; at
  100 TB the blocklist is a broadcast-sized literal and scoring
  never shuffles (the C4 "bad words" filter generalized to
  severity categories).

Beyond-reference surface (the reference's four Glue scripts are
boto3 orchestration — Glue_Scripts/Raw_To_Staging.py:100-180 is the
closest analog, per-row normalize-then-filter). Public knowledge
only: C4 (Raffel et al. 2020), CCNet (Wenzek et al. 2019),
RefinedWeb (Penedo et al. 2023), Gopher (Rae et al. 2021).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm15 import (
    SQL_SPLIT_HV,
    canonical_url,
    split_expr,
    _synth_url,
)

MICRO = 1_000_000

# "Lines": the corpus has no newlines, so a line is a non-overlapping
# 10-token chunk (the q187 _PARA_W convention at line granularity).
_LINE_W = 10
# boilerplate = line recurring in >= MIN_DOCS distinct documents
_MIN_DOCS = 2


def _lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, line_idx, line_tokens, line_text, fp) — one narrow
    no-shuffle explode (chunk_by_tokens is pure codegen)."""
    return T.chunk_by_tokens(
        load(spark, sf_dir, "documents").select("doc_id", "text"),
        window=_LINE_W,
        overlap=0,
    ).select(
        F.col("id").alias("doc_id"),
        F.col("chunk_idx").alias("line_idx"),
        F.col("chunk_tokens").alias("line_tokens"),
        F.col("chunk_text").alias("line_text"),
        F.md5("chunk_text").alias("fp"),
    )


# the shared lines CTE for the oracles (mirrors chunk_by_tokens with
# overlap=0: n_chunks = max(1, ceil(n/W)), slice k covers
# [k*W+1, (k+1)*W] 1-based). The range(200) bound caps the oracle at
# 200 lines = 2000 tokens per document — safe for every TESTDATA SF
# (docs are <= 2048 chars, the ORACLE_Q146 bound, so <= ~400 tokens);
# the engine chunker is unbounded, so a corpus with longer docs needs
# this constant raised or the gates report a (loud) rowcount mismatch
_SQL_LINES = f"""
t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS toks
  FROM documents
),
g AS (
  SELECT doc_id, toks,
         GREATEST(1, CAST(CEIL(len(toks) / {_LINE_W}.0) AS BIGINT))
           AS n_chunks
  FROM t
),
lines AS (
  -- COALESCE: DuckDB array_to_string([]) is NULL, the engine's
  -- array_join([]) is '' (and md5(NULL) would null the join key)
  SELECT doc_id, CAST(k.range AS INTEGER) AS line_idx,
         len(toks[k.range * {_LINE_W} + 1 :
                  k.range * {_LINE_W} + {_LINE_W}]) AS line_tokens,
         COALESCE(array_to_string(
             toks[k.range * {_LINE_W} + 1 :
                  k.range * {_LINE_W} + {_LINE_W}], ' '), '') AS line_text,
         md5(COALESCE(array_to_string(
             toks[k.range * {_LINE_W} + 1 :
                  k.range * {_LINE_W} + {_LINE_W}], ' '), '')) AS fp
  FROM g, range(200) k WHERE k.range < n_chunks
)
"""


# ---------------------------------------------------------------------------
# q212 corpus boilerplate line removal + reassembly
# ---------------------------------------------------------------------------


def q212_boilerplate_line_removal(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Remove every line that occurs in >= MIN_DOCS distinct
    documents (corpus-wide boilerplate — no copy survives, unlike
    q187's winner-keeps dedup) and reassemble each document's
    cleaned text in line order. Returns per doc: line counts, lines
    removed, tokens removed, and the cleaned text.

    100 TB shape: the chunker is a narrow explode; boilerplate
    detection is ONE shuffle on the 16-byte line fingerprint
    (count-distinct-docs, map-side combined via the (fp, doc_id)
    pre-distinct); the verdict rejoins on fp and reassembly is one
    doc_id aggregate with an order-preserving in-group sort
    (array_sort over (line_idx, text) structs — no global sort).
    Nothing ever pairs lines; both shuffles are hash-keyed."""
    lines = _lines(spark, sf_dir)
    freq = (
        lines.select("fp", "doc_id")
        .distinct()
        .groupBy("fp")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    marked = lines.join(freq, "fp").select(
        "doc_id",
        "line_idx",
        "line_tokens",
        "line_text",
        (F.col("n_docs") >= _MIN_DOCS).alias("_boiler"),
    )
    kept_struct = F.when(
        ~F.col("_boiler"), F.struct("line_idx", "line_text")
    )
    return marked.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_boiler").cast("long")).cast("long").alias("n_removed"),
        F.sum(
            F.when(F.col("_boiler"), F.col("line_tokens")).otherwise(F.lit(0))
        )
        .cast("long")
        .alias("tokens_removed"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["line_text"],
            ),
            " ",
        ).alias("clean_text"),
    )


ORACLE_Q212 = f"""
WITH {_SQL_LINES},
freq AS (
  SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM lines GROUP BY fp
),
marked AS (
  SELECT l.*, f.n_docs >= {_MIN_DOCS} AS boiler
  FROM lines l JOIN freq f USING (fp)
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(CASE WHEN boiler THEN line_tokens ELSE 0 END) AS BIGINT)
         AS tokens_removed,
       COALESCE(string_agg(CASE WHEN NOT boiler THEN line_text END,
                           ' ' ORDER BY line_idx), '') AS clean_text
FROM marked GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q213 C4 line-level quality filters
# ---------------------------------------------------------------------------

_LINE_BLOCKLIST = ("dup", "corrupt")
_MIN_LINE_WORDS = 5
_MIN_KEPT_LINES = 3
# deterministic terminal-punctuation synthesis: ~80% of lines "end in
# a period" (md5 of the line fp, identical rule in both engines)
_PUNCT_MOD = 5


def q213_c4_line_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4's line filters (Raffel et al. 2020 §2.2): a line survives
    iff it ends in terminal punctuation, has >= 5 words, and
    contains no blocklisted word; the document survives iff >= 3
    lines do. The corpus is punctuation-free, so the
    terminal-punctuation bit is synthesized per line from its
    fingerprint (hv % 5 < 4 — deterministic, engine == oracle) and
    then the REAL rule (text ends with '.', '!' or '?') runs on the
    synthesized line text. Returns per doc: line counts, kept
    counts, kept tokens, doc_kept.

    100 TB shape: everything up to the final doc_id aggregate is
    zero-shuffle codegen (the chunker explode + per-line boolean
    expressions); one hash aggregate on doc_id ends the plan. The
    blocklist is a literal array — no join, no broadcast needed at
    any scale."""
    lines = _lines(spark, sf_dir)
    hv = F.conv(F.substring(F.md5(F.concat(F.lit("lp"), F.col("fp"))), 1, 8), 16, 10).cast(
        "long"
    )
    synth = F.when(
        hv % _PUNCT_MOD < _PUNCT_MOD - 1,
        F.concat(F.col("line_text"), F.lit(".")),
    ).otherwise(F.col("line_text"))
    # blocklist runs on the ORIGINAL tokens, not the synthesized
    # text: a line-final blocklisted word would otherwise read as
    # 'dup.' and escape the equality check (round-11 self-review)
    toks = F.split(F.col("line_text"), " ")
    block = F.array(*[F.lit(w) for w in _LINE_BLOCKLIST])
    keep = (
        synth.rlike(r"[.!?]$")
        & (F.col("line_tokens") >= _MIN_LINE_WORDS)
        & (F.size(F.array_intersect(toks, block)) == 0)
    )
    per_line = lines.select(
        "doc_id",
        "line_tokens",
        keep.alias("_keep"),
    )
    return per_line.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("_keep"), F.col("line_tokens")).otherwise(F.lit(0)))
        .cast("long")
        .alias("kept_tokens"),
        (
            F.sum(F.col("_keep").cast("long")) >= _MIN_KEPT_LINES
        ).alias("doc_kept"),
    )


ORACLE_Q213 = f"""
WITH {_SQL_LINES},
synth AS (
  SELECT doc_id, line_tokens, line_text,
         CASE WHEN CAST(concat('0x', substr(md5('lp' || fp), 1, 8))
                   AS BIGINT) % {_PUNCT_MOD} < {_PUNCT_MOD - 1}
              THEN line_text || '.' ELSE line_text END AS synth_text
  FROM lines
),
judged AS (
  SELECT doc_id, line_tokens,
         regexp_matches(synth_text, '[.!?]$')
         AND line_tokens >= {_MIN_LINE_WORDS}
         -- blocklist on the ORIGINAL tokens (not the synthesized
         -- text): a line-final 'dup' must not escape as 'dup.'
         AND NOT EXISTS (
           SELECT 1 FROM (SELECT UNNEST(
               string_split(line_text, ' ')) AS w)
           WHERE w IN {_LINE_BLOCKLIST!r}
         ) AS keep
  FROM synth
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN keep THEN line_tokens ELSE 0 END) AS BIGINT)
         AS kept_tokens,
       SUM(CASE WHEN keep THEN 1 ELSE 0 END) >= {_MIN_KEPT_LINES}
         AS doc_kept
FROM judged GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q214 near-dup leakage across the content-hash split
# ---------------------------------------------------------------------------


def q214_split_leakage_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Near-dup leakage report over the q211 split: every val/test
    document with the count of DISTINCT train documents it shares a
    MinHash/LSH band bucket with (the certified q33 candidate
    machinery, 32 perms / 8 bands) and a leaked flag. Exact dups
    cannot straddle (q211 keys the split on the content
    fingerprint); near dups can, and this is the audit that finds
    them before an eval is trusted.

    100 TB shape: one banding pass over the corpus (the persisted
    band index of q158 serves the same pairs incrementally); leak
    pairing is the band-bucket equi-join — never all-pairs; the
    report is one aggregate on the eval doc id plus a right join
    back to the eval side (so clean eval docs report 0)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # localCheckpoint (r15 optimization, guide §1.2/§2.3): `splits`
    # feeds THREE join sides below (sa, sb, eval_docs) and each is a
    # separate plan subtree, so the documents scan + split_expr md5
    # ran three extra times (4 corpus text scans total, read in the
    # captured before-plan). The narrow (doc_id, split) proxy is
    # materialized once; the only remaining corpus text scan is the
    # MinHash banding pass.
    splits = docs.select(
        "doc_id", split_expr("text").alias("split")
    ).localCheckpoint()
    sig = D.minhash_signature(docs, "text", "doc_id", 32, 3)
    pairs = D.lsh_candidates(sig, "doc_id", 32, 8)
    sa = splits.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = splits.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    tagged = pairs.join(sa, "id_a").join(sb, "id_b")
    leaks = (
        tagged.filter(
            (F.col("split_a") == "train") != (F.col("split_b") == "train")
        )
        .select(
            F.when(F.col("split_a") == "train", F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("doc_id"),
            F.when(F.col("split_a") == "train", F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("_train_id"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("_train_id").cast("long").alias("n_train_partners"))
    )
    eval_docs = splits.filter(F.col("split") != "train")
    return eval_docs.join(leaks, "doc_id", "left").select(
        "doc_id",
        "split",
        F.coalesce(F.col("n_train_partners"), F.lit(0))
        .cast("long")
        .alias("n_train_partners"),
        (F.coalesce(F.col("n_train_partners"), F.lit(0)) > 0).alias("leaked"),
    )


def _oracle_q214() -> str:
    from synthea_etl_spark.plans.llm import _sql_minhash_oracle

    return f"""
WITH pairs AS ({_sql_minhash_oracle()}),
splits AS (
  SELECT doc_id,
         CASE WHEN hv < 80 THEN 'train'
              WHEN hv < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM (SELECT doc_id, {SQL_SPLIT_HV} AS hv FROM documents)
),
leaks AS (
  SELECT CASE WHEN a.split = 'train' THEN p.id_b ELSE p.id_a END AS doc_id,
         CAST(COUNT(DISTINCT CASE WHEN a.split = 'train'
                    THEN p.id_a ELSE p.id_b END) AS BIGINT)
           AS n_train_partners
  FROM pairs p
  JOIN splits a ON a.doc_id = p.id_a
  JOIN splits b ON b.doc_id = p.id_b
  WHERE (a.split = 'train') <> (b.split = 'train')
  GROUP BY 1
)
SELECT s.doc_id, s.split,
       COALESCE(l.n_train_partners, 0) AS n_train_partners,
       COALESCE(l.n_train_partners, 0) > 0 AS leaked
FROM splits s LEFT JOIN leaks l USING (doc_id)
WHERE s.split <> 'train'
"""


# ---------------------------------------------------------------------------
# q215 host reputation / crawl-frontier tiers
# ---------------------------------------------------------------------------


def q215_host_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl governance rollup: doc volume, URL duplicate
    rate (1 - distinct canonical URLs / docs, q210's
    canonicalization), Gopher-quality share (q188's composite rule)
    and token mass, reduced to a deterministic crawl-priority tier —
    the table a recrawl scheduler reads. All rates in exact int64
    micro-units.

    100 TB shape: canonicalization + quality + token count are
    zero-shuffle expressions; ONE hash aggregate on host (40 hosts
    here, ~1e6 on a real crawl — either way a map-side-combined
    aggregate with no skew concern because every per-doc row is
    pre-reduced to scalars)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    per_doc = docs.select(
        canonical_url(_synth_url()).alias("curl"),
        F.parse_url(_synth_url(), F.lit("HOST")).alias("_host_raw"),
        T.gopher_quality_ok("text").alias("_ok"),
        T.token_count("text").cast("long").alias("_ntok"),
    ).select(
        F.lower(F.col("_host_raw")).alias("host"),
        "curl",
        "_ok",
        "_ntok",
    )
    agg = per_doc.groupBy("host").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.count_distinct("curl").cast("long").alias("n_resources"),
        F.sum(F.col("_ok").cast("long")).cast("long").alias("n_quality"),
        F.sum("_ntok").cast("long").alias("total_tokens"),
    )
    dup_rate = F.expr(
        f"(n_docs - n_resources) * {MICRO} div n_docs"
    ).cast("long")
    q_share = F.expr(f"n_quality * {MICRO} div n_docs").cast("long")
    return agg.select(
        "host",
        "n_docs",
        "n_resources",
        "total_tokens",
        dup_rate.alias("dup_rate_micro"),
        q_share.alias("quality_share_micro"),
        F.when(
            (q_share >= 600_000) & (dup_rate <= 900_000), F.lit("high")
        )
        .when(q_share >= 400_000, F.lit("medium"))
        .otherwise(F.lit("low"))
        .alias("crawl_tier"),
    )


# gopher_quality_ok in SQL — the exact q188 bound set (integer
# product comparisons; stopword list = text.STOPWORDS_EN)
def _sql_gopher_ok() -> str:
    stops = ", ".join(f"'{w}'" for w in T.STOPWORDS_EN)
    return f"""(
  len(w) >= 50 AND len(w) <= 100000
  AND len(list_filter(w, x -> x <> '')) = len(w)
  AND (SELECT SUM(length(x)) FROM (SELECT UNNEST(w) AS x)) >= 3 * len(w)
  AND (SELECT SUM(length(x)) FROM (SELECT UNNEST(w) AS x)) <= 10 * len(w)
  AND 5 * len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
      >= 4 * len(w)
  AND len(list_filter(w, x -> x IN ({stops}))) >= 2
)"""


def _oracle_q215() -> str:
    # raw URL synthesis + canonicalization mirrors ORACLE_Q210's CTEs
    return f"""
WITH raw AS (
  SELECT doc_id, text,
         CASE doc_id % 4
           WHEN 0 THEN 'https://site' || ((doc_id // 4) % 40) || '.com/p/'
                || ((doc_id // 4) % 10) || '/?a=1&b=2'
           WHEN 1 THEN 'HTTPS://SITE' || ((doc_id // 4) % 40)
                || '.COM:443/p/' || ((doc_id // 4) % 10)
                || '/index.html?b=2&a=1#sec'
           WHEN 2 THEN 'https://site' || ((doc_id // 4) % 40) || '.com/p/'
                || ((doc_id // 4) % 10)
                || '/?utm_source=tw&b=2&a=1&utm_campaign=x'
           ELSE 'https://site' || ((doc_id // 4) % 40) || '.com:8080/p/'
                || ((doc_id // 4) % 10) || '/?a=1&b=2'
         END AS url
  FROM documents
),
parts AS (
  SELECT doc_id, text, url,
         lower(regexp_extract(url, '^([^:]+)://', 1)) AS scheme,
         lower(regexp_extract(url, '^[^:]+://([^/:?#]+)', 1)) AS host,
         regexp_extract(url, '^[^:]+://[^/:?#]+:(\\d+)', 1) AS port,
         regexp_replace(
             regexp_extract(url, '^[^:]+://[^/?#]*(/[^?#]*)', 1),
             '/index\\.html$', '/') AS path,
         regexp_extract(url, '\\?([^#]*)', 1) AS q
  FROM raw
),
canon AS (
  SELECT doc_id, host, scheme || '://' || host ||
         CASE WHEN port = '' OR (scheme = 'http' AND port = '80')
                   OR (scheme = 'https' AND port = '443')
              THEN '' ELSE ':' || port END || path ||
         CASE WHEN qs = '' THEN '' ELSE '?' || qs END AS curl,
         string_split_regex(trim(text), '\\s+') AS w
  FROM (
    SELECT doc_id, text, scheme, host, port, path,
           array_to_string(list_sort(list_filter(string_split(q, '&'),
               x -> x <> '' AND NOT regexp_matches(x, '^utm_'))), '&') AS qs
    FROM parts
  )
),
perdoc AS (
  SELECT doc_id, host, curl,
         {_sql_gopher_ok()} AS ok,
         CAST(len(w) AS BIGINT) AS ntok
  FROM canon
),
agg AS (
  SELECT host,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(COUNT(DISTINCT curl) AS BIGINT) AS n_resources,
         CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
         CAST(SUM(ntok) AS BIGINT) AS total_tokens
  FROM perdoc GROUP BY host
)
SELECT host, n_docs, n_resources, total_tokens,
       (n_docs - n_resources) * {MICRO} // n_docs AS dup_rate_micro,
       n_quality * {MICRO} // n_docs AS quality_share_micro,
       CASE WHEN n_quality * {MICRO} // n_docs >= 600000
                 AND (n_docs - n_resources) * {MICRO} // n_docs <= 900000
            THEN 'high'
            WHEN n_quality * {MICRO} // n_docs >= 400000 THEN 'medium'
            ELSE 'low' END AS crawl_tier
FROM agg
"""


# ---------------------------------------------------------------------------
# q216 crawl snapshot churn
# ---------------------------------------------------------------------------


def q216_snapshot_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Previous-vs-current snapshot diff by stable resource key +
    content fingerprint: new (in current only), deleted (in previous
    only), changed (both, fingerprint differs), unchanged. The
    recrawl-scheduler input (change rate per resource feeds q215's
    tiers). The corpus carries one snapshot, so the previous one is
    synthesized deterministically: resources with doc_id % 7 == 1
    did not exist yet (NEW), % 7 == 5 are absent from the current
    snapshot (DELETED), % 7 in (2, 3) had different content
    (CHANGED — previous text carries a revision marker token);
    everything else is UNCHANGED. In production the key is the
    canonical URL (q210) and the fingerprint the q30 content hash.

    100 TB shape: ZERO shuffles. Both synthetic snapshots derive
    from the same scan and membership is a pure key predicate, so
    the full-outer diff collapses to one projection per row (r15
    optimization, guide §2.4: the first cut self-joined two
    projections of the same scan full-outer on doc_id — two corpus
    scans plus a corpus-wide exchange for a row-local decision; the
    rewrite is proven row-for-row: every doc appears in at least one
    side, 'new'/'deleted' are the membership predicates, and the
    fingerprint comparison only fires when both sides exist). With a
    REAL previous snapshot (a second table) the full-outer equi-join
    on the resource key comes back — that shape is certified by the
    store-diff queries (q178/q193)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.select("doc_id", snapshot_status_expr().alias("status"))


def snapshot_status_expr() -> F.Column:
    """q216's per-row churn verdict as a reusable zero-shuffle
    expression over (doc_id, text) — shared with q219 so the
    recrawl schedule can fuse the churn aggregate into its own
    corpus scan without drifting from the gated q216 definition."""
    fp = T.fingerprint("text")
    in_prev = F.col("doc_id") % 7 != 1
    in_cur = F.col("doc_id") % 7 != 5
    prev_fp = F.when(
        (F.col("doc_id") % 7).isin(2, 3),
        T.fingerprint(F.concat(F.col("text"), F.lit(" rev0marker"))),
    ).otherwise(fp)
    return (
        F.when(~in_prev, F.lit("new"))
        .when(~in_cur, F.lit("deleted"))
        .when(prev_fp != fp, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )


ORACLE_Q216 = r"""
WITH fps AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
         md5(regexp_replace(lower(trim(text || ' rev0marker')),
             '\s+', ' ', 'g')) AS rev_fp
  FROM documents
),
prev AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 IN (2, 3) THEN rev_fp ELSE fp END AS prev_fp
  FROM fps WHERE doc_id % 7 <> 1
),
cur AS (
  SELECT doc_id, fp AS cur_fp FROM fps WHERE doc_id % 7 <> 5
)
SELECT COALESCE(p.doc_id, c.doc_id) AS doc_id,
       CASE WHEN p.doc_id IS NULL THEN 'new'
            WHEN c.doc_id IS NULL THEN 'deleted'
            WHEN p.prev_fp <> c.cur_fp THEN 'changed'
            ELSE 'unchanged' END AS status
FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id
"""


# ---------------------------------------------------------------------------
# q217 blocklist scoring
# ---------------------------------------------------------------------------

_BLOCK_SEVERE = ("dup", "corrupt")  # severity 4
_BLOCK_MILD = ("slow", "big")  # severity 1
_BLOCK_THRESHOLD = 8
# JVM-shape crossover for blocklist scoring, measured at sf10
# (bench_artifacts/q217_shape_crossover_sf10_r12.json): the
# contains-guarded alternation's wall grows with K (java.util.regex
# backtracks over the alternation — O(text*K); at K=1024 the
# 1024-deep boolean gate tree won't even plan), while the explode +
# broadcast-join wall is K-independent (one hash probe per token;
# only HIT tokens reach the shuffle). Below this K the alternation
# wins among JVM shapes; at/above it the join wins. BOTH lose to the
# Arrow/RE2 pass (blocklist_scores shape='arrow', the default):
# RE2 compiles the alternation into a DFA, so its wall is flat in K
# (0.55-0.66 s at sf10 for K=4..4096 vs 1.0 s JVM-alternation at
# K=4 and 2.9-3.3 s join) — within noise of DuckDB's own RE2 wall.
_BLOCK_JOIN_MIN_K = 64


def _wb_alt(words) -> str:
    """Word-boundary alternation over regex-ESCAPED literal terms
    (round-12 ADVICE close: unescaped metacharacters silently changed
    semantics — 'a.b' matched 'aXb'). ``\\b`` is anchored per SIDE,
    only where the term starts/ends with a word character: after a
    non-word char like '+' the anchor would INVERT ("c++ " has no
    boundary between '+' and ' ', so \\bc\\+\\+\\b could never match
    a space-delimited c++). Works identically in java.util.regex and
    RE2 (which has no lookarounds — this per-side rule is the
    RE2-expressible literal-token contract), keeping the JVM and
    Arrow shapes in parity.

    The anchor decision tests ASCII word characters ONLY (round-13
    review): both target engines treat ``\\b``/``\\w`` as ASCII —
    RE2's default and java.util.regex without
    UNICODE_CHARACTER_CLASS — while Python's ``\\w`` is Unicode, so
    deciding with Python's class would anchor 'über' as
    ``\\büber\\b``, a pattern neither engine can ever match at a
    space boundary (silent permanent undercount). A non-ASCII edge
    gets no anchor on that side: substring-at-edges counting,
    identical in both regex shapes."""
    import re

    parts = []
    for w in words:
        p = re.escape(w)
        if re.match(r"[A-Za-z0-9_]", w[:1]):
            p = r"\b" + p
        if re.match(r"[A-Za-z0-9_]", w[-1:]):
            p = p + r"\b"
        parts.append(p)
    return "(" + "|".join(parts) + ")"


def blocklist_wb_count(words, text_col: str = "text") -> F.Column:
    """Occurrence count of a category wordlist as ONE alternation
    regex GUARDED by a literal substring gate: `contains` is a plain
    indexOf scan (~4x cheaper than JVM regex per char), so documents
    containing none of the category's terms — the overwhelming
    majority for a real bad-words list — never pay the regex at all.
    The guard is exact: no substring hit implies zero word-boundary
    hits. (Measured at sf10: tokenize + lambda filters 3.40 s,
    unguarded alternation 1.25 s, guarded 0.87 s with a 5%-selective
    severe gate — the cheap-gate-then-verify discipline of the
    banded near-dup indexes.) Shared by q217 and the q221 feature
    frame so the two can never drift apart.

    Terms are regex-ESCAPED into the alternation (round-12 ADVICE
    close): a term carrying metacharacters ('c++', 'a.b') must count
    as a literal token, matching the `contains` gate and the join
    shape's literal token equality — unescaped it silently became a
    different pattern, breaking the documented three-shape parity
    (:func:`_wb_alt` holds the escaping + per-side anchor rule)."""
    gate = None
    for w in words:
        c = F.contains(F.col(text_col), F.lit(w))
        gate = c if gate is None else (gate | c)
    return (
        F.when(gate, F.regexp_count(text_col, F.lit(_wb_alt(words))))
        .otherwise(F.lit(0))
        .cast("long")
    )


def _blocklist_arrow_counts(severe, mild, text_col: str = "text"):
    """One Arrow pass computing BOTH category occurrence counts with
    RE2 (pyarrow.compute.count_substring_regex): RE2 compiles the
    word-boundary alternation into a DFA, so the scan is O(text)
    regardless of K — java.util.regex backtracks O(text*K). The
    measured-best q217 shape at EVERY K (see _BLOCK_JOIN_MIN_K
    note); the deliberate-Arrow-stage class of q184's dict-counting
    pass. Returns a struct column (hs, hm)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc

    # terms regex-escaped with per-side anchors, same literal-token
    # contract as blocklist_wb_count (round-12 ADVICE close)
    alt_s = _wb_alt(severe)
    alt_m = _wb_alt(mild)

    def cnt(s):
        # NULL text counts as zero hits (matching both JVM shapes,
        # where contains(NULL) gates to 0 and explode(NULL) drops the
        # row) — without the fill the count comes back null->NaN and
        # the int64 cast throws (round-12 review catch). Filled on
        # the pandas side: an ALL-null Arrow batch infers null type,
        # which a string fill_null scalar cannot cast into.
        arr = pa.Array.from_pandas(s.fillna(""), type=pa.string())
        return pd.DataFrame(
            {
                "hs": pc.count_substring_regex(arr, alt_s)
                .to_pandas()
                .astype("int64"),
                "hm": pc.count_substring_regex(arr, alt_m)
                .to_pandas()
                .astype("int64"),
            }
        )

    # real annotation OBJECTS: the module's `from __future__ import
    # annotations` would stringify inline hints, which pandas_udf
    # cannot resolve for the Series -> DataFrame (struct) eval type
    cnt.__annotations__ = {"s": pd.Series, "return": pd.DataFrame}
    udf = F.pandas_udf(cnt, "hs long, hm long")
    return udf(F.col(text_col))


def blocklist_scores(
    docs: DataFrame,
    severe=_BLOCK_SEVERE,
    mild=_BLOCK_MILD,
    threshold: int = _BLOCK_THRESHOLD,
    shape: str | None = None,
) -> DataFrame:
    """Severity-weighted blocklist scoring over (doc_id, text) with
    a MEASURED shape ladder (round-11 VERDICT close; walls in
    bench_artifacts/q217_shape_crossover_sf10_r12.json):

    - ``arrow`` (DEFAULT, every K): one Arrow pass, RE2
      ``count_substring_regex`` on the category alternations — a
      DFA scan, flat in K (sf10: 0.55-0.66 s for K=4..4096, within
      noise of DuckDB's own RE2 wall). Still a pure projection —
      ArrowEvalPython adds no exchange.
    - ``alternation``: contains-guarded word-boundary
      ``regexp_count`` — the best PURE-JVM form (no Python workers
      needed); wall grows with K (java.util.regex backtracks) and
      the boolean gate tree stops planning around K~1000.
    - ``join``: tokenize once, explode, inner broadcast-join the
      (word, category) dim — non-matching tokens die AT the join,
      so the doc_id aggregate shuffles only HIT tokens; the
      regex-FREE fallback (terms with regex metacharacters, or a
      no-regex guarantee). K-independent, q72/q185's plan.
    - ``jvm``: auto-pick between the two JVM shapes at the measured
      ``_BLOCK_JOIN_MIN_K`` crossover.

    PARITY CONTRACT (round-13 review tightened the claim): the two
    REGEX shapes (arrow, alternation) are bit-identical for EVERY
    wordlist — both use :func:`_wb_alt`. The join shape equals them
    only for terms that are pure ASCII word tokens on a
    whitespace-tokenized corpus; a term with a non-word edge counts
    differently by construction (regex: per-side-anchored substring
    occurrences, e.g. 'c++' matches inside 'c++17'; join: whole-token
    equality, so it does not). The ``jvm`` auto-dispatch therefore
    only flips to the join when every term is a pure word token —
    growing a metacharacter-bearing list past the crossover must not
    silently change counts; such lists stay on the alternation (or
    pick ``join`` explicitly to choose token semantics)."""
    import re as _re

    if shape is None:
        shape = "arrow"
    if shape == "jvm":
        k = len(severe) + len(mild)
        pure_tokens = all(
            _re.fullmatch(r"[A-Za-z0-9_]+", w) for w in (*severe, *mild)
        )
        shape = (
            "join" if (k >= _BLOCK_JOIN_MIN_K and pure_tokens) else "alternation"
        )
    if shape == "arrow":
        c = _blocklist_arrow_counts(severe, mild)
        n_sev = c.getField("hs")
        n_mild = c.getField("hm")
        score = (n_sev * 4 + n_mild).cast("long")
        return docs.select(
            "doc_id",
            n_sev.alias("hits_severe"),
            n_mild.alias("hits_mild"),
            score.alias("block_score"),
            ((n_sev > 0) | (score >= threshold)).alias("blocked"),
        )
    if shape == "alternation":
        n_sev = blocklist_wb_count(severe)
        n_mild = blocklist_wb_count(mild)
        score = (n_sev * 4 + n_mild).cast("long")
        return docs.select(
            "doc_id",
            n_sev.alias("hits_severe"),
            n_mild.alias("hits_mild"),
            score.alias("block_score"),
            ((n_sev > 0) | (score >= threshold)).alias("blocked"),
        )
    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(w, "severe") for w in severe] + [(w, "mild") for w in mild],
        "w string, cat string",
    )
    hits = (
        docs.select("doc_id", F.explode(T.tokens("text")).alias("w"))
        .join(F.broadcast(dim), "w")  # non-hits die here, pre-shuffle
        .groupBy("doc_id")
        .agg(
            F.sum((F.col("cat") == "severe").cast("long"))
            .cast("long")
            .alias("_sev"),
            F.sum((F.col("cat") == "mild").cast("long"))
            .cast("long")
            .alias("_mild"),
        )
    )
    n_sev = F.coalesce(F.col("_sev"), F.lit(0)).cast("long")
    n_mild = F.coalesce(F.col("_mild"), F.lit(0)).cast("long")
    score = (n_sev * 4 + n_mild).cast("long")
    # no broadcast hint on hits: it is doc-cardinality in the worst
    # case (every doc a hit) and a forced hint removes the shuffle
    # fallback — the drift_from_token_store lesson; AQE broadcasts it
    # when the measured size allows
    return (
        docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n_sev.alias("hits_severe"),
            n_mild.alias("hits_mild"),
            score.alias("block_score"),
            ((n_sev > 0) | (score >= threshold)).alias("blocked"),
        )
    )


def q217_blocklist_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Severity-weighted blocklist scoring (the C4 bad-words filter
    generalized): per document, OCCURRENCE counts against two
    category wordlists, a weighted score (4x severe + 1x mild), and
    a blocked verdict (any severe hit, or score >= 8). Wordlists
    here are corpus-vocabulary stand-ins; the operator shape is the
    real one — :func:`blocklist_scores` on its default ``arrow``
    shape (one RE2 Arrow pass, flat in K, 0.50 s at sf10 vs
    DuckDB's 0.44), with the pure-JVM alternation and the regex-free
    join shape as measured alternatives; see its docstring and
    bench_artifacts/q217_shape_crossover_sf10_r12.json."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return blocklist_scores(docs)


# oracle twins share _wb_alt (round-13 review: the round-12 escaping
# fix originally reached only the query side, so any wordlist change
# beyond the current ASCII terms would have broken the gate instead
# of being covered by it). DuckDB regular string literals do not
# process backslashes, so the pattern interpolates verbatim; embedded
# single quotes are SQL-doubled.
def _sql_wb(words) -> str:
    pat = _wb_alt(words).replace("'", "''")
    return f"len(regexp_extract_all(text, '{pat}'))"


_SQL_WB = _sql_wb(_BLOCK_SEVERE)
_SQL_WB_MILD = _sql_wb(_BLOCK_MILD)

ORACLE_Q217 = f"""
WITH t AS (
  SELECT doc_id,
         CAST({_SQL_WB} AS BIGINT) AS hits_severe,
         CAST({_SQL_WB_MILD} AS BIGINT) AS hits_mild
  FROM documents
)
SELECT doc_id, hits_severe, hits_mild,
       CAST(4 * hits_severe + hits_mild AS BIGINT) AS block_score,
       hits_severe > 0
       OR 4 * hits_severe + hits_mild >= {_BLOCK_THRESHOLD} AS blocked
FROM t
"""


QUERIES: dict[str, QuerySpec] = {
    "q212_boilerplate_line_removal": QuerySpec(
        q212_boilerplate_line_removal,
        ORACLE_Q212,
        "corpus-frequency boilerplate line removal with cleaned-text"
        " reassembly (CCNet/RefinedWeb)",
        ("llm", "dedup", "curation"),
    ),
    "q213_c4_line_filters": QuerySpec(
        q213_c4_line_filters,
        ORACLE_Q213,
        "C4 line-level quality filters + >=3-kept-lines doc survival",
        ("llm", "quality"),
    ),
    "q214_split_leakage_audit": QuerySpec(
        q214_split_leakage_audit,
        _oracle_q214(),
        "near-dup (MinHash/LSH) leakage audit across the"
        " content-hash train/val/test split",
        ("llm", "dedup", "governance"),
    ),
    "q215_host_reputation": QuerySpec(
        q215_host_reputation,
        _oracle_q215(),
        "per-host crawl reputation: dup rate + Gopher-quality share"
        " -> crawl tier",
        ("llm", "crawl", "governance"),
    ),
    "q216_snapshot_churn": QuerySpec(
        q216_snapshot_churn,
        ORACLE_Q216,
        "crawl snapshot diff: new/deleted/changed/unchanged by"
        " content fingerprint",
        ("llm", "crawl"),
    ),
    "q217_blocklist_scores": QuerySpec(
        q217_blocklist_scores,
        ORACLE_Q217,
        "severity-weighted blocklist scoring, zero-shuffle literal"
        " wordlists",
        ("llm", "quality"),
    ),
}
