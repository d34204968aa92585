"""Round-13 LLM-pipeline queries, batch 6: character-level quality
signals, PII auditing, and dedup-aware governance.

- q246 char-entropy quality: per-doc Shannon character entropy,
  top-character fraction and distinct-char count — the
  compression-proxy quality signal every web-curation pipeline
  carries (low entropy = boilerplate/padding spam; RedPajama-v2 and
  Gopher both publish symbol/character-distribution rules). Exact
  int64 via the per-distinct-count quantization discipline.
- q247 PII Luhn audit: candidate card numbers extracted by pattern
  and validated with the Luhn mod-10 check (ISO/IEC 7812, public
  domain) — the difference between "digits that look like a card"
  and "a checksum-valid card number" is exactly what a PII audit
  must report before a redaction pass (q80 redacts; this measures).
  The corpus is digit-free, so card strings are synthesized per doc
  from md5(doc_id) (the q213 synthesis discipline: deterministic,
  engine == oracle), roughly one third with a corrupted check digit.
- q248 script-mix audit: per-source Unicode-script statistics and
  mixed-script-token detection (Latin+Cyrillic inside one token —
  the homoglyph-spoofing signal of Unicode TR#39 confusables).
  Mixed-script docs are synthesized by homoglyph substitution; a
  second class appends CLEAN Cyrillic words that must NOT flag.
- q249 LSH-verified near-dup pairs: q33's banded-MinHash candidates
  verified with character edit distance (Levenshtein) and kept at
  edit-similarity >= 0.5 — the verify step Lee et al. 2021 run on
  NearDup candidates so that band collisions alone never delete a
  document.
- q250 perplexity-vs-rules calibration: the q220 bigram-LM
  perplexity buckets cross-tabulated against the q213 C4 rule
  verdict — per-bucket pass rate vs the corpus base rate (a
  reliability table, Guo et al. 2017): the governance report that
  says whether the LM filter and the rule filter agree before a run
  trusts one of them at the other's threshold.
- q251 duplicate-downweighted token budget: per-source effective
  token counts when exact duplicates are DOWNWEIGHTED by 1/cluster
  size instead of dropped (the soft-dedup alternative to q30's hard
  keeper rule) next to the hard-dedup budget — the two candidate
  token-accounting policies side by side.

Reference scope: beyond-reference extension surface; methods public
(Raffel et al. 2020 C4; Rae et al. 2021 Gopher; Lee et al. 2021
dedup; Guo et al. 2017 calibration; ISO/IEC 7812 Luhn; Unicode
TR#39).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.util import rebalance_by_key
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm import _sql_minhash_oracle
from synthea_etl_spark.plans.llm16 import ORACLE_Q213, q213_c4_line_filters
from synthea_etl_spark.plans.llm17 import ORACLE_Q220, q220_bigram_lm_quality

MICRO = 1_000_000

# q246 operating thresholds (documented rule constants, not fitted):
# flag a doc "repetitive" when one character is >= 25% of it, and
# "low_entropy" below 2.0 nats — the word-soup corpus sits near 2.85
# nats, real boilerplate/padding spam sits far below both.
_TOP_CHAR_FLAG_MICRO = 250_000
_LOW_ENTROPY_MICRO = 2_000_000

# q249 verify threshold: keep candidate pairs at edit similarity
# >= 0.5 (Lee et al. 2021 use token edit similarity 0.8 over
# 50-token windows; character grain + the tiled-dup corpus make 0.5
# the analogous mid-curve operating point).
_EDIT_SIM_MICRO = 500_000


# ---------------------------------------------------------------------------
# q246 character-entropy quality
# ---------------------------------------------------------------------------

def _qterm(k: str) -> str:
    """SQL fragment: the quantized k*ln(k) entropy term for a run of
    length ``k`` (int64; ln computed ONCE per distinct run length —
    the q185/q220 quantization discipline), 0 for k <= 1."""
    return (
        f"CASE WHEN {k} <= 1 THEN CAST(0 AS BIGINT) "
        f"ELSE CAST(floor(round({k} * ln(CAST({k} AS DOUBLE)), 6) "
        f"* {MICRO} + 0.5) AS BIGINT) END"
    )


def _char_hist_arrow(text_col: str = "text") -> F.Column:
    """Per-doc character histogram COUNTS as array<long> via one
    Arrow pass: utf-32 reinterpret + np.unique per document. Only
    exact integer counts leave Python — every transcendental
    (ln, round, quantize) stays JVM-side so the cross-engine
    quantization contract is byte-identical to the pure-JVM shapes.
    The deliberate-Arrow-stage class of q217/q184: per-char work in
    the JVM allocates a UTF8String object per character (measured:
    struct-fold 8.3x DuckDB at sf1, boundary/run-length lambdas
    7.8x — HOF lambdas evaluate interpreted per element — char
    explode + hash-aggregate 3.9x; this pass 1.6x, 0.73x once the
    narrow scan is rebalanced to full parallelism)."""
    import numpy as np
    import pandas as pd

    def hist(s):
        out = []
        for t in s:
            if t is None or len(t) == 0:
                out.append(np.empty(0, dtype=np.int64))
                continue
            a = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            out.append(np.unique(a, return_counts=True)[1].astype(np.int64))
        return pd.Series(out)

    hist.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(hist, "array<long>")
    return udf(F.col(text_col))


def q246_char_entropy_quality(
    spark: SparkSession, sf_dir: str, shape: str | None = None
) -> DataFrame:
    """Per-doc character-distribution quality: Shannon entropy in
    nats (int64 micro), top-character fraction, distinct character
    count, and the two rule flags. H = ln(N) - (1/N) * sum over
    distinct chars of k*ln(k); each k*ln(k) term is quantized once
    per histogram count, so the per-doc sum is order-independent
    int64 and the division is exact integer arithmetic (engine ==
    oracle bit-for-bit).

    100 TB shape (shape='arrow', default): ZERO shuffles — one
    Arrow stage turns each doc into its integer char-histogram
    (:func:`_char_hist_arrow`, ladder in its docstring), and the
    k*ln(k) fold runs JVM-side over the alphabet-sized count array.
    shape='explode' keeps the all-JVM fallback: char explode +
    partial-aggregating (doc, char) histogram groupBy (only
    histogram-sized rows cross the shuffle) — correct at any scale,
    3.9x DuckDB at sf1 purely on per-char UTF8String churn. Both
    shapes rebalance the narrow scan by doc_id first (a small-file
    documents scan plans ~2 input partitions; one compacting
    repartition of the compact text buys full-core parallelism for
    the per-doc work — the q220 pre-explode discipline)."""
    d = rebalance_by_key(
        load(spark, sf_dir, "documents").filter(F.length("text") > 0),
        "doc_id",
    )
    n = F.length("text").cast("long")
    if shape == "explode":
        hist = (
            d.select(
                "doc_id",
                "source",
                n.alias("n_chars_counted"),
                F.explode(F.split("text", "")).alias("_c"),
            )
            .groupBy("doc_id", "source", "n_chars_counted", "_c")
            .agg(F.count("*").cast("long").alias("_k"))
        )
        per_doc = hist.groupBy("doc_id", "source", "n_chars_counted").agg(
            F.count("*").cast("long").alias("distinct_chars"),
            F.sum(F.expr(_qterm("_k"))).cast("long").alias("_st"),
            F.max("_k").alias("_top"),
        )
    else:
        per_doc = d.select(
            "doc_id",
            "source",
            n.alias("n_chars_counted"),
            _char_hist_arrow("text").alias("_cnt"),
        ).select(
            "doc_id",
            "source",
            "n_chars_counted",
            F.expr("CAST(size(_cnt) AS BIGINT)").alias("distinct_chars"),
            F.expr(
                f"aggregate(_cnt, CAST(0 AS BIGINT),"
                f" (acc, _k) -> acc + ({_qterm('_k')}))"
            ).alias("_st"),
            F.array_max("_cnt").alias("_top"),
        )
    stats = per_doc.select(
        "doc_id",
        "source",
        "n_chars_counted",
        "distinct_chars",
        (
            F.floor(
                F.round(
                    F.log(F.col("n_chars_counted").cast("double")), 6
                )
                * MICRO
                + F.lit(0.5)
            ).cast("long")
            - F.expr("_st div n_chars_counted")
        ).alias("entropy_micro"),
        F.expr(f"_top * {MICRO} div n_chars_counted").alias(
            "top_char_micro"
        ),
    )
    return stats.select(
        "doc_id",
        "source",
        "n_chars_counted",
        "distinct_chars",
        "entropy_micro",
        "top_char_micro",
        (F.col("entropy_micro") < _LOW_ENTROPY_MICRO).alias("low_entropy"),
        (F.col("top_char_micro") >= _TOP_CHAR_FLAG_MICRO).alias(
            "repetitive"
        ),
    )


ORACLE_Q246 = f"""
WITH chars AS (
  SELECT doc_id, source, length(text) AS n,
         unnest(string_split(text, '')) AS c
  FROM documents WHERE length(text) > 0
),
cnt AS (
  SELECT doc_id, any_value(source) AS source, any_value(n) AS n,
         c, CAST(COUNT(*) AS BIGINT) AS k
  FROM chars GROUP BY doc_id, c
),
agg AS (
  SELECT doc_id, any_value(source) AS source, any_value(n) AS n,
         SUM({_qterm('k')}) AS st,
         MAX(k) AS top, CAST(COUNT(*) AS BIGINT) AS n_distinct
  FROM cnt GROUP BY doc_id
)
SELECT doc_id, source,
       CAST(n AS BIGINT) AS n_chars_counted,
       n_distinct AS distinct_chars,
       CAST(CAST(floor(round(ln(n), 6) * {MICRO} + 0.5) AS BIGINT)
            - st // n AS BIGINT) AS entropy_micro,
       CAST(top * {MICRO} // n AS BIGINT) AS top_char_micro,
       (CAST(floor(round(ln(n), 6) * {MICRO} + 0.5) AS BIGINT) - st // n)
         < {_LOW_ENTROPY_MICRO} AS low_entropy,
       top * {MICRO} // n >= {_TOP_CHAR_FLAG_MICRO} AS repetitive
FROM agg
"""


# ---------------------------------------------------------------------------
# q247 PII Luhn audit
# ---------------------------------------------------------------------------

_CARD_RE = r"\b\d{4}-\d{4}-\d{4}-\d{4}\b"


def _luhn_sum_spark(s: str, n: int) -> str:
    """SQL fragment (Spark dialect): Luhn sum of the first ``n``
    digits of digit-string ``s``, doubling at odd 1-based left
    index (= even position from the right once a check digit sits
    at position n+1 ... 16)."""
    return f"""
aggregate(sequence(1, {n}), CAST(0 AS BIGINT), (acc, i) -> acc +
  CASE WHEN i % 2 = 1
       THEN IF(CAST(substring({s}, i, 1) AS INT) * 2 > 9,
               CAST(substring({s}, i, 1) AS INT) * 2 - 9,
               CAST(substring({s}, i, 1) AS INT) * 2)
       ELSE CAST(substring({s}, i, 1) AS INT) END)
"""


def _luhn_unrolled_valid(card19: str) -> str:
    """SQL fragment (Spark dialect): Luhn validity of ONE dashed
    4-4-4-4 card string as a fully UNROLLED 16-term sum — straight
    whole-stage codegen, no lambda (a fold inside a higher-order
    function evaluates interpreted per element; unrolling the
    single-card common case cut the q247 validation stage ~4x). The
    dash layout is fixed by the candidate regex, so digit j sits at
    char position j + (j-1) div 4."""
    terms = []
    for j in range(1, 17):
        pos = j + (j - 1) // 4
        d = f"CAST(substring({card19}, {pos}, 1) AS INT)"
        if j % 2 == 1:
            terms.append(f"IF({d} * 2 > 9, {d} * 2 - 9, {d} * 2)")
        else:
            terms.append(d)
    return "(" + " + ".join(terms) + ") % 10 = 0"


def _luhn_sum_duck(s: str, n: int) -> str:
    """Same Luhn sum, DuckDB list dialect."""
    return f"""
list_sum(list_transform(generate_series(1, {n}), i ->
  CASE WHEN i % 2 = 1
       THEN CASE WHEN CAST(substr({s}, i, 1) AS INT) * 2 > 9
                 THEN CAST(substr({s}, i, 1) AS INT) * 2 - 9
                 ELSE CAST(substr({s}, i, 1) AS INT) * 2 END
       ELSE CAST(substr({s}, i, 1) AS INT) END))
"""


def q247_pii_luhn_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source PII card audit: extract 4x4-digit candidates,
    strip separators, Luhn-validate (ISO/IEC 7812 mod-10), and
    report docs-with-candidates / checksum-valid / checksum-invalid
    counts. The corpus is digit-free so the card strings are
    synthesized deterministically from md5(doc_id) (q213's
    discipline): docs with doc_id % 7 == 0 carry none, the rest
    carry one card whose check digit is correct unless
    doc_id % 3 == 0 (corrupted by +5 mod 10); every doc also
    carries a 12-digit decoy that must NOT match the candidate
    pattern. The real rule (regex extract + Luhn over the extracted
    digits) then runs on the synthesized text.

    100 TB shape: zero shuffles until the final source-sized
    aggregate — extraction, separator stripping, and the Luhn
    fold are all per-row codegen (regexp_extract_all + one
    aggregate() lambda over 16 digits; no UDF, no explode)."""
    d = rebalance_by_key(
        load(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", "source", "text")
    payload = F.expr(
        "substring(translate(md5(concat('card', CAST(doc_id AS STRING))),"
        " 'abcdef', '012345'), 1, 15)"
    )
    check = F.expr(
        f"(10 - ({_luhn_sum_spark('_p', 15)}) % 10) % 10"
    )
    synth = (
        d.withColumn("_p", payload)
        .withColumn(
            "_d",
            F.when(
                F.col("doc_id") % 3 == 0, (check + 5) % 10
            ).otherwise(check),
        )
        .withColumn(
            "_card",
            F.concat_ws(
                "-",
                F.substring("_p", 1, 4),
                F.substring("_p", 5, 4),
                F.substring("_p", 9, 4),
                F.concat(F.substring("_p", 13, 3), F.col("_d").cast("string")),
            ),
        )
        .select(
            "doc_id",
            "source",
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat("text", F.lit(" ord 123456789012")),
            )
            .otherwise(
                F.concat(
                    "text",
                    F.lit(" card "),
                    F.col("_card"),
                    F.lit(" ord 123456789012"),
                )
            )
            .alias("page"),
        )
    )
    # the card regex goes through the Column API (F.lit pattern), not
    # an expr string: Spark SQL literals interpret backslash escapes,
    # the Column API passes the Java regex through verbatim
    with_cards = synth.withColumn(
        "_cards", F.regexp_extract_all("page", F.lit(_CARD_RE), 0)
    )
    # <=1 card per doc is the overwhelming case: validate it with the
    # unrolled codegen expression; only multi-card docs pay the
    # general interpreted fold
    luhn_fold = F.expr(
        f"size(filter(transform(_cards, c -> replace(c, '-', '')),"
        f" s -> ({_luhn_sum_spark('s', 16)}) % 10 = 0))"
    )
    luhn_one = F.expr(
        f"IF({_luhn_unrolled_valid('element_at(_cards, 1)')}, 1, 0)"
    )
    n_valid = (
        F.when(F.size("_cards") == 0, F.lit(0))
        .when(F.size("_cards") == 1, luhn_one)
        .otherwise(luhn_fold)
    )
    per_doc = with_cards.select(
        "source",
        F.size("_cards").alias("_n_cand"),
        n_valid.alias("_n_valid"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("_n_cand") > 0).cast("long"))
        .cast("long")
        .alias("n_docs_with_cards"),
        F.sum("_n_valid").cast("long").alias("n_valid_cards"),
        F.sum(F.col("_n_cand") - F.col("_n_valid"))
        .cast("long")
        .alias("n_invalid_cards"),
    )


def _oracle_q247() -> str:
    return f"""
WITH synth AS (
  SELECT doc_id, source,
         substr(translate(md5('card' || doc_id), 'abcdef', '012345'),
                1, 15) AS p
  FROM documents
),
carded AS (
  SELECT doc_id, source,
         substr(p, 1, 4) || '-' || substr(p, 5, 4) || '-'
         || substr(p, 9, 4) || '-' || substr(p, 13, 3)
         || CAST(CASE WHEN doc_id % 3 = 0
                 THEN ((10 - ({_luhn_sum_duck('p', 15)}) % 10) % 10 + 5) % 10
                 ELSE (10 - ({_luhn_sum_duck('p', 15)}) % 10) % 10
            END AS VARCHAR) AS card
  FROM synth
),
pages AS (
  SELECT d.doc_id, d.source,
         CASE WHEN d.doc_id % 7 = 0
              THEN d.text || ' ord 123456789012'
              ELSE d.text || ' card ' || c.card || ' ord 123456789012'
         END AS page
  FROM documents d JOIN carded c USING (doc_id)
),
per_doc AS (
  SELECT source,
         len(regexp_extract_all(page, '{_CARD_RE}')) AS n_cand,
         len(list_filter(
           list_transform(regexp_extract_all(page, '{_CARD_RE}'),
                          c -> replace(c, '-', '')),
           s -> ({_luhn_sum_duck('s', 16)}) % 10 = 0)) AS n_valid
  FROM pages
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n_cand > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_docs_with_cards,
       CAST(SUM(n_valid) AS BIGINT) AS n_valid_cards,
       CAST(SUM(n_cand - n_valid) AS BIGINT) AS n_invalid_cards
FROM per_doc GROUP BY source
"""


# ---------------------------------------------------------------------------
# q248 script-mix audit
# ---------------------------------------------------------------------------

# Java regex (Spark) and RE2 (DuckDB) spell Unicode script classes
# differently; the semantics coincide on these scripts. The _J forms
# are raw Java regex for the Column API; inside Spark SQL expr
# strings the backslash must be doubled (SQL literal unescaping).
_LATIN_J, _LATIN_D = r"\p{IsLatin}", r"\p{Latin}"
_CYR_J, _CYR_D = r"\p{IsCyrillic}", r"\p{Cyrillic}"


def q248_script_mix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Unicode-script audit: Latin/Cyrillic letter
    counts, tokens mixing BOTH scripts (the TR#39 homoglyph-spoof
    signal — 'pаypаl' with Cyrillic а), and the doc classes they
    induce: spoofed (>= 1 mixed token) vs clean-multilingual
    (Cyrillic present, zero mixed tokens). The corpus is pure ASCII
    so both classes are synthesized deterministically: doc_id % 4
    == 1 homoglyph-substitutes a/e/o Cyrillic; doc_id % 4 == 2
    appends clean Cyrillic words; the real rules then run on the
    synthesized text.

    100 TB shape: zero shuffles until the source-sized aggregate —
    script counts are length-difference expressions and the
    mixed-token probe is one filter() lambda over the token array,
    all per-row codegen."""
    d = rebalance_by_key(
        load(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id", "source", "text")
    synth = d.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % 4 == 1,
            F.translate("text", "aeo", "аео"),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(
                "text", F.lit(" привет")
            ),
        )
        .otherwise(F.col("text"))
        .alias("page"),
    )
    n_latin = F.length("page") - F.length(
        F.regexp_replace("page", f"[{_LATIN_J}]", "")
    )
    n_cyr = F.length("page") - F.length(
        F.regexp_replace("page", f"[{_CYR_J}]", "")
    )
    # column-API lambdas keep the Java regexes verbatim (no SQL
    # literal re-escaping)
    mixed = F.size(
        F.filter(
            T.tokens("page"),
            lambda t: t.rlike(_LATIN_J) & t.rlike(_CYR_J),
        )
    )
    per_doc = synth.select(
        "source",
        n_latin.cast("long").alias("_lat"),
        n_cyr.cast("long").alias("_cyr"),
        mixed.cast("long").alias("_mixed"),
    )
    return per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("_lat").cast("long").alias("latin_chars"),
        F.sum("_cyr").cast("long").alias("cyrillic_chars"),
        F.sum("_mixed").cast("long").alias("mixed_tokens"),
        F.sum((F.col("_mixed") > 0).cast("long"))
        .cast("long")
        .alias("n_spoofed_docs"),
        F.sum(((F.col("_cyr") > 0) & (F.col("_mixed") == 0)).cast("long"))
        .cast("long")
        .alias("n_clean_cyrillic_docs"),
    )


ORACLE_Q248 = f"""
WITH synth AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 4 = 1
              THEN translate(text, 'aeo',
                             'аео')
              WHEN doc_id % 4 = 2
              THEN text || ' привет'
              ELSE text END AS page
  FROM documents
),
per_doc AS (
  SELECT source,
         length(page) - length(regexp_replace(page,
             '[{_LATIN_D}]', '', 'g')) AS lat,
         length(page) - length(regexp_replace(page,
             '[{_CYR_D}]', '', 'g')) AS cyr,
         len(list_filter(string_split_regex(trim(page), '\\s+'),
             t -> regexp_matches(t, '{_LATIN_D}')
                  AND regexp_matches(t, '{_CYR_D}'))) AS mixed
  FROM synth
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(lat) AS BIGINT) AS latin_chars,
       CAST(SUM(cyr) AS BIGINT) AS cyrillic_chars,
       CAST(SUM(mixed) AS BIGINT) AS mixed_tokens,
       CAST(SUM(CASE WHEN mixed > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_spoofed_docs,
       CAST(SUM(CASE WHEN cyr > 0 AND mixed = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clean_cyrillic_docs
FROM per_doc GROUP BY source
"""


# ---------------------------------------------------------------------------
# q249 LSH-verified near-dup pairs
# ---------------------------------------------------------------------------

def q249_lsh_verified_pairs(
    spark: SparkSession,
    sf_dir: str,
    verify_sample_fraction: float = 1.0,
) -> DataFrame:
    """q33's banded-MinHash candidate pairs verified by character
    edit distance: keep pairs with edit similarity
    1 - dist/max(len) >= 0.5 and report the distance and the
    similarity (int64 micro, exact integer arithmetic). This is the
    verify stage that makes banding safe to act on: a band
    collision alone never deletes a document (Lee et al. 2021 §4.1
    verify NearDup candidates the same way before clustering).

    100 TB shape: candidates are the output of the certified band
    equi-join — bounded and tiny next to the corpus; the two text
    fetches are doc_id-keyed hash joins against the (doc_id, text)
    projection; Levenshtein runs per candidate pair only (never all
    pairs), in the THRESHOLD form levenshtein(a, b, floor(mx/2)) —
    the DP early-exits once the distance provably exceeds the keep
    bound, which is EXACTLY the sim >= 0.5 predicate ((mx-d)*1e6
    div mx >= 500000 <=> d <= floor(mx/2)), so the result set is
    identical to the oracle's unbounded expression while the DP
    computes only the width-(2t+1) diagonal band and abandons far
    pairs early (~2x on near pairs, more on band false
    positives).

    ``verify_sample_fraction`` bounds the DEGENERATE-CLIQUE case: a
    corpus where near pairs are the majority (the tiled-replica
    honesty record: 96.6 s at sf1) makes the verify side quadratic in
    clique size — each candidate pays near-full-band DP. fraction < 1
    md5-samples the candidate PAIRS deterministically before any text
    is fetched (the q205/q206 knob, on the pair axis): a hash-stable
    unbiased estimate of the pair set at fraction x the cost, never a
    silent truncation — the fraction IS the report's stated coverage.
    The gate runs fraction=1.0 (identity: every pair verified)."""
    from synthea_etl_spark.plans.llm import q33_minhash_lsh_candidates

    pairs = q33_minhash_lsh_candidates(spark, sf_dir)
    if verify_sample_fraction < 1.0:
        bound = int(verify_sample_fraction * (1 << 32))
        pairs = pairs.filter(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("id_a").cast("string"),
                            F.col("id_b").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            < F.lit(bound)
        )
    d = load(spark, sf_dir, "documents").select("doc_id", "text")
    ta = d.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("_ta")
    )
    tb = d.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("_tb")
    )
    j = pairs.join(ta, "id_a").join(tb, "id_b")
    scored = j.select(
        "id_a",
        "id_b",
        F.expr(
            "levenshtein(_ta, _tb, CAST(floor(greatest(length(_ta),"
            " length(_tb)) / 2) AS INT))"
        )
        .cast("long")
        .alias("edit_dist"),
        F.greatest(F.length("_ta"), F.length("_tb"))
        .cast("long")
        .alias("_mx"),
    )
    out = scored.filter(F.col("edit_dist") >= 0).select(
        "id_a",
        "id_b",
        "edit_dist",
        F.expr(f"(_mx - edit_dist) * {MICRO} div _mx").alias(
            "edit_sim_micro"
        ),
    )
    return out.filter(F.col("edit_sim_micro") >= _EDIT_SIM_MICRO)


def _oracle_q249() -> str:
    return f"""
WITH cand AS ({_sql_minhash_oracle()}),
j AS (
  SELECT c.id_a, c.id_b,
         levenshtein(a.text, b.text) AS d,
         greatest(length(a.text), length(b.text)) AS mx
  FROM cand c
  JOIN documents a ON a.doc_id = c.id_a
  JOIN documents b ON b.doc_id = c.id_b
)
SELECT id_a, id_b,
       CAST(d AS BIGINT) AS edit_dist,
       CAST((mx - d) * {MICRO} // mx AS BIGINT) AS edit_sim_micro
FROM j WHERE (mx - d) * {MICRO} // mx >= {_EDIT_SIM_MICRO}
"""


# ---------------------------------------------------------------------------
# q250 perplexity-vs-rules calibration
# ---------------------------------------------------------------------------

def q250_ppl_rules_calibration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Reliability table for the LM quality filter: per q220
    perplexity bucket, how many docs the q213 C4 rules pass, the
    bucket pass rate, the corpus base rate, and the absolute gap
    (all int64 micro, exact). A well-calibrated LM filter shows
    pass rates falling monotonically with the bucket; a flat table
    says the two filters measure different things and thresholding
    one at the other's operating point is unsafe (Guo et al. 2017's
    reliability-diagram logic on filter agreement).

    100 TB shape: rides the two audited subplans (q220: vocab-dim
    quantized LM + one doc_id aggregate; q213: zero-shuffle line
    rules + one doc_id aggregate); the join is doc_id-keyed on
    already-aggregated doc-grain frames, the rollup is bucket-sized,
    and the base rate is a 1-row broadcast crossjoin (the audited
    q225 budget pattern)."""
    lm = q220_bigram_lm_quality(spark, sf_dir).select(
        "doc_id", "ppl_bucket"
    )
    rules = q213_c4_line_filters(spark, sf_dir).select(
        "doc_id", "doc_kept"
    )
    j = lm.join(rules, "doc_id")
    # r15 optimization (guide §1.2): `j` fed TWO aggregates, so the
    # entire q220 LM build + q213 rules subtree ran twice (the
    # executed plan scanned documents 2x). The base rate is exactly
    # derivable from the bucket frame — sum(n_pass) over buckets IS
    # sum(doc_kept) over j and sum(n_docs) IS count(*), all exact
    # int64, so one corpus pass feeds both. The bucket frame is
    # bucket-sized; localCheckpoint stops ITS subtree duplicating.
    buckets = (
        j.groupBy("ppl_bucket")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.col("doc_kept").cast("long"))
            .cast("long")
            .alias("n_pass"),
        )
        .localCheckpoint()
    )
    base = buckets.agg(
        F.expr(f"sum(n_pass) * {MICRO} div sum(n_docs)").alias(
            "base_micro"
        )
    )
    return (
        buckets.crossJoin(F.broadcast(base))
        .select(
            "ppl_bucket",
            "n_docs",
            "n_pass",
            F.expr(f"n_pass * {MICRO} div n_docs").alias("pass_micro"),
            "base_micro",
            F.abs(
                F.expr(f"n_pass * {MICRO} div n_docs") - F.col("base_micro")
            ).alias("gap_micro"),
        )
    )


ORACLE_Q250 = f"""
WITH lm AS ({ORACLE_Q220}),
rules AS ({ORACLE_Q213}),
j AS (
  SELECT lm.doc_id, lm.ppl_bucket, rules.doc_kept
  FROM lm JOIN rules USING (doc_id)
),
base AS (
  SELECT SUM(CASE WHEN doc_kept THEN 1 ELSE 0 END) * {MICRO}
         // COUNT(*) AS base_micro
  FROM j
)
SELECT ppl_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN doc_kept THEN 1 ELSE 0 END) AS BIGINT)
         AS n_pass,
       CAST(SUM(CASE WHEN doc_kept THEN 1 ELSE 0 END) * {MICRO}
            // COUNT(*) AS BIGINT) AS pass_micro,
       CAST(base_micro AS BIGINT) AS base_micro,
       CAST(abs(SUM(CASE WHEN doc_kept THEN 1 ELSE 0 END) * {MICRO}
            // COUNT(*) - base_micro) AS BIGINT) AS gap_micro
FROM j CROSS JOIN base
GROUP BY ppl_bucket, base_micro
"""


# ---------------------------------------------------------------------------
# q251 duplicate-downweighted token budget
# ---------------------------------------------------------------------------

def q251_dup_weighted_budget(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source token accounting under the two dedup policies:
    hard (keep the min-doc_id representative of each exact-dup
    cluster — q30's rule) vs soft (keep every copy downweighted by
    1/cluster_size, so each cluster contributes ~one copy's worth
    of gradient — the soft-dedup alternative). Per-doc weight is
    the exact integer MICRO div k, so the effective-token sum is
    deterministic int64 in both engines.

    100 TB shape: ONE fingerprint-keyed window exchange computes
    cluster size and the keeper flag together, then a source-sized
    aggregate; no joins, no second pass over text."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        T.fingerprint("text").alias("_fp"),
        T.token_count("text").cast("long").alias("_t"),
    )
    w = Window.partitionBy("_fp")
    flagged = d.select(
        "source",
        "_t",
        F.count("*").over(w).cast("long").alias("_k"),
        (F.col("doc_id") == F.min("doc_id").over(w)).alias("_keep"),
    )
    return flagged.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(F.col("_keep").cast("long")).cast("long").alias("n_unique"),
        F.sum("_t").cast("long").alias("total_tokens"),
        F.sum(F.when(F.col("_keep"), F.col("_t")).otherwise(F.lit(0)))
        .cast("long")
        .alias("hard_dedup_tokens"),
        F.sum(F.expr(f"_t * ({MICRO} div _k)"))
        .cast("long")
        .alias("soft_tokens_micro"),
    )


ORACLE_Q251 = f"""
WITH d AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp,
         CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\\s+')) END AS t
  FROM documents
),
flagged AS (
  SELECT source, t,
         COUNT(*) OVER (PARTITION BY fp) AS k,
         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS keep
  FROM d
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       CAST(SUM(t) AS BIGINT) AS total_tokens,
       CAST(SUM(CASE WHEN keep THEN t ELSE 0 END) AS BIGINT)
         AS hard_dedup_tokens,
       CAST(SUM(t * ({MICRO} // k)) AS BIGINT) AS soft_tokens_micro
FROM flagged GROUP BY source
"""


QUERIES: dict[str, QuerySpec] = {
    "q246_char_entropy_quality": QuerySpec(
        q246_char_entropy_quality,
        ORACLE_Q246,
        "per-doc Shannon char entropy / top-char fraction quality"
        " signals (zero-shuffle run-length walk)",
        ("llm", "quality", "text"),
    ),
    "q247_pii_luhn_audit": QuerySpec(
        q247_pii_luhn_audit,
        _oracle_q247(),
        "card-number PII audit: pattern extraction + Luhn mod-10"
        " validation per source",
        ("llm", "pii", "governance"),
    ),
    "q248_script_mix_audit": QuerySpec(
        q248_script_mix_audit,
        ORACLE_Q248,
        "Unicode script statistics + mixed-script homoglyph-spoof"
        " detection per source",
        ("llm", "quality", "text"),
    ),
    "q249_lsh_verified_pairs": QuerySpec(
        q249_lsh_verified_pairs,
        _oracle_q249(),
        "banded-MinHash candidates verified by edit similarity"
        " >= 0.5",
        ("llm", "dedup"),
    ),
    "q250_ppl_rules_calibration": QuerySpec(
        q250_ppl_rules_calibration,
        ORACLE_Q250,
        "LM perplexity buckets vs C4 rule pass rate: reliability"
        " table with base-rate gaps",
        ("llm", "quality", "governance"),
    ),
    "q251_dup_weighted_budget": QuerySpec(
        q251_dup_weighted_budget,
        ORACLE_Q251,
        "hard vs soft (1/cluster-size downweighted) dedup token"
        " budgets per source",
        ("llm", "dedup", "governance"),
    ),
}
