"""Round-12 LLM-pipeline queries, batch 3: language-sampling and
crawl-compliance operators.

- q230 UniMax allocation (Chung et al. 2023): epoch-CAPPED uniform
  language sampling — the budget is split uniformly across
  languages, but no language may exceed E epochs of its own data;
  surplus redistributes to the uncapped (waterfilling). The capped
  set is a PREFIX of the languages sorted by capacity, so the whole
  allocation has a closed form over one language-sized window — no
  driver loop, exact int64.
- q231 robots compliance (RFC 9309 REP): longest-match Allow/
  Disallow evaluation per URL against per-host rule sets — the
  crawl-side legal/politeness gate every fetch pipeline runs before
  q228's budget admission. Longest matching rule wins; on a length
  tie Allow wins: crawlable == NOT (best_disallow > best_allow).

Reference scope: beyond-reference extension surface; methods public
(UniMax: Chung et al. 2023; REP: RFC 9309 / Koster 1994).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.text as T
from synthea_etl_spark.plans.common import QuerySpec, load

MICRO = 1_000_000
_UNIMAX_EPOCH_CAP = 2  # no language repeats more than 2 epochs


def q230_unimax_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language allocation: budget N = one corpus-epoch of
    tokens, split uniformly over the L languages, each capped at
    ``_UNIMAX_EPOCH_CAP`` epochs of its own tokens; capped surplus
    waterfills into the rest. Sorted by capacity ascending, the
    capped set is a prefix: language k is capped iff serving every
    language from k onward its own cap's share would still fit —
    cap_k * (L - k + 1) <= N - cumcap_{k-1}. The final share is
    (N - cumcap_K) div (L - K) with the integer remainder handed to
    the first uncapped languages (deterministic, sums to N exactly).
    Returns (lang, n_tokens, cap_tokens, capped, alloc_tokens,
    epochs_micro).

    100 TB shape: ONE language-sized aggregate (tens of rows) off
    the corpus scan, then windows over that tiny frame — the q182/
    q201 allocation discipline with a cap instead of a temperature.
    The corpus is touched once, for token counts."""
    docs = load(spark, sf_dir, "documents").select("lang", "text")
    # language-sized (tens of rows); the caps/tot/ranked/kstats
    # chain consumes it four ways — without a barrier the corpus
    # token-count scan ran four times (r15, guide §1.2)
    per_lang = docs.groupBy("lang").agg(
        F.sum(T.token_count("text").cast("long")).cast("long").alias("n_tokens")
    ).localCheckpoint()
    caps = per_lang.select(
        "lang",
        "n_tokens",
        (F.col("n_tokens") * _UNIMAX_EPOCH_CAP).alias("cap_tokens"),
    )
    w = Window.orderBy("cap_tokens", "lang")
    wcum = w.rowsBetween(Window.unboundedPreceding, -1)
    tot = caps.agg(
        F.sum("n_tokens").cast("long").alias("_n"),
        F.count("*").cast("long").alias("_l"),
    )
    ranked = (
        caps.crossJoin(F.broadcast(tot))
        .withColumn("_k", F.row_number().over(w).cast("long"))
        .withColumn(
            "_cum", F.coalesce(F.sum("cap_tokens").over(wcum), F.lit(0))
        )
        .withColumn(
            "capped",
            F.col("cap_tokens") * (F.col("_l") - F.col("_k") + 1)
            <= F.col("_n") - F.col("_cum"),
        )
    )
    kstats = ranked.agg(
        F.sum(F.col("capped").cast("long")).cast("long").alias("_kc"),
        F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0))
        .cast("long")
        .alias("_capsum"),
    )
    out = (
        ranked.crossJoin(F.broadcast(kstats))
        .withColumn(
            "_share",
            F.expr("(_n - _capsum) div (_l - _kc)"),
        )
        .withColumn("_rem", F.expr("(_n - _capsum) % (_l - _kc)"))
        .withColumn(
            "alloc_tokens",
            F.when(F.col("capped"), F.col("cap_tokens")).otherwise(
                F.col("_share")
                # remainder: the first r uncapped languages in cap
                # order get one extra token
                + (F.col("_k") - F.col("_kc") <= F.col("_rem")).cast("long")
            ),
        )
    )
    return out.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        "capped",
        F.col("alloc_tokens").cast("long").alias("alloc_tokens"),
        F.expr(f"alloc_tokens * {MICRO} div n_tokens").alias("epochs_micro"),
    )


ORACLE_Q230 = f"""
WITH per_lang AS (
  SELECT lang,
         CAST(SUM(CASE WHEN length(trim(text)) = 0 THEN 0
                  ELSE len(string_split_regex(trim(text), '\\s+')) END)
              AS BIGINT) AS n_tokens
  FROM documents GROUP BY lang
),
caps AS (
  SELECT lang, n_tokens,
         n_tokens * {_UNIMAX_EPOCH_CAP} AS cap_tokens
  FROM per_lang
),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS n,
         CAST(COUNT(*) AS BIGINT) AS l
  FROM caps
),
ranked AS (
  SELECT c.*, t.n, t.l,
         CAST(row_number() OVER (ORDER BY cap_tokens, lang) AS BIGINT)
           AS k,
         CAST(COALESCE(SUM(cap_tokens) OVER (
             ORDER BY cap_tokens, lang
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum
  FROM caps c CROSS JOIN tot t
),
flagged AS (
  SELECT *, cap_tokens * (l - k + 1) <= n - cum AS capped
  FROM ranked
),
kstats AS (
  SELECT CAST(SUM(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT) AS kc,
         CAST(SUM(CASE WHEN capped THEN cap_tokens ELSE 0 END)
              AS BIGINT) AS capsum
  FROM flagged
),
alloc AS (
  SELECT f.lang, f.n_tokens, f.cap_tokens, f.capped,
         CASE WHEN f.capped THEN f.cap_tokens
              ELSE (f.n - s.capsum) // (f.l - s.kc)
                   + CASE WHEN f.k - s.kc <= (f.n - s.capsum) % (f.l - s.kc)
                          THEN 1 ELSE 0 END
         END AS alloc_tokens
  FROM flagged f CROSS JOIN kstats s
)
SELECT lang, n_tokens, cap_tokens, capped,
       CAST(alloc_tokens AS BIGINT) AS alloc_tokens,
       CAST(alloc_tokens * {MICRO} // n_tokens AS BIGINT) AS epochs_micro
FROM alloc
"""


# ---------------------------------------------------------------------------
# q231 robots (REP) compliance
# ---------------------------------------------------------------------------


def robots_allowed(path, allow_prefixes, disallow_prefixes) -> F.Column:
    """RFC 9309 longest-match decision as one JVM expression: the
    longest matching Allow prefix vs the longest matching Disallow
    prefix; the longer wins, an exact tie goes to Allow, no match =
    allowed. ``*_prefixes`` are array<string> columns (a real
    deployment broadcasts the parsed per-host rule table; the rule
    EVALUATOR is this expression either way)."""

    def best(prefixes):
        # one aggregate fold, NO intermediate arrays: the
        # filter+transform+array_max form allocates two arrays per
        # row per side (measured +35% wall at sf10)
        return F.aggregate(
            prefixes,
            F.lit(0),
            lambda acc, r: F.greatest(
                acc,
                F.when(path.startswith(r), F.length(r)).otherwise(
                    F.lit(0)
                ),
            ),
        )

    return best(disallow_prefixes) <= best(allow_prefixes)


def q231_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REP (robots.txt) compliance over the synthesized crawl: host
    site<h>.com publishes the rule set {Disallow /p/<h%10>,
    Allow /p/<h%10>/, Disallow /p/<(h+1)%10>} — the longest-match
    semantics exercise: pages equal to h%10 match BOTH rules and the
    longer Allow wins; pages equal to (h+1)%10 are blocked; all
    others are unmatched (allowed). ~10% of each host's URLs end up
    uncrawlable. Returns (doc_id, host, path, crawlable).

    100 TB shape: ZERO shuffles, zero joins — the rule arrays are
    built inline per row and the longest-match fold
    (:func:`robots_allowed`) is pure codegen. Two shapes were
    measured at sf10 and the obvious-looking one LOST: joining a
    broadcast host-keyed rules dim (build arrays once per host)
    costs 0.84 s vs 0.51 s for per-row construction — a handful of
    small array allocations inside codegen is cheaper than a
    broadcast-hash probe + row assembly per URL. A real crawler
    whose rules genuinely arrive as a parsed table still pays the
    join; when rules are expressible per-partition (as here), the
    inline form wins."""
    docs = load(spark, sf_dir, "documents").select("doc_id")
    h = (F.expr("doc_id div 4") % 40).cast("long")
    # page decoupled from the host (doc_id, not doc_id div 4 — the
    # synth-url page would make page ≡ h (mod 10), so the Disallow
    # rule could never fire)
    page = (F.col("doc_id") % 10).cast("string")
    host = F.concat(F.lit("site"), h.cast("string"), F.lit(".com"))
    path = F.concat(F.lit("/p/"), page, F.lit("/"))
    blocked_page = (h % 10).cast("string")
    next_page = ((h + 1) % 10).cast("string")
    allow = F.array(F.concat(F.lit("/p/"), blocked_page, F.lit("/")))
    disallow = F.array(
        F.concat(F.lit("/p/"), blocked_page),
        F.concat(F.lit("/p/"), next_page),
    )
    return docs.select(
        "doc_id",
        host.alias("host"),
        path.alias("path"),
        robots_allowed(path, allow, disallow).alias("crawlable"),
    )


ORACLE_Q231 = """
WITH d AS (
  SELECT doc_id,
         (doc_id // 4) % 40 AS h,
         CAST(doc_id % 10 AS VARCHAR) AS page
  FROM documents
),
r AS (
  SELECT doc_id,
         'site' || h || '.com' AS host,
         '/p/' || page || '/' AS path,
         ['/p/' || CAST(h % 10 AS VARCHAR) || '/'] AS allow,
         ['/p/' || CAST(h % 10 AS VARCHAR),
          '/p/' || CAST((h + 1) % 10 AS VARCHAR)] AS disallow
  FROM d
)
SELECT doc_id, host, path,
       COALESCE(list_max(list_transform(
           list_filter(disallow, x -> starts_with(path, x)),
           x -> length(x))), 0)
       <= COALESCE(list_max(list_transform(
           list_filter(allow, x -> starts_with(path, x)),
           x -> length(x))), 0) AS crawlable
FROM r
"""


QUERIES: dict[str, QuerySpec] = {
    "q230_unimax_allocation": QuerySpec(
        q230_unimax_allocation,
        ORACLE_Q230,
        "UniMax epoch-capped uniform language allocation,"
        " closed-form waterfilling, exact int64",
        ("llm", "curation", "governance"),
    ),
    "q231_robots_filter": QuerySpec(
        q231_robots_filter,
        ORACLE_Q231,
        "RFC 9309 robots longest-match Allow/Disallow evaluation,"
        " zero-shuffle",
        ("llm", "crawl", "governance"),
    ),
}
