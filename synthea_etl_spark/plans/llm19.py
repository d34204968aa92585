"""Round-12 LLM-pipeline queries: the COMPOSED crawl -> training-set
pipeline (q226) — every stage of the pretraining data path, already
individually certified, chained end to end under one hash gate so
stage-BOUNDARY bugs (the class the round-11 q213 self-review caught)
have a gate that can catch them.

Stage chain and the certified query each stage reuses:

  WARC ingest + HTML extraction      q143/q148 (operators/warc.py,
                                     text.html_to_text)
  line curation (boilerplate + C4)   q212 + q213 (plans/llm16.py)
  exact-dup removal                  q30/q192 stage 1
  Gopher quality bounds              q188/q192 stage 2
  content-hash split                 q211 (plans/llm15.py)
  near-dup leakage audit             q214 (q33 banding machinery)
  two-phase annealing admission      q225 (plans/llm18.py)
  shard export assignment            q133/q150's md5-mod convention

Reference scope: the reference's own pipeline is the 4-script Glue
chain (Glue_Scripts/*.py:1-232 — ingest -> clean -> mart); this module
is the beyond-reference LLM-curation analog of compositing those
stages under one gate. Methods are public: C4 (Raffel et al. 2020),
Gopher (Rae et al. 2021), CCNet (Wenzek et al. 2019), RefinedWeb
(Penedo et al. 2023), MinHash-LSH (Broder 1997; Leskovec et al. MMDS
ch. 3), two-phase annealing (Llama 3, Dubey et al. 2024).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.text as T
from synthea_etl_spark.operators.util import rebalance_by_key
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm import HEX8
from synthea_etl_spark.plans.llm15 import split_expr
from synthea_etl_spark.plans.llm16 import (
    _LINE_BLOCKLIST,
    _LINE_W,
    _MIN_DOCS,
    _MIN_KEPT_LINES,
    _MIN_LINE_WORDS,
    _PUNCT_MOD,
)
from synthea_etl_spark.plans.llm18 import (
    _P1_DEN,
    _P1_NUM,
    _P2_DEN,
    _P2_NUM,
    _Q225_BUCKET,
    _Q225_HQ_BUCKET,
    _SQL_STOPS,
    _prefix_admit,
)

MICRO = 1_000_000
_N_SHARDS = 16


def q226_crawl_training_pipeline(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Crawl -> training set, composed: each document flows WARC
    encode/decode -> html_to_text -> boilerplate + C4 line curation
    -> exact-dup -> Gopher quality -> content-hash split -> near-dup
    leakage audit -> two-phase annealing admission -> shard
    assignment, and is labeled with the FIRST stage that rejects it
    ('line_curation' < 3 kept lines, 'exact_dup', 'quality',
    'leaked' eval docs sharing an LSH band bucket with train) or
    'admitted'. Output per doc: (doc_id, stage, split, n_tokens,
    phase1, phase2, shard_id) — split 'none' until a doc survives
    the funnel, shard_id -1 unless the doc is in the training
    schedule (phase1 or phase2).

    The WARC+HTML leg is REAL (the q148 codecs run on every doc);
    the oracle models the roundtrip as whitespace-collapse identity,
    so the hash gate cross-checks the codec chain against identity
    on every document, exactly q148's adjudication.

    100 TB shape, stage by stage: ingest is one mapInPandas (narrow);
    the chunker is a narrow explode; boilerplate detection is ONE
    fp-keyed shuffle whose verdict rejoins on fp (q212's shape) with
    the C4 predicates fused into the same per-line pass (zero extra
    shuffles); reassembly is one doc_id aggregate; exact-dup is one
    fingerprint window; quality/split are zero-shuffle expressions;
    banding runs AFTER exact-dup removal so identical texts can't
    form mega-buckets (the q33 cap discipline) and pairs expand
    in-bucket, never a self-join; annealing pays a 256-row histogram
    plus one boundary-bucket window (q225's shape); the final
    assembly is a chain of doc_id equi-joins over doc_id-keyed
    aggregates (AQE co-partitions; leak/phase frames are
    survivor-sized). No per-row Python UDF after the codec leg, no
    cartesian, no global sort.

    LINEAGE CUTS (round-12 plan audit): the curated frame feeds
    EIGHT downstream branches (dedup window, quality, split, both
    banding sides, annealing, assembly); without a cut each branch
    replays the whole WARC-decode + line-curation subtree — the
    executed plan carried 68 MapInPandas copies. ``localCheckpoint``
    on the curated frame and on the survivor frame materializes each
    ONCE (the §2.8 graph/dedup discipline); the codec now runs a
    single time per document, as a pipeline must at 100 TB (where
    the cut is a parquet write between stages anyway)."""
    from synthea_etl_spark.operators.text import html_to_text
    from synthea_etl_spark.operators.warc import (
        encode_warc_gz,
        warc_records,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")

    # ---- stage 0: WARC wrap -> decode -> HTML extraction ----------
    def build(batches):
        import pandas as pd

        for pdf in batches:
            payloads = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                page = (
                    "<html><head><script>track();</script></head>"
                    f"<body><h1></h1><p>{text}</p></body></html>"
                )
                payloads.append(
                    encode_warc_gz(
                        [
                            {
                                "type": "response",
                                "uri": f"http://crawl.test/{int(doc_id)}",
                                "payload": page.encode("utf-8"),
                            }
                        ]
                    )
                )
            yield pd.DataFrame({"id": pdf["doc_id"], "payload": payloads})

    shaped = rebalance_by_key(docs, "doc_id").mapInPandas(
        build, schema="id long, payload binary"
    )
    pages = (
        warc_records(shaped)
        .filter(F.col("warc_type") == "response")
        .select(
            F.col("id").alias("doc_id"),
            html_to_text(F.col("payload_text")).alias("text"),
        )
    )

    # ---- stage 1: line curation (q212 boilerplate + q213 C4) ------
    # localCheckpoint (r15 optimization, guide §1.2): the
    # boilerplate-frequency join below consumes `lines` on BOTH
    # sides (freq build + probe), and a join's sides are duplicated
    # subtrees — without the cut the WARC encode/decode + HTML
    # extraction (the only Python leg) ran TWICE per document. The
    # round-12 cuts on `cur`/`surv` bounded the downstream fan-out
    # but not this in-stage duplication.
    lines = T.chunk_by_tokens(
        pages, window=_LINE_W, overlap=0
    ).select(
        F.col("id").alias("doc_id"),
        F.col("chunk_idx").alias("line_idx"),
        F.col("chunk_tokens").alias("line_tokens"),
        F.col("chunk_text").alias("line_text"),
        F.md5("chunk_text").alias("fp"),
    ).localCheckpoint()
    freq = (
        lines.select("fp", "doc_id")
        .distinct()
        .groupBy("fp")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    hv = D._hex_int(F.concat(F.lit("lp"), F.col("fp")), 8)
    synth = F.when(
        hv % _PUNCT_MOD < _PUNCT_MOD - 1,
        F.concat(F.col("line_text"), F.lit(".")),
    ).otherwise(F.col("line_text"))
    block = F.array(*[F.lit(w) for w in _LINE_BLOCKLIST])
    keep = (
        (F.col("n_docs") < _MIN_DOCS)
        & synth.rlike(r"[.!?]$")
        & (F.col("line_tokens") >= _MIN_LINE_WORDS)
        & (
            F.size(
                F.array_intersect(F.split(F.col("line_text"), " "), block)
            )
            == 0
        )
    )
    kept_struct = F.when(keep, F.struct("line_idx", "line_text"))
    cur = (
        lines.join(freq, "fp")
        .withColumn("_keep", keep)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("_keep").cast("long")).cast("long").alias("n_kept"),
            F.sum(
                F.when(F.col("_keep"), F.col("line_tokens")).otherwise(
                    F.lit(0)
                )
            )
            .cast("long")
            .alias("n_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)),
                    lambda s: s["line_text"],
                ),
                " ",
            ).alias("ctext"),
        )
        .withColumn("_line_ok", F.col("n_kept") >= _MIN_KEPT_LINES)
    ).localCheckpoint()

    # ---- stages 2-4: exact-dup, quality, split (survivors only) ---
    s1 = cur.filter("_line_ok")
    fpw = Window.partitionBy(T.fingerprint("ctext")).orderBy("doc_id")
    # localCheckpoint (r15): s2 feeds the survivor frame AND the
    # final assembly join — without the cut the fingerprint window +
    # quality + split expressions re-ran on the second consumer
    s2 = (
        s1.withColumn("_fprn", F.row_number().over(fpw))
        .withColumn("_q_ok", T.gopher_quality_ok("ctext"))
        .withColumn("split", split_expr("ctext"))
        .localCheckpoint()
    )
    surv = s2.filter(
        (F.col("_fprn") == 1) & F.col("_q_ok")
    ).localCheckpoint()

    # ---- stage 5: near-dup leakage (q214 banding on curated text) -
    sig = D.minhash_signature(
        surv.select("doc_id", "ctext"), "ctext", "doc_id", 32, 3
    )
    pairs = D.lsh_candidates(sig, "doc_id", 32, 8)
    sp = surv.select("doc_id", "split")
    tagged = (
        pairs.join(
            sp.select(
                F.col("doc_id").alias("id_a"), F.col("split").alias("sa")
            ),
            "id_a",
        )
        .join(
            sp.select(
                F.col("doc_id").alias("id_b"), F.col("split").alias("sb")
            ),
            "id_b",
        )
        .filter((F.col("sa") == "train") != (F.col("sb") == "train"))
    )
    leaks = tagged.select(
        F.when(F.col("sa") == "train", F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("doc_id")
    ).distinct().withColumn("_leak", F.lit(True))

    # ---- stage 6: two-phase annealing over clean TRAIN survivors --
    # codegen single-pass stopword count (r15, guide §4.1)
    n_stop = T.stopword_token_count("ctext")
    scored = (
        surv.filter(F.col("split") == "train")
        .select(
            "doc_id",
            "n_tokens",
            (n_stop * F.lit(MICRO).cast("long")).alias("_sm"),
            F.greatest(F.col("n_tokens"), F.lit(1)).alias("_nn"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr(f"(_sm div _nn) div {_Q225_BUCKET}")
            .cast("int")
            .alias("bucket"),
            F.md5(
                F.concat(F.lit("an"), F.col("doc_id").cast("string"))
            ).alias("_h"),
        )
        # three consumers (total budget, phase-1, phase-2): cut so
        # the stopword scoring pass runs once (r15, guide §1.2)
        .localCheckpoint()
    )
    total = scored.agg(F.sum("n_tokens").cast("long").alias("_ttok"))
    b1 = total.select(
        F.expr(f"_ttok * {_P1_NUM} div {_P1_DEN}").alias("_budget")
    )
    b2 = total.select(
        F.expr(f"_ttok * {_P2_NUM} div {_P2_DEN}").alias("_budget")
    )
    p1 = _prefix_admit(
        scored.select("doc_id", "n_tokens", "_h"), F.broadcast(b1)
    ).withColumnRenamed("admitted", "_ph1")
    p2 = _prefix_admit(
        scored.filter(F.col("bucket") >= _Q225_HQ_BUCKET).select(
            "doc_id", "n_tokens", "_h"
        ),
        F.broadcast(b2),
    ).withColumnRenamed("admitted", "_ph2")

    # ---- assembly: first-rejecting-stage label + shard export -----
    base = (
        cur.select("doc_id", "n_tokens", "_line_ok")
        .join(s2.select("doc_id", "_fprn", "_q_ok", "split"), "doc_id", "left")
        .join(leaks, "doc_id", "left")
        .join(p1, "doc_id", "left")
        .join(p2, "doc_id", "left")
    )
    stage = (
        F.when(~F.col("_line_ok"), F.lit("line_curation"))
        .when(F.col("_fprn") > 1, F.lit("exact_dup"))
        .when(~F.col("_q_ok"), F.lit("quality"))
        .when(
            (F.col("split") != "train")
            & F.coalesce(F.col("_leak"), F.lit(False)),
            F.lit("leaked"),
        )
        .otherwise(F.lit("admitted"))
    )
    ph1 = F.coalesce(F.col("_ph1"), F.lit(False))
    ph2 = F.coalesce(F.col("_ph2"), F.lit(False))
    shard = (
        D._hex_int(F.concat(F.lit("sh"), F.col("doc_id").cast("string")), 8)
        % _N_SHARDS
    ).cast("int")
    return base.select(
        "doc_id",
        stage.alias("stage"),
        F.when(stage.isin("admitted", "leaked"), F.col("split"))
        .otherwise(F.lit("none"))
        .alias("split"),
        "n_tokens",
        ph1.alias("phase1"),
        ph2.alias("phase2"),
        F.when(ph1 | ph2, shard).otherwise(F.lit(-1)).alias("shard_id"),
    )


def _sql_minhash_from(src: str, num_hashes: int = 32, bands: int = 8) -> str:
    """The q33 minhash-oracle fragment (plans/llm._sql_minhash_oracle)
    re-rooted on an arbitrary (doc_id, ctext) CTE instead of the
    documents view — the composed pipeline bands CURATED text."""
    rows_per_band = num_hashes // bands
    h = HEX8.format(x="s")
    mins = ",\n    ".join(
        f"MIN(({2 * i + 1} * h + {(1000000007 * (i + 1)) % D.MINHASH_P})"
        f" % {D.MINHASH_P}) AS sig_{i}"
        for i in range(num_hashes)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5(concat_ws('|', "
        + ", ".join(
            f"sig_{b * rows_per_band + j}" for j in range(rows_per_band)
        )
        + ")) AS bh FROM msig"
        for b in range(bands)
    )
    return f"""
mtoks AS (
  SELECT doc_id, string_split_regex(trim(ctext), '\\s+') AS w
  FROM {src} WHERE length(trim(ctext)) > 0
),
msh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM mtoks, LATERAL (SELECT UNNEST(generate_series(1, len(w)-2)) AS i) u
  WHERE len(w) >= 3
),
mhashed AS (SELECT doc_id, {h} AS h FROM msh),
msig AS (SELECT doc_id, {mins} FROM mhashed GROUP BY doc_id),
mbands AS (
{band_rows}
),
mpairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM mbands a JOIN mbands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
)"""


_HEX_LP = HEX8.format(x="'lp' || l.fp")
_HEX_SH = HEX8.format(x="'sh' || CAST(f.doc_id AS VARCHAR)")
_SQL_SPLIT_Q = (
    "CAST(concat('0x', substr(md5('sp' || "
    "md5(regexp_replace(lower(trim(q.ctext)), '\\s+', ' ', 'g'))"
    "), 1, 8)) AS BIGINT) % 100"
)

ORACLE_Q226 = f"""
WITH p AS (
  SELECT doc_id, trim(regexp_replace(text, '\\s+', ' ', 'g')) AS text
  FROM documents
),
t AS (
  SELECT doc_id,
         CASE WHEN length(trim(text)) = 0 THEN []
              ELSE string_split_regex(trim(text), '\\s+') END AS toks
  FROM p
),
g AS (
  SELECT doc_id, toks,
         GREATEST(1, CAST(CEIL(len(toks) / {_LINE_W}.0) AS BIGINT))
           AS n_chunks
  FROM t
),
lines AS (
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
),
freq AS (
  SELECT fp, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
  FROM lines GROUP BY fp
),
judged AS (
  SELECT l.doc_id, l.line_idx, l.line_tokens, l.line_text,
         f.n_docs < {_MIN_DOCS}
         AND regexp_matches(
               CASE WHEN {_HEX_LP} % {_PUNCT_MOD} < {_PUNCT_MOD - 1}
                    THEN l.line_text || '.' ELSE l.line_text END,
               '[.!?]$')
         AND l.line_tokens >= {_MIN_LINE_WORDS}
         AND NOT EXISTS (
           SELECT 1 FROM (SELECT UNNEST(
               string_split(l.line_text, ' ')) AS w)
           WHERE w IN {_LINE_BLOCKLIST!r}
         ) AS keep
  FROM lines l JOIN freq f USING (fp)
),
cur AS (
  SELECT doc_id,
         CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         CAST(SUM(CASE WHEN keep THEN line_tokens ELSE 0 END) AS BIGINT)
           AS n_tokens,
         COALESCE(string_agg(CASE WHEN keep THEN line_text END,
                             ' ' ORDER BY line_idx), '') AS ctext
  FROM judged GROUP BY doc_id
),
st AS (SELECT *, n_kept >= {_MIN_KEPT_LINES} AS line_ok FROM cur),
dd AS (
  SELECT doc_id,
         row_number() OVER (
             PARTITION BY md5(regexp_replace(lower(trim(ctext)),
                                             '\\s+', ' ', 'g'))
             ORDER BY doc_id) AS fprn
  FROM st WHERE line_ok
),
qw AS (
  SELECT doc_id, ctext,
         CASE WHEN length(trim(ctext)) = 0 THEN []
              ELSE string_split_regex(trim(ctext), '\\s+') END AS w
  FROM st WHERE line_ok
),
q3 AS (
  SELECT doc_id, ctext, nw, ns,
         nw >= 50 AND nw <= 100000
           AND sl >= 3 * nn AND sl <= 10 * nn
           AND na * 5 >= nn * 4 AND ns >= 2 AS q_ok
  FROM (
    SELECT doc_id, ctext,
           CAST(len(w) AS BIGINT) AS nw,
           CAST(GREATEST(len(w), 1) AS BIGINT) AS nn,
           CAST(COALESCE(list_sum(list_transform(w, x -> length(x))), 0)
                AS BIGINT) AS sl,
           CAST(len(list_filter(w, x -> regexp_matches(x, '[a-z]')))
                AS BIGINT) AS na,
           CAST(len(list_filter(w, x -> list_contains(
               ([{_SQL_STOPS}]), x))) AS BIGINT) AS ns
    FROM qw
  )
),
sv AS (
  SELECT q.doc_id, q.ctext, q.nw, q.ns, s.n_tokens,
         CASE WHEN {_SQL_SPLIT_Q} < 80 THEN 'train'
              WHEN {_SQL_SPLIT_Q} < 90 THEN 'val'
              ELSE 'test' END AS split
  FROM q3 q
  JOIN dd USING (doc_id)
  JOIN st s USING (doc_id)
  WHERE dd.fprn = 1 AND q.q_ok
),
{_sql_minhash_from("sv")},
leaks AS (
  SELECT DISTINCT
         CASE WHEN sa.split = 'train' THEN mp.id_b ELSE mp.id_a END
           AS doc_id
  FROM mpairs mp
  JOIN sv sa ON sa.doc_id = mp.id_a
  JOIN sv sb ON sb.doc_id = mp.id_b
  WHERE (sa.split = 'train') <> (sb.split = 'train')
),
sc AS (
  SELECT doc_id, n_tokens,
         CAST((ns * {MICRO} // GREATEST(n_tokens, 1))
              // {_Q225_BUCKET} AS INTEGER) AS bucket,
         md5('an' || CAST(doc_id AS VARCHAR)) AS h
  FROM sv WHERE split = 'train'
),
tt AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS ttok FROM sc),
ap1 AS (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY h, doc_id
             ROWS UNBOUNDED PRECEDING)
           <= (SELECT ttok * {_P1_NUM} // {_P1_DEN} FROM tt) AS ph1
  FROM sc
),
ap2 AS (
  SELECT doc_id,
         SUM(n_tokens) OVER (ORDER BY h, doc_id
             ROWS UNBOUNDED PRECEDING)
           <= (SELECT ttok * {_P2_NUM} // {_P2_DEN} FROM tt) AS ph2
  FROM sc WHERE bucket >= {_Q225_HQ_BUCKET}
),
f AS (
  SELECT p.doc_id, s.n_tokens,
         CASE WHEN NOT s.line_ok THEN 'line_curation'
              WHEN dd.fprn > 1 THEN 'exact_dup'
              WHEN NOT q3.q_ok THEN 'quality'
              WHEN sv.split <> 'train' AND lk.doc_id IS NOT NULL
                THEN 'leaked'
              ELSE 'admitted' END AS stage,
         sv.split AS sv_split,
         COALESCE(ap1.ph1, FALSE) AS phase1,
         COALESCE(ap2.ph2, FALSE) AS phase2
  FROM p
  JOIN st s USING (doc_id)
  LEFT JOIN dd USING (doc_id)
  LEFT JOIN q3 USING (doc_id)
  LEFT JOIN sv USING (doc_id)
  LEFT JOIN leaks lk USING (doc_id)
  LEFT JOIN ap1 USING (doc_id)
  LEFT JOIN ap2 USING (doc_id)
)
SELECT doc_id, stage,
       CASE WHEN stage IN ('admitted', 'leaked') THEN sv_split
            ELSE 'none' END AS split,
       n_tokens, phase1, phase2,
       CASE WHEN phase1 OR phase2
            THEN CAST({_HEX_SH} % {_N_SHARDS} AS INTEGER)
            ELSE -1 END AS shard_id
FROM f
"""


QUERIES: dict[str, QuerySpec] = {
    "q226_crawl_training_pipeline": QuerySpec(
        q226_crawl_training_pipeline,
        ORACLE_Q226,
        "composed crawl->training pipeline: WARC+HTML -> line"
        " curation -> dedup -> quality -> split -> leakage ->"
        " annealing -> shards, first-rejecting-stage labels",
        ("llm", "curation", "composition"),
    ),
}
