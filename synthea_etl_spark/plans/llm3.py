"""Training-data pipeline operators, third batch (round 7):

- q158: INCREMENTAL near-dedup — a new batch's MinHash band
  signatures probed against the persisted band index of everything
  already ingested (the MinHash analog of q151's exact anti-join;
  no historical text rescan, no retrain).
- q159: PERCEPTUAL image near-dup — dHash fingerprints over decoded
  rasters + banded hamming pair search (the decoder↔dedup bridge an
  image-corpus pipeline actually runs).
- q160: IVF ANN with ZERO Lloyd iterations — centroids are the
  deterministic md5-min seeds, so assignment/probe/score collapse to
  closed-form SQL and the IVF *machinery* gets an exact DuckDB twin
  (the Lloyd-refined q43 stays recall-tested).

Beyond-reference surface (BASELINE.json north star); all reference
citations for the shared machinery live in operators/{dedup,
multimodal,similarity}.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.operators.util import rebalance_by_key
from synthea_etl_spark.plans.common import QuerySpec, load
from synthea_etl_spark.plans.llm import (
    BANDS,
    HEX8,
    NUM_HASHES,
    ROWS_PER_BAND,
    SQL_SHINGLES,
    SQL_TOKS,
)


# ---------------------------------------------------------------------------
# q158 incremental MinHash near-dedup (new batch vs persisted band index)
# ---------------------------------------------------------------------------


def q158_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recurring-ingest NEAR-dedup shape: docs with doc_id%5 < 3
    were 'previously ingested' and only their banded MinHash
    signatures survive as the history INDEX (in production a table
    bucketed by (band, bh) — see tests/test_llm3.py for the persisted
    round trip); the new batch (doc_id%5 >= 3) computes its own
    signatures and candidate near-dups fall out of an equi-join on
    (band, bh) — at 100 TB the history side is the ~50-byte-per-row
    index, never the corpus, and a bucketed index table makes the
    join shuffle-free on the big side. Output: distinct
    (new_id, hist_id) candidate pairs."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    new_batch = docs.filter(F.col("doc_id") % 5 >= 3)
    history = docs.filter(F.col("doc_id") % 5 < 3)
    hist_index = D.banded_signatures(
        D.minhash_signature(history, "text", "doc_id", NUM_HASHES, 3),
        "doc_id", NUM_HASHES, BANDS,
    )
    new_bands = D.banded_signatures(
        D.minhash_signature(new_batch, "text", "doc_id", NUM_HASHES, 3),
        "doc_id", NUM_HASHES, BANDS,
    )
    return D.incremental_lsh_candidates(new_bands, hist_index, "doc_id")


def _sql_incremental_minhash_oracle() -> str:
    h = HEX8.format(x="s")
    mins = ",\n    ".join(
        f"MIN(({2 * i + 1} * h + {(1000000007 * (i + 1)) % D.MINHASH_P})"
        f" % {D.MINHASH_P}) AS sig_{i}"
        for i in range(NUM_HASHES)
    )
    band_rows = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band, md5(concat_ws('|', "
        + ", ".join(
            f"sig_{b * ROWS_PER_BAND + j}" for j in range(ROWS_PER_BAND)
        )
        + ")) AS bh FROM sig"
        for b in range(BANDS)
    )
    return f"""
WITH {SQL_TOKS}, {SQL_SHINGLES},
hashed AS (SELECT doc_id, {h} AS h FROM sh),
sig AS (SELECT doc_id, {mins} FROM hashed GROUP BY doc_id),
bands AS (
{band_rows}
)
SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS hist_id
FROM bands a JOIN bands b ON a.band = b.band AND a.bh = b.bh
WHERE a.doc_id % 5 >= 3 AND b.doc_id % 5 < 3
"""


# ---------------------------------------------------------------------------
# q159 perceptual image near-dup (dHash over decoded rasters)
# ---------------------------------------------------------------------------

# Fixture: clusters of 4 consecutive doc_ids share an md5-derived
# 60-bit target dHash; members p=1..3 flip bit p (hamming 1 from the
# base, 2 between flipped siblings), so with max_hamming=2 every
# intra-cluster pair qualifies while cross-cluster md5 hashes sit ~30
# bits apart. Each doc's raster ENCODES its target hash as horizontal
# gradient signs: an 11×6 gray PPM where stepping right adds +1 for a
# set bit and -1 for a clear one — so gray(x, y) is the closed form
#   128 + 2*popcount(hash & prefix_mask(y, x)) - x
# and a hash match proves decode → grayscale → NN grid → gradient
# extraction end to end.
_DH = (
    "CAST(conv(substr(md5(concat('dh', CAST(doc_id div 4 AS STRING))), 1, 15),"
    " 16, 10) AS BIGINT)"
)
_DH_DOC = (
    f"({_DH} ^ CASE WHEN doc_id % 4 = 0 THEN CAST(0 AS BIGINT)"
    " ELSE shiftleft(CAST(1 AS BIGINT), CAST(doc_id % 4 AS INT)) END)"
)
_DHASH_PPM_HEX = (
    "concat('50360A313120360A3235350A', "  # 'P6\n11 6\n255\n'
    "array_join(transform(sequence(0, 65), j -> "
    "  repeat(lpad(hex(128 + 2 * bit_count({hd} & shiftleft("
    "    shiftleft(CAST(1 AS BIGINT), CAST(j % 11 AS INT)) - 1,"
    "    CAST(10 * (j div 11) AS INT))) - j % 11), 2, '0'), 3)"
    "), ''))"
).format(hd=_DH_DOC)


def q159_perceptual_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image near-dup, decoder→dedup end to end: synthesize
    gradient-coded PPM rasters JVM-side, fingerprint them with the
    REAL raster path (decode_raster → integer grayscale → NN grid →
    dHash bits, operators/multimodal.dhash_fingerprints), then find
    every hamming≤2 pair with the exact pigeonhole band join
    (operators/dedup.hamming_near_pairs — 3 bands of 20 bits, never
    all-pairs). Plan shape: narrow-scan rebalance → one Arrow decode
    stage → banded self-join on (band, bh) → bit_count verify."""
    from synthea_etl_spark.operators.multimodal import (
        DHASH_BITS_TOTAL,
        dhash_fingerprints,
    )

    d = rebalance_by_key(
        load(spark, sf_dir, "documents").select("doc_id"), "doc_id"
    )
    shaped = d.select(
        F.col("doc_id").alias("id"),
        F.unhex(F.expr(_DHASH_PPM_HEX)).alias("payload"),
    )
    fps = dhash_fingerprints(shaped)
    return D.hamming_near_pairs(fps, "id", "dhash", DHASH_BITS_TOTAL, 2)


# DuckDB twin: the target hash is closed-form in doc_id, so the
# oracle skips the raster entirely — brute-force bit_count(xor) <= 2
# over the planned hashes. A match therefore certifies that the
# engine's decode→dHash pipeline recovered EXACTLY the planned bits.
ORACLE_Q159 = """
WITH h AS (
  SELECT doc_id,
         xor(CAST(concat('0x', substr(md5('dh' || CAST(doc_id // 4 AS VARCHAR)), 1, 15)) AS BIGINT),
             CASE WHEN doc_id % 4 = 0 THEN 0
                  ELSE (CAST(1 AS BIGINT) << (doc_id % 4)) END) AS dh
  FROM documents
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.dh, b.dh)) AS INTEGER) AS hamming
FROM h a JOIN h b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dh, b.dh)) <= 2
"""


# ---------------------------------------------------------------------------
# q160 IVF ANN, seed-only quantizer (exact SQL twin of the IVF machinery)
# ---------------------------------------------------------------------------


def q160_knn_ann_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q43 IVF path with lloyd_iters=0: centroids are the 16
    corpus vectors of smallest md5(vec_id) (similarity.
    ivf_train_centroids seeds — deterministic, no RNG), so corpus
    assignment (first-max cosine), query probing (top-4 cells by
    9dp-rounded cosine, stable ties) and in-cell scoring are all
    closed-form — the whole IVF *machinery* gets an exact DuckDB twin
    while q43 keeps the Lloyd-refined quantizer under its recall
    test. Same 100 TB shape as q43: UDF assignment is one matmul per
    Arrow batch, candidates come from an equi-join on the cell id."""
    e = load(spark, sf_dir, "embeddings")
    return S.knn_ann_ivf(
        e,
        e.filter(F.col("vec_id") < 10),
        k=5,
        n_centroids=16,
        n_probe=4,
        lloyd_iters=0,
    )


ORACLE_Q160 = """
WITH c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS cv
           FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(neighbor_id AS VARCHAR))) - 1
           AS cid
  FROM c
  ORDER BY md5(CAST(neighbor_id AS VARCHAR))
  LIMIT 16
),
asg AS (
  SELECT neighbor_id, cv, cid FROM (
    SELECT neighbor_id, cv, cid,
           row_number() OVER (PARTITION BY neighbor_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cid ASC) AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10),
probe AS (
  SELECT query_id, qv, cid FROM (
    SELECT query_id, qv, cid,
           row_number() OVER (PARTITION BY query_id
               ORDER BY round(list_cosine_similarity(qv, sv), 9) DESC,
                        cid ASC) AS rn
    FROM q CROSS JOIN seeds
  ) WHERE rn <= 4
),
scored AS (
  SELECT p.query_id, a.neighbor_id,
         round(list_cosine_similarity(p.qv, a.cv), 6) AS sim
  FROM probe p JOIN asg a USING (cid)
  WHERE a.neighbor_id <> p.query_id
)
SELECT query_id, neighbor_id, sim, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# q161 model-based quality filtering (hashed linear classifier)
# ---------------------------------------------------------------------------


def q161_quality_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fastText/CCNet-style classifier filter every pretraining
    corpus passes through, in its at-scale plan shape: hash each
    token into a 4096-bucket feature space, sum the bucket weights
    (here a deterministic md5-derived stand-in for a trained vector;
    production swaps in a broadcast weight lookup — same plan),
    normalize once. One explode + one per-doc aggregate riding the
    doc partitioning; exact int64 accumulation makes the margin
    bit-stable at any parallelism (operators/retrieval.py)."""
    from synthea_etl_spark.operators.retrieval import quality_model_score

    return quality_model_score(
        load(spark, sf_dir, "documents"), "text", "doc_id"
    )


ORACLE_Q161 = r"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT doc_id, UNNEST(w) AS t FROM toks),
wt AS (
  SELECT doc_id,
         (CAST(concat('0x', substr(md5('w' || CAST(
             CAST(concat('0x', substr(md5('q' || t), 1, 8)) AS BIGINT) % 4096
           AS VARCHAR)), 1, 8)) AS BIGINT) % 2001) - 1000 AS w
  FROM tok
)
SELECT doc_id,
       CAST(count(*) AS INTEGER) AS n_tokens,
       CAST(SUM(w) AS BIGINT) AS raw_margin,
       CAST(SUM(w) AS BIGINT) / (1000.0 * count(*)) AS margin,
       SUM(w) > 0 AS keep
FROM wt GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# q162 BM25 top-k retrieval
# ---------------------------------------------------------------------------


def q162_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical retrieval (k1=1.2, b=0.75, ratio-form idf): the
    texts of docs 0-2 serve as queries over the whole corpus, top-5
    each. Per-term scores are fixed IEEE expressions quantized to
    int64 micro-units BEFORE the per-doc sum, so the reduction is
    order-independent and hashes identically on both engines
    (operators/retrieval.bm25_topk)."""
    from synthea_etl_spark.operators.retrieval import bm25_topk

    docs = load(spark, sf_dir, "documents")
    queries = docs.filter(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    return bm25_topk(docs, queries, k=5)


def _sql_bm25_oracle() -> str:
    from synthea_etl_spark.operators.retrieval import BM25_B, BM25_K1, MICRO

    # interpolate the EXACT Python float literals the engine uses so
    # both expression trees are the same IEEE computation
    k1p1, k1 = repr(BM25_K1 + 1.0), repr(BM25_K1)
    omb, b = repr(1.0 - BM25_B), repr(BM25_B)
    return f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w
  FROM documents WHERE length(trim(text)) > 0
),
tok AS (SELECT doc_id, UNNEST(w) AS t FROM toks),
tf AS (SELECT doc_id, t, count(*) AS tf FROM tok GROUP BY doc_id, t),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
stats AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT SUM(dl) FROM dl) AS total_len
),
dft AS (SELECT t, count(*) AS df FROM tf GROUP BY t),
qt AS (SELECT DISTINCT doc_id AS query_id, t FROM tok WHERE doc_id < 3),
term_scores AS (
  SELECT qt.query_id, tf.doc_id,
         CAST(floor(
           ((n_docs - df + 0.5) / (df + 0.5))
           * ((tf * {k1p1}) / (tf + {k1} * ({omb} + ({b} * dl)
               / (CAST(total_len AS DOUBLE) / n_docs))))
           * {MICRO} + 0.5) AS BIGINT) AS m
  FROM tf
  JOIN dl USING (doc_id)
  JOIN dft USING (t)
  JOIN qt USING (t)
  CROSS JOIN stats
),
per_doc AS (
  SELECT query_id, doc_id, SUM(m) AS micro_score
  FROM term_scores GROUP BY query_id, doc_id
)
SELECT query_id, doc_id,
       CAST(micro_score AS BIGINT) / {MICRO} AS score,
       CAST(rank AS INTEGER) AS rank
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY query_id ORDER BY micro_score DESC, doc_id) AS rank
  FROM per_doc
) WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# q163 duplicated-span detection (substring-level exact dedup)
# ---------------------------------------------------------------------------

_FOOTER = (
    " standard legal footer text follows here every single time verbatim"
)
_SPAN_N = 8


def _footer_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q163/q164 fixture corpus: docs with doc_id%3 == 0 carry a
    shared 10-token boilerplate footer (synthesized in-query)."""
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.col("text"), F.lit(_FOOTER)),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


# the shared oracle CTE chain: fixture corpus -> token windows ->
# corpus-duplicated window set -> gaps-and-islands span merge -> the
# (doc_id, s, e) span list + per-doc token counts. q163 rolls the
# spans up; q164 applies the cut. ONE definition so the two gates can
# never drift apart.
_SQL_SPAN_CTES = rf"""
doc2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || '{_FOOTER}' ELSE text END
           AS text
  FROM documents
),
toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS w
  FROM doc2 WHERE length(trim(text)) > 0
),
win AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         CAST(concat('0x', substr(md5(
           array_to_string(list_slice(w, i + 1, i + {_SPAN_N}), ' ')
         ), 1, 15)) AS BIGINT) AS h
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(0, len(w) - {_SPAN_N})) AS i
  ) u
  WHERE len(w) >= {_SPAN_N}
),
dup AS (SELECT h FROM win GROUP BY h HAVING count(*) > 1),
marks AS (SELECT doc_id, pos FROM win JOIN dup USING (h)),
flag AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                > {_SPAN_N} THEN 1 ELSE 0 END AS ni
  FROM marks
),
isl AS (
  SELECT doc_id, pos,
         SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS UNBOUNDED PRECEDING) AS island
  FROM flag
),
spans AS (
  SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + {_SPAN_N} AS e
  FROM isl GROUP BY doc_id, island
),
base AS (
  SELECT doc_id,
         CAST(CASE WHEN length(trim(text)) = 0 THEN 0
              ELSE len(string_split_regex(trim(text), '\s+')) END
           AS INTEGER) AS n_tokens
  FROM doc2
)
"""


def q163_duplicated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level exact dedup — the published duplicated-passage
    removal shape: docs with doc_id%3 == 0 carry a shared 10-token
    boilerplate footer (synthesized in-query, like every fixture
    family), and the operator must recover, per doc, the maximal
    token spans whose 8-gram windows all repeat somewhere in the
    corpus (operators/dedup.duplicated_spans: windowed explode →
    60-bit window-hash duplicate set → mark join → gaps-and-islands
    span merge → per-doc rollup with zeros preserved). Catches the
    boilerplate document-level dedup never sees."""
    return D.duplicated_spans(
        _footer_docs(spark, sf_dir), "text", "doc_id", _SPAN_N
    )


ORACLE_Q163 = f"""
WITH {_SQL_SPAN_CTES.strip()},
perdoc AS (
  SELECT doc_id, CAST(count(*) AS INTEGER) AS n_dup_spans,
         CAST(SUM(e - s) AS BIGINT) AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT base.doc_id, n_tokens,
       COALESCE(n_dup_spans, 0) AS n_dup_spans,
       CAST(COALESCE(dup_tokens, 0) AS BIGINT) AS dup_tokens,
       COALESCE(dup_tokens, 0) / CAST(n_tokens AS DOUBLE) AS dup_frac
FROM base LEFT JOIN perdoc ON base.doc_id = perdoc.doc_id
WHERE n_tokens >= {_SPAN_N}
"""


# ---------------------------------------------------------------------------
# q164 duplicated-span REMOVAL (the cut q163 reports)
# ---------------------------------------------------------------------------


def q164_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the substring-dedup cut on the q163 fixture corpus:
    every token inside a duplicated span is dropped and the
    survivors re-join (operators/dedup.remove_duplicated_spans — a
    JVM higher-order filter with a positional exists() test; all
    occurrences removed, the documented divergence from keep-one).
    The cleaned corpus is what a training pipeline actually feeds
    downstream; hash-matching text + counts certifies the span
    arithmetic AND the cut."""
    return D.remove_duplicated_spans(
        _footer_docs(spark, sf_dir), "text", "doc_id", _SPAN_N
    )


ORACLE_Q164 = f"""
WITH {_SQL_SPAN_CTES.strip()},
tokpos AS (
  SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, w[i] AS t
  FROM toks, LATERAL (
    SELECT UNNEST(generate_series(1, len(w))) AS i
  ) u
),
kept AS (
  SELECT tp.doc_id, tp.pos, tp.t
  FROM tokpos tp
  WHERE NOT EXISTS (
    SELECT 1 FROM spans sp
    WHERE sp.doc_id = tp.doc_id AND tp.pos >= sp.s AND tp.pos < sp.e
  )
),
agg AS (
  SELECT doc_id,
         CAST(count(*) AS INTEGER) AS kept_tokens,
         string_agg(t, ' ' ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT base.doc_id, n_tokens,
       COALESCE(kept_tokens, 0) AS kept_tokens,
       COALESCE(clean_text, '') AS clean_text
FROM base LEFT JOIN agg ON base.doc_id = agg.doc_id
"""


# ---------------------------------------------------------------------------
# q165 semantic deduplication (SemDeDup shape, seed-only quantizer)
# ---------------------------------------------------------------------------

SEMDEDUP_T = 0.4  # this corpus's cosine ceiling is ~0.51: real drops


def q165_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Published SemDeDup shape over the embeddings table: 16-cell
    seed-only quantizer (closed-form, as q160), in-cluster exact
    cosine pairs, min-id-wins keeper rule. The cluster bound turns
    n^2 pair work into sum-over-clusters |c|^2 — the method's whole
    point at 100 TB — at the documented cost of missing cross-cluster
    near-dups. Output: every vector with (cluster, keep)."""
    return S.semantic_dedup(
        load(spark, sf_dir, "embeddings"),
        n_centroids=16,
        threshold=SEMDEDUP_T,
        lloyd_iters=0,
    )


ORACLE_Q165 = f"""
WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
seeds AS (
  SELECT cv AS sv,
         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR))) - 1 AS cid
  FROM c
  ORDER BY md5(CAST(vec_id AS VARCHAR))
  LIMIT 16
),
asg AS (
  SELECT vec_id, cv, cid FROM (
    SELECT vec_id, cv, cid,
           row_number() OVER (PARTITION BY vec_id
               ORDER BY list_cosine_similarity(cv, sv) DESC, cid ASC) AS rn
    FROM c CROSS JOIN seeds
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM asg a JOIN asg b
    ON a.cid = b.cid AND a.vec_id < b.vec_id
  WHERE round(list_cosine_similarity(a.cv, b.cv), 6) >= {SEMDEDUP_T}
)
SELECT asg.vec_id, CAST(cid AS INTEGER) AS cluster,
       dropped.vec_id IS NULL AS keep
FROM asg LEFT JOIN dropped ON asg.vec_id = dropped.vec_id
"""


# ---------------------------------------------------------------------------
# q166 per-group embedding centroids (exact-mean array aggregate)
# ---------------------------------------------------------------------------


def q166_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-centroid aggregate: vectors grouped by vec_id % 8 (a
    deterministic stand-in for a source/domain key), per-dimension
    EXACT decimal-sum means (operators/similarity
    .group_embedding_centroid_dims). The decimal accumulation is what
    makes a float mean reproducible at any parallelism — the same
    order-independence discipline the money sums use
    (plans/common.dsum), demonstrated over array columns. The gated
    frame is the exploded scalar (grp, pos, m, n_vecs) shape — one
    row per (group, dimension) — so every comparison harness can sort
    and hash it; ``group_embedding_centroids`` re-assembles the
    array-shaped centroids for library callers."""
    e = load(spark, sf_dir, "embeddings").select(
        (F.col("vec_id") % 8).alias("grp"), "embedding"
    )
    return S.group_embedding_centroid_dims(e, "grp").select(
        "grp", F.col("pos").cast("int").alias("pos"), "m", "n_vecs"
    )


ORACLE_Q166 = """
WITH ex AS (
  SELECT vec_id % 8 AS grp, i - 1 AS pos, CAST(e[i] AS DECIMAL(25,6)) AS x
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
       LATERAL (SELECT UNNEST(generate_series(1, len(e))) AS i) u
)
SELECT grp, CAST(pos AS INTEGER) AS pos,
       CAST(SUM(x) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS m,
       CAST(count(*) AS INTEGER) AS n_vecs
FROM ex GROUP BY grp, pos
"""


QUERIES: dict[str, QuerySpec] = {
    "q158_incremental_minhash": QuerySpec(
        q158_incremental_minhash,
        _sql_incremental_minhash_oracle(),
        "incremental MinHash near-dedup: new batch vs persisted band index",
        ("llm", "dedup"),
    ),
    "q159_perceptual_near_dup": QuerySpec(
        q159_perceptual_near_dup,
        ORACLE_Q159,
        "perceptual dHash near-dup over decoded rasters",
        ("llm", "dedup", "multimodal"),
    ),
    "q160_knn_ann_ivf_seeded": QuerySpec(
        q160_knn_ann_ivf_seeded,
        ORACLE_Q160,
        "IVF ANN with seed-only quantizer (exact SQL twin)",
        ("llm", "similarity"),
    ),
    "q161_quality_model": QuerySpec(
        q161_quality_model,
        ORACLE_Q161,
        "hashed-linear quality classifier scoring",
        ("llm", "quality"),
    ),
    "q162_bm25_topk": QuerySpec(
        q162_bm25_topk,
        _sql_bm25_oracle(),
        "BM25 top-k lexical retrieval (micro-quantized exact sums)",
        ("llm", "retrieval"),
    ),
    "q163_duplicated_spans": QuerySpec(
        q163_duplicated_spans,
        ORACLE_Q163,
        "substring-level exact dedup: maximal duplicated token spans",
        ("llm", "dedup"),
    ),
    "q164_remove_dup_spans": QuerySpec(
        q164_remove_dup_spans,
        ORACLE_Q164,
        "duplicated-span removal: the cleaned corpus",
        ("llm", "dedup"),
    ),
    "q165_semantic_dedup": QuerySpec(
        q165_semantic_dedup,
        ORACLE_Q165,
        "SemDeDup: cluster-bounded embedding dedup (seed quantizer)",
        ("llm", "dedup", "similarity"),
    ),
    "q166_embedding_centroids": QuerySpec(
        q166_embedding_centroids,
        ORACLE_Q166,
        "per-group embedding centroids (exact decimal-sum means)",
        ("llm", "similarity"),
    ),
}
