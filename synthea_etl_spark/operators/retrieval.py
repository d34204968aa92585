"""Retrieval + model-based filtering operators for LLM data
pipelines: hashed-linear quality scoring (the fastText/CCNet-style
classifier filter every pretraining corpus passes through) and BM25
top-k retrieval (the lexical retriever of RAG/eval pipelines).

Beyond-reference surface (BASELINE.json north star; the reference
has no text models). Public knowledge only: the hashing-trick linear
classifier (Weinberger et al. 2009) and the published BM25 ranking
function (Robertson/Sparck Jones).

Scale design (100 TB):
- quality scoring: one explode + one per-doc aggregate — weights are
  an expression on the hashed bucket here (a deterministic stand-in
  for trained weights); a REAL weight vector is a broadcast map
  lookup in the same plan shape. All-integer accumulation, one final
  division: scores are bit-identical at any parallelism.
- BM25: document frequencies and lengths are two narrow aggregates;
  query terms broadcast; per-term float64 scores are each a fixed
  IEEE expression (deterministic), then quantized to integer
  micro-units BEFORE the per-doc sum so the reduction is
  order-independent — the same exact-aggregation discipline as
  plans/common.exact_agg. Ratio-form idf ((N-df+.5)/(df+.5), no
  log) keeps both engines bit-identical; it is a monotone transform
  of the classic log idf, so rankings match the textbook scorer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from synthea_etl_spark.operators.text import tokens
from synthea_etl_spark.operators.util import rebalance_by_key

QUALITY_DIM = 4096  # hashed feature space
WEIGHT_SPAN = 1000  # weights are integers in [-WEIGHT_SPAN, WEIGHT_SPAN]


def _bucket(col: Column) -> Column:
    """Token -> feature bucket via the engine-portable md5 hash."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("q"), col)), 1, 8), 16, 10)
        .cast("long")
        % QUALITY_DIM
    )


def _weight(bucket: Column) -> Column:
    """Deterministic pseudo-weight per bucket (stand-in for a trained
    vector; integer in [-1000, 1000])."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("w"), bucket.cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % (2 * WEIGHT_SPAN + 1)
        - WEIGHT_SPAN
    )


def quality_model_score(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Score every document with a hashed-bag-of-words linear model:
    margin = sum over tokens of w[h(token)] / (SPAN * n_tokens) —
    a normalized score in [-1, 1]; keep = margin > 0. The sum is
    exact int64 (bounded by SPAN * n_tokens << 2^63), so the score is
    one deterministic division — hash-stable at any parallelism."""
    tok = rebalance_by_key(
        df.select(id_col, text_col), id_col
    ).select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    scored = tok.select(
        F.col(id_col), _weight(_bucket(F.col("t"))).alias("w")
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_tokens"),
            F.sum("w").alias("raw_margin"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            "raw_margin",
            (
                F.col("raw_margin")
                / (F.lit(float(WEIGHT_SPAN)) * F.col("n_tokens"))
            ).alias("margin"),
            (F.col("raw_margin") > 0).alias("keep"),
        )
    )


BM25_K1 = 1.2
BM25_B = 0.75
MICRO = 1_000_000


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
) -> DataFrame:
    """BM25 lexical retrieval: top-``k`` docs per query.

    Plan shape: (1) per-doc term frequencies + doc length (one
    explode + one agg on the doc-partitioned frame — no extra
    shuffle), (2) document frequencies (one agg on the term key),
    (3) the tiny (query_id, term) frame broadcast against the
    postings, (4) per-(query, doc) accumulation of micro-quantized
    term scores, (5) window top-k. Each per-term score is a fixed
    IEEE-double expression on integers (deterministic on any
    engine); quantizing to int64 micro-units BEFORE the sum makes
    the per-doc reduction order-independent, so results hash
    identically at any parallelism — and in DuckDB."""
    toks = rebalance_by_key(
        docs.select(id_col, text_col), id_col
    ).select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    # per-doc postings: tf rides the id partitioning (no new shuffle).
    # The three consumers below (dl, document frequencies, the scoring
    # join) each re-plan this explode+aggregate subtree — deliberately
    # NOT materialized: a localCheckpoint of the postings was measured
    # SLOWER at sf1 (2.4 s vs 1.7 s steady-state) because the
    # re-planned passes are embarrassingly parallel map-side codegen
    # while the checkpoint adds a block-manager barrier the size of
    # the posting list. Redundant narrow compute beats materialized
    # state here; revisit only if the corpus/vocab ratio changes the
    # balance. For a STANDING corpus queried repeatedly, persist the
    # postings as a real inverted-index table instead
    # (``inverted_index`` + ``bm25_topk_from_index`` below).
    tf = toks.groupBy(id_col, "t").agg(F.count("*").alias("tf"))
    dl = tf.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = docs.select(F.count("*").cast("long").alias("n_docs")).crossJoin(
        dl.select(F.sum("dl").cast("long").alias("total_len"))
    )
    df_t = tf.groupBy("t").agg(F.count("*").cast("long").alias("df"))

    return _bm25_score_topk(
        tf, dl, stats, df_t, queries, id_col, query_id_col,
        query_text_col, k,
    )


def _bm25_score_topk(
    tf: DataFrame,
    dl: DataFrame,
    stats: DataFrame,
    df_t: DataFrame,
    queries: DataFrame,
    id_col: str,
    query_id_col: str,
    query_text_col: str,
    k: int,
) -> DataFrame:
    """The shared BM25 scoring tail: broadcast the (query, term)
    frame against the postings, micro-quantize each per-term score,
    order-independent per-doc sum, window top-k. Both the
    recompute-per-call path (``bm25_topk``) and the persisted-index
    path (``bm25_topk_from_index``) end here, so their rankings can
    never drift apart."""
    q_terms = queries.select(
        F.col(query_id_col), F.explode(tokens(query_text_col)).alias("t")
    ).distinct()

    joined = (
        tf.join(dl, id_col)
        .join(F.broadcast(df_t.join(F.broadcast(q_terms), "t")), "t")
        .crossJoin(F.broadcast(stats))
    )
    # avgdl = total_len / n_docs: one exact division; the full term
    # score is written as ONE expression so both engines evaluate
    # the identical IEEE operation tree
    avgdl = F.col("total_len") / F.col("n_docs")
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (
        F.col("df") + F.lit(0.5)
    )
    tscore = idf * (
        F.col("tf")
        * F.lit(BM25_K1 + 1.0)
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * F.col("dl") / avgdl)
        )
    )
    micro = F.floor(tscore * MICRO + F.lit(0.5)).cast("long")
    per_doc = (
        joined.select(F.col(query_id_col), F.col(id_col), micro.alias("m"))
        .groupBy(query_id_col, id_col)
        .agg(F.sum("m").alias("micro_score"))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("micro_score"), F.asc(id_col)
    )
    return (
        per_doc.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            query_id_col,
            id_col,
            (F.col("micro_score") / MICRO).alias("score"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def inverted_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The PERSISTABLE half of lexical retrieval: the postings table
    — one (t, doc_id, tf) row per distinct term per document. Write
    it bucketed by ``t`` once per ingested corpus slice; queries then
    probe the stored table (``bm25_topk_from_index``) with no corpus
    rescan and no re-tokenization — the retrieval analog of the
    q151/q158/`ivf_index` incremental indexes.

    Incremental maintenance is append-only: rows are per (doc, term)
    under a FIXED tokenizer, so for disjoint doc batches
    index(A) ∪ index(B) == index(A ∪ B) exactly (tested). The
    derived statistics BM25 needs — document frequencies, doc
    lengths, corpus totals — are all narrow aggregates OVER the
    index itself, so there are no side tables to keep in sync: df
    per term is `count(*)` over the term's postings, dl per doc is
    `sum(tf)`, and both update automatically when a batch appends.
    At 100 TB the postings table is ~tokens-sized but term-bucketed:
    a query's probe touches only its terms' buckets."""
    toks = rebalance_by_key(
        docs.select(id_col, text_col), id_col
    ).select(F.col(id_col), F.explode(tokens(text_col)).alias("t"))
    return toks.groupBy("t", id_col).agg(
        F.count("*").cast("long").alias("tf")
    )


def bm25_topk_from_index(
    index: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 5,
) -> DataFrame:
    """BM25 top-``k`` against a persisted ``inverted_index`` table:
    document frequencies, doc lengths, and corpus totals derive from
    the postings by three narrow aggregates (no corpus rescan), then
    the shared scoring tail ranks. One statistics nuance, by design:
    ``n_docs`` here counts documents WITH at least one token (the
    only docs the index can see); ``bm25_topk`` counts every corpus
    row. On a corpus with no empty documents the two paths are
    bit-identical (tested); with empty docs the index path's idf is
    computed over the retrievable corpus — the defensible choice for
    a standing index, and empty docs can never be retrieved either
    way."""
    dl = index.groupBy(id_col).agg(F.sum("tf").alias("dl"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("dl").cast("long").alias("total_len"),
    )
    df_t = index.groupBy("t").agg(F.count("*").cast("long").alias("df"))
    return _bm25_score_topk(
        index, dl, stats, df_t, queries, id_col, query_id_col,
        query_text_col, k,
    )


def positional_index(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Positional postings — (t, doc_id, pos), one row per token
    OCCURRENCE: the index layout phrase/proximity queries need (the
    tf table ``inverted_index`` builds cannot see adjacency). Same
    persistence/maintenance story as the tf postings: per-occurrence
    rows under a fixed tokenizer, so disjoint-batch union equals the
    rebuilt index, written term-bucketed, stats derivable by narrow
    aggregates. Corpus-token-sized (bigger than the tf table by the
    mean tf) — the classic positional-index trade."""
    return rebalance_by_key(
        docs.select(id_col, text_col), id_col
    ).select(
        F.col(id_col),
        F.posexplode(tokens(text_col)).alias("pos", "t"),
    ).select("t", id_col, F.col("pos").cast("int").alias("pos"))


def phrase_search(
    index: DataFrame,
    phrases: DataFrame,
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    terms_col: str = "terms",
) -> DataFrame:
    """Exact phrase search over a positional index with the
    single-join ALIGNMENT trick: explode each phrase to (phrase_id,
    qpos, t); every matching index occurrence votes for the
    candidate start ``pos - qpos``; a start collecting all n_terms
    DISTINCT qpos votes is a full phrase occurrence. ONE broadcast
    join + one aggregate — no per-term join chain, so a 7-word
    phrase costs the same plan as a 2-word one. Repeated terms in a
    phrase are handled by the distinct-qpos count. Returns
    (phrase_id, doc_id, n_occurrences). 100 TB shape: the phrase
    frame broadcasts; the index side shuffles once on the alignment
    key; with the index term-bucketed the probe reads only the
    phrase terms' buckets."""
    qt = phrases.select(
        F.col(phrase_id_col),
        F.size(terms_col).alias("_n_terms"),
        F.posexplode(terms_col).alias("qpos", "t"),
    )
    aligned = index.join(F.broadcast(qt), "t").select(
        F.col(phrase_id_col),
        F.col(id_col),
        (F.col("pos") - F.col("qpos")).alias("_start"),
        "qpos",
        "_n_terms",
    )
    full = (
        aligned.groupBy(phrase_id_col, id_col, "_start", "_n_terms")
        .agg(F.count_distinct("qpos").alias("_hits"))
        .filter(F.col("_hits") == F.col("_n_terms"))
    )
    return full.groupBy(phrase_id_col, id_col).agg(
        F.count("*").cast("long").alias("n_occurrences")
    )


def proximity_search(
    index: DataFrame,
    term_sets: DataFrame,
    window: int,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    terms_col: str = "terms",
    segment_positions: int = 4096,
) -> DataFrame:
    """Sloppy/proximity retrieval over the positional index: a doc
    matches query q iff SOME window of ``window`` consecutive token
    positions contains ALL of q's (distinct) terms. Exactness rests
    on the classic argument that a minimal covering window starts at
    a term occurrence — so candidate starts are exactly the matching
    occurrences themselves: a start whose window [start, start +
    window) covers all n_terms distinct terms is a witness. Returns
    (query_id, doc_id, n_starts) — n_starts > 0 means match, and the
    count grades how densely the terms co-occur.

    Scale: per (query, doc, SEGMENT) the query-term occurrences are
    collected into one pos-sorted (pos, term, is_start) array and
    windowized with a two-pointer sweep — O(T) in the per-doc
    query-term occurrence count T, never the T² of an occurrence
    self-join. The segment bound makes the collected row itself
    BOUNDED: positions split into spans of S =
    max(window, segment_positions) tokens, and each occurrence lands
    in its own segment as a candidate start plus (when pos % S <
    window) in the previous segment as context-only — so a stop-word
    query term in an arbitrarily long document costs ≤ 2S struct
    entries per row instead of one unbounded array (the ADVICE round-9
    per-row memory-spike finding). Exactness: a minimal covering
    window starts at an occurrence; a start's window extends < window
    past its segment end, and exactly those occurrences are present
    as context, so per-segment start counts sum to the global count.
    The term-set frame broadcasts; the index side shuffles once on
    (query, doc, segment) pruned to query terms; the per-(query, doc)
    total is one more (tiny, per-segment-counts) partial aggregate."""
    from pyspark.sql.functions import pandas_udf

    seg = max(int(window), int(segment_positions))
    qt = term_sets.select(
        F.col(query_id_col),
        F.size(F.array_distinct(F.col(terms_col))).alias("_n_terms"),
        F.explode(F.array_distinct(F.col(terms_col))).alias("t"),
    )
    occ = index.join(F.broadcast(qt), "t").select(
        F.col(query_id_col), F.col(id_col), "t", "pos", "_n_terms"
    )
    # r15 optimization (guide §1.2): start rows and context rows
    # were a unionByName of TWO branches over ``occ``, so the whole
    # index-join subtree (the positional explode over the corpus)
    # planned and ran twice. One explode now emits each occurrence's
    # 1-2 (segment, is_start) assignments in a single pass — the
    # identical row multiset (every occurrence as a start in its own
    # segment, plus a context-only copy in the previous segment when
    # pos % S < window), groupBy order-insensitive as before.
    seg_assign = F.expr(
        f"filter(array("
        f"struct(pos div {seg} AS _seg, true AS _is_start),"
        f"IF(pos % {seg} < {window} AND pos div {seg} > 0,"
        f" struct(pos div {seg} - 1 AS _seg, false AS _is_start),"
        f" CAST(NULL AS struct<_seg:bigint,_is_start:boolean>))"
        f"), x -> x IS NOT NULL)"
    )
    grouped = (
        occ.select("*", F.explode(seg_assign).alias("_sc"))
        .select(
            F.col(query_id_col),
            F.col(id_col),
            "t",
            "pos",
            "_n_terms",
            F.col("_sc._seg").alias("_seg"),
            F.col("_sc._is_start").alias("_is_start"),
        )
        .groupBy(query_id_col, id_col, "_seg", "_n_terms")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("pos", "t", "_is_start"))
            ).alias("_occ")
        )
    )

    @pandas_udf("long")
    def n_starts_udf(occs: pd.Series, n_terms: pd.Series) -> pd.Series:
        out = []
        for ps, nt in zip(occs, n_terms):
            # ps: pos-sorted [(pos, t, is_start), ...]; candidate
            # starts are the segment's own occurrences (a minimal
            # covering window starts at one); context rows complete
            # windows that spill past the segment end. Two pointers:
            # for left occurrence i, advance r to the first occurrence
            # with pos >= pos[i] + window while maintaining per-term
            # window counts -- each occurrence enters and leaves the
            # window once, O(T).
            pos = [p["pos"] for p in ps]
            term = [p["t"] for p in ps]
            is_start = [p["_is_start"] for p in ps]
            counts: dict = {}
            distinct = 0
            r = 0
            n = len(pos)
            n_starts = 0
            for i in range(n):
                while r < n and pos[r] < pos[i] + window:
                    c = counts.get(term[r], 0)
                    counts[term[r]] = c + 1
                    if c == 0:
                        distinct += 1
                    r += 1
                if (
                    is_start[i]
                    and distinct == nt
                    and (i == 0 or pos[i] != pos[i - 1])
                ):
                    n_starts += 1
                c = counts[term[i]]
                counts[term[i]] = c - 1
                if c == 1:
                    distinct -= 1
            out.append(n_starts)
        return pd.Series(out, dtype="int64")

    return (
        grouped.withColumn(
            "_n_starts", n_starts_udf(F.col("_occ"), F.col("_n_terms"))
        )
        .groupBy(query_id_col, id_col)
        .agg(F.sum("_n_starts").cast("long").alias("n_starts"))
        .filter(F.col("n_starts") > 0)
        .select(query_id_col, id_col, "n_starts")
    )


RRF_MICRO = 10**12


def rrf_fuse(
    rankings: list[DataFrame],
    k0: int = 60,
    topk: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Reciprocal-rank fusion of N retrieval arms (the standard
    hybrid-search combiner: lexical BM25 + dense ANN, or any mix):
    fused(d) = Σ_arms 1/(k0 + rank_arm(d)), summed over the arms
    that returned d, then top-``topk`` per query by fused score.

    Contributions are integer micro-units — floor(1e12 / (k0+rank))
    — so the SUM is exact integer arithmetic: order-independent
    across any number of arms and bit-identical on any engine
    (float accumulation order would be partition-dependent for
    N > 2). Returns (query_col, id_col, rrf_micro, n_arms, rank).

    Scale: each arm's frame is already top-k-per-query (tiny); one
    unionByName, one groupBy on (query, id), one per-query window
    over ≤ N·k rows. No join against corpus data."""
    from functools import reduce

    contribs = [
        r.select(
            F.col(query_col),
            F.col(id_col),
            F.floor(F.lit(float(RRF_MICRO)) / (F.lit(k0) + F.col(rank_col)))
            .cast("long")
            .alias("_c"),
        )
        for r in rankings
    ]
    u = reduce(lambda a, b: a.unionByName(b), contribs)
    fused = u.groupBy(query_col, id_col).agg(
        F.sum("_c").alias("rrf_micro"),
        F.count("*").cast("int").alias("n_arms"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_micro"), F.asc(id_col)
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= topk)
        .select(
            query_col, id_col, "rrf_micro", "n_arms",
            F.col("rank").cast("int").alias("rank"),
        )
    )
