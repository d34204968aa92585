"""Round-8 LLM-pipeline operators: the persisted inverted index for
BM25 retrieval (plans/llm4.py over operators/retrieval.py).

Reference scope note: the reference has no retrieval surface; this
is builder's-brief training-data-pipeline scope.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from synthea_etl_spark.operators.retrieval import (
    bm25_topk,
    bm25_topk_from_index,
    inverted_index,
)

CORPUS = [
    (0, "spark shuffles data between stages"),
    (1, "parquet files store columnar data"),
    (2, "spark reads parquet files fast"),
    (3, "the quick brown fox jumps"),
    (4, "data pipelines move data between systems"),
    (5, "columnar formats compress data well"),
]


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _queries(spark):
    return spark.createDataFrame(
        [(100, "spark parquet data"), (101, "quick fox")],
        "query_id long, query_text string",
    )


def _ranking(df):
    return sorted(
        (r.query_id, r.rank, r.doc_id, r.score) for r in df.collect()
    )


def test_index_probe_matches_fresh_bm25(spark):
    """On a corpus with no empty documents, answering from the
    postings index is bit-identical to the recompute-per-call path —
    same micro-quantized scores, same ranks."""
    docs = _docs(spark, CORPUS)
    fresh = _ranking(bm25_topk(docs, _queries(spark), k=4))
    via_index = _ranking(
        bm25_topk_from_index(inverted_index(docs), _queries(spark), k=4)
    )
    assert fresh == via_index and len(fresh) > 0


def test_index_persisted_roundtrip_bucketed(spark, tmp_path):
    """The production shape: the postings table is WRITTEN (bucketed
    by term in a warehouse; plain parquet here) and a later session
    probes the stored table — results match probing the fresh
    frame."""
    docs = _docs(spark, CORPUS)
    path = str(tmp_path / "postings")
    inverted_index(docs).write.mode("overwrite").parquet(path)
    stored = spark.read.parquet(path)
    assert _ranking(
        bm25_topk_from_index(stored, _queries(spark), k=4)
    ) == _ranking(
        bm25_topk_from_index(inverted_index(docs), _queries(spark), k=4)
    )


def test_index_union_invariant(spark):
    """Incremental maintenance: for disjoint doc batches A and B,
    index(A) UNION index(B) == index(A ∪ B) exactly — appending a
    new batch's postings IS the index update, and every derived
    statistic (df, dl, totals) follows automatically."""
    a = _docs(spark, CORPUS[:3])
    b = _docs(spark, CORPUS[3:])
    both = _docs(spark, CORPUS)

    def rows(df):
        return sorted((r.t, r.doc_id, r.tf) for r in df.collect())

    unioned = inverted_index(a).unionByName(inverted_index(b))
    assert rows(unioned) == rows(inverted_index(both))

    # and the probe over the unioned index equals the full rebuild
    assert _ranking(
        bm25_topk_from_index(unioned, _queries(spark), k=4)
    ) == _ranking(
        bm25_topk_from_index(inverted_index(both), _queries(spark), k=4)
    )


def test_index_ignores_empty_docs_and_still_ranks(spark):
    """Empty/whitespace docs never enter the postings, and the index
    path's n_docs counts only indexed docs — empty docs cannot be
    retrieved and do not perturb idf for the docs that can."""
    docs = _docs(spark, CORPUS + [(90, "   "), (91, "")])
    idx = inverted_index(docs)
    assert idx.filter(F.col("doc_id") >= 90).count() == 0
    out = bm25_topk_from_index(idx, _queries(spark), k=10).collect()
    assert {r.doc_id for r in out}.isdisjoint({90, 91})
    # idf base equals the 6 indexed docs, not the 8 corpus rows:
    # identical to indexing the clean corpus alone
    clean = inverted_index(_docs(spark, CORPUS))
    assert _ranking(
        bm25_topk_from_index(idx, _queries(spark), k=10)
    ) == _ranking(bm25_topk_from_index(clean, _queries(spark), k=10))
