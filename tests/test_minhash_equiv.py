"""Bit-equality of the Arrow MinHash pass vs the original expression
pipeline (r16 optimization: dedup.minhash_signature moved from
explode+md5/conv+groupBy to one mapInArrow batch pass; the hash family
is md5-mirrored in the DuckDB oracle, so the outputs must be IDENTICAL,
not merely statistically equivalent).

Adversarial corpus: every tokenization edge the two implementations
could diverge on — Spark trim strips spaces only, Java regex \\s is
ASCII-only and split(limit=-1) keeps leading/trailing empty tokens,
concat_ws keeps empty strings, md5 runs over UTF-8 bytes."""

from __future__ import annotations

from pyspark.sql import Row

from synthea_etl_spark.operators.dedup import (
    _minhash_signature_expr,
    minhash_signature,
)

ADVERSARIAL_TEXTS = [
    None,  # null text -> no signature row
    "",  # empty -> dropped
    "   ",  # all spaces -> trimmed empty -> dropped
    "\t",  # trim keeps the tab; split -> ["", ""] -> too short
    "one two",  # < 3 tokens -> dropped
    "one two three",  # exactly one shingle
    "a b c d e f g",  # plain path
    "  leading and trailing spaces stripped  ",
    "\ttab-led text keeps a leading empty token after split",
    "tab\tseparated\ttokens\tsplit like spaces",
    "mixed \t whitespace\nnewline\rand\x0bvertical\x0cformfeed runs",
    "trailing tab keeps empty token\t",
    "double  space   collapses to one split",
    "unicode café straße 日本語 tokens",
    "nbsp is-not-java-whitespace so this is three",
    "dup dup dup dup dup dup",  # duplicate shingles (min insensitive)
    "a " * 200 + "tail",  # long doc, many identical shingles
    " ".join(f"w{i}" for i in range(500)),  # many distinct shingles
]


def _collect(df):
    return {
        r["doc_id"]: tuple(r[f"sig_{i}"] for i in range(32))
        for r in df.collect()
    }


def test_arrow_minhash_matches_expression_form(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(ADVERSARIAL_TEXTS)],
        schema="doc_id long, text string",
    )
    new = _collect(minhash_signature(docs, "text", "doc_id", 32, 3))
    old = _collect(_minhash_signature_expr(docs, "text", "doc_id", 32, 3))
    assert new == old
    # the drop set (no-shingle docs) must match too, not just the values
    assert set(new) == set(old)


def test_arrow_minhash_matches_on_real_corpus(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    new = _collect(minhash_signature(docs, "text", "doc_id", 32, 3))
    old = _collect(_minhash_signature_expr(docs, "text", "doc_id", 32, 3))
    assert new == old


def test_arrow_minhash_string_ids_and_other_params(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id="alpha", text="a b c d e"),
            Row(doc_id="beta", text="x y z"),
            Row(doc_id="gamma", text="too short"),
        ],
        schema="doc_id string, text string",
    )
    new = minhash_signature(docs, "text", "doc_id", 16, 2).collect()
    old = _minhash_signature_expr(docs, "text", "doc_id", 16, 2).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(new, key=key) == sorted(old, key=key)


def test_arrow_minhash_empty_frame(spark):
    docs = spark.createDataFrame([], schema="doc_id long, text string")
    assert minhash_signature(docs, "text", "doc_id", 32, 3).count() == 0
