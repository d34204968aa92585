"""Equivalence pins for the r15 codegen rewrites of the per-token
text expressions (operators/text.nonws_char_count /
alpha_token_count / stopword_token_count, consumed by
gopher_quality_ok, q188, q225, q226).

The old forms — interpreted higher-order array lambdas over
``tokens()`` — are reproduced INLINE here and compared row-for-row
(including null handling) against the shipped regexp forms on an
adversarial corpus: empty/whitespace-only text, tab/newline
separators (``trim`` strips only spaces, so a leading tab yields an
empty first token), adjacent stopwords, stopwords as prefixes of
longer words, case sensitivity, and unicode whitespace (U+00A0 is
NOT \\s in Java regex — both sides must treat it as a token char).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

import synthea_etl_spark.operators.text as T

ADVERSARIAL = [
    "",
    " ",
    "   ",
    "\t",
    "\ttext",
    "a  b",
    "the the",
    "and a to of in is the x",
    "to to",
    "Xa9 9X a",
    "word word",
    "a\tb\nc",
    None,
    "the quick brown fox jumps over the lazy dog " * 10,
    ". . . . . " * 30,
    "a " * 60,
    "The A OF In IS",  # case-sensitive: zero stopword hits
    "android toes offer",  # stopword prefixes: zero hits
    "x y the z",  # U+00A0 inside a token on both sides
    "café naïve the a",  # non-ASCII letters
    " leading and trailing ",
    "is",
    "is is",
    "\n\nthe\n\na\n\n",
]


def _old_sum_len(c):
    toks = T.tokens(c)
    return F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )


def _old_n_alpha(c):
    toks = T.tokens(c)
    return F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("long")


def _old_n_stop(c):
    toks = T.tokens(c)
    stops = F.array(*[F.lit(s) for s in T.STOPWORDS_EN])
    return F.size(
        F.filter(toks, lambda t: F.array_contains(stops, t))
    ).cast("long")


def _old_gopher_ok(c):
    toks = T.tokens(c)
    n = F.size(toks)
    nn = F.greatest(n, F.lit(1)).cast("long")
    return (
        (n.cast("long") >= 50)
        & (n.cast("long") <= 100_000)
        & (_old_sum_len(c) >= 3 * nn)
        & (_old_sum_len(c) <= 10 * nn)
        & (_old_n_alpha(c) * 5 >= nn * 4)
        & (_old_n_stop(c) >= 2)
    )


@pytest.fixture(scope="module")
def adv_df(spark):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(ADVERSARIAL)],
        "doc_id long, text string",
    )


def _assert_equiv(df, old_col, new_col):
    rows = df.select(
        "doc_id", old_col.alias("o"), new_col.alias("n")
    ).collect()
    bad = [r for r in rows if (r.o is None) != (r.n is None) or r.o != r.n]
    assert not bad, f"old/new disagree: {bad}"


def test_nonws_char_count_equiv(adv_df):
    _assert_equiv(adv_df, _old_sum_len("text"), T.nonws_char_count("text"))


def test_alpha_token_count_equiv(adv_df):
    _assert_equiv(adv_df, _old_n_alpha("text"), T.alpha_token_count("text"))


def test_stopword_token_count_equiv(adv_df):
    _assert_equiv(adv_df, _old_n_stop("text"), T.stopword_token_count("text"))


def test_gopher_quality_ok_equiv(adv_df):
    _assert_equiv(adv_df, _old_gopher_ok("text"), T.gopher_quality_ok("text"))


def test_gopher_quality_ok_equiv_corpus(spark):
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    _assert_equiv(docs, _old_gopher_ok("text"), T.gopher_quality_ok("text"))
