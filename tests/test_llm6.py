"""Round-9 operator family, part 2: Gopher repetition filter,
unigram-LM nll quality scoring, and the pairwise source-overlap
matrix."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )


def test_gopher_repetition_fixture(spark, tmp_path, monkeypatch):
    """Hand-computable fixture: a clean doc keeps, a doc that is one
    5-gram repeated drops on every rule, and the micro fractions are
    the exact integer cov*1e6 div chars."""
    from synthea_etl_spark.plans.llm6 import q184_gopher_repetition_filter

    clean = " ".join(f"w{i:02d}" for i in range(30))  # all grams unique
    spam = "x y z w v x y z w v x y z w v"         # 5-gram repeated 3x
    p = str(tmp_path / "documents.parquet")
    _docs(
        spark, [(0, clean, "s"), (1, spam, "s"), (2, "a b", "s")]
    ).write.parquet(p)
    out = {
        r.doc_id: r.asDict()
        for r in q184_gopher_repetition_filter(
            spark, str(tmp_path)
        ).collect()
    }
    assert 2 not in out  # < 5 tokens: below the report's scope
    assert out[0]["keep"] is True
    # clean doc: every 2-gram unique -> max coverage = one occurrence
    # of a 7-char 2-gram ("w00 w01"); chars = 30*3 + 29 = 119
    assert out[0]["top2_frac_micro"] == 7 * 1_000_000 // 119
    assert out[0]["top3_frac_micro"] == 11 * 1_000_000 // 119
    assert out[0]["dup5_frac_micro"] == 0
    s = out[1]
    assert s["keep"] is False
    # spam doc: chars=29; top 2-gram "x y" occurs 3x (cov 9);
    # duplicated 5-grams: "x y z w v" 3x (len 9) + the 4 wrap grams
    # ("y z w v x" etc.) 2x each (len 9) -> cov 27 + 72 = 99 -> capped
    assert s["top2_frac_micro"] == 9 * 1_000_000 // 29
    assert s["dup5_frac_micro"] == 1_000_000  # capped at 1.0


def test_unigram_nll_quantized_vocab(spark, tmp_path):
    """nll is quantized once per distinct token, so a doc's mean is
    exactly the integer mean of its tokens' table values — verified
    against a NumPy-side recomputation of the same quantization."""
    from synthea_etl_spark.plans.llm6 import q185_unigram_nll_quality

    p = str(tmp_path / "documents.parquet")
    _docs(
        spark,
        [(0, "a a a b", "s"), (1, "b c", "s"), (2, "   ", "s")],
    ).write.parquet(p)
    out = {
        r.doc_id: r.asDict()
        for r in q185_unigram_nll_quality(spark, str(tmp_path)).collect()
    }
    assert 2 not in out  # blank text excluded
    n = 6  # total tokens: a:3 b:2 c:1
    q = lambda cnt: math.floor(  # noqa: E731
        round(-math.log(cnt / n), 6) * 1_000_000 + 0.5
    )
    assert out[0]["n_tokens"] == 4
    assert out[0]["nll_micro_mean"] == (3 * q(3) + q(2)) // 4
    assert out[1]["nll_micro_mean"] == (q(2) + q(1)) // 2
    assert out[1]["ppl_bucket"] == out[1]["nll_micro_mean"] // 500_000


def test_source_overlap_matrix_exact_on_small_sources(spark, tmp_path):
    """Three sources with known sharing: a/b share half their docs,
    c shares nothing. Corpora smaller than k make the bottom-k
    estimate EXACT (the union sketch holds every fingerprint), so
    jaccard_micro is the true Jaccard in micro-units."""
    from synthea_etl_spark.plans.llm6 import q186_source_overlap_matrix

    rows = []
    for i in range(8):
        rows.append((i, f"shared doc {i}" if i < 4 else f"a only {i}", "a"))
    for i in range(8):
        rows.append(
            (100 + i, f"shared doc {i}" if i < 4 else f"b only {i}", "b")
        )
    for i in range(4):
        rows.append((200 + i, f"c only {i}", "c"))
    p = str(tmp_path / "documents.parquet")
    _docs(spark, rows).write.parquet(p)
    out = {
        (r.source_a, r.source_b): r.asDict()
        for r in q186_source_overlap_matrix(spark, str(tmp_path)).collect()
    }
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
    ab = out[("a", "b")]
    # |A|=|B|=8 distinct, 4 shared -> union 12, jaccard 4/12
    assert (ab["n_union"], ab["n_common"]) == (12, 4)
    assert ab["jaccard_micro"] == 4 * 1_000_000 // 12
    assert out[("a", "c")]["n_common"] == 0
    assert out[("b", "c")]["jaccard_micro"] == 0


def test_q185_vocab_join_is_broadcast(spark):
    """The vocab-nll join back onto the token stream must plan as a
    broadcast hash join (vocabulary is dim-sized by Heaps' law) —
    a sort-merge there would shuffle the full token stream twice."""
    from synthea_etl_spark.plans.llm6 import q185_unigram_nll_quality
    from tests.conftest import SF_SMALL

    plan = (
        q185_unigram_nll_quality(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
