"""Round-13 batch-5 tests: dedup-axis funnel, LSH operating curve."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_dedup_axes_flag_independently(spark, tmp_path):
    """Each axis drops exactly its own duplicates: exact needs
    byte-identical text, prompt needs a shared first turn, span
    needs a shared winnowed window — one doc per class plus a clean
    one."""
    from synthea_etl_spark.plans.llm26 import q244_dedup_axis_funnel

    sf = str(tmp_path)
    base = "w1 w2 w3 w4 w5 w6 w7 w8 tail1 tail2 tail3 tail4"
    rows = [
        (0, base, "s"),
        (1, base, "s"),  # exact dup of 0 (also prompt + span dup)
        # same first 8 tokens, different tail far enough to break
        # every winnow window? no — shares the prompt windows too,
        # so it drops under prompt AND span, but NOT exact
        (2, "w1 w2 w3 w4 w5 w6 w7 w8 z1 z2 z3 z4", "s"),
        # shares a long midspan with 0 but a different prompt
        (3, "a1 a2 w3 w4 w5 w6 w7 w8 tail1 tail2 tail3 tail4", "s"),
        # clean on all axes
        (4, "q1 q2 q3 q4 q5 q6 q7 q8 q9 q10 q11 q12", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    out = {
        r.axis: r for r in q244_dedup_axis_funnel(spark, sf).collect()
    }
    assert out["exact"].n_docs == 5 and out["exact"].n_kept == 4
    assert out["prompt"].n_kept == 3  # docs 1 and 2 drop
    # span: docs 1, 2, 3 all share >= one winnow fingerprint with 0
    assert out["span"].n_kept == 2
    assert out["span"].kept_micro == 400_000


def test_lsh_curve_matches_closed_form_and_threshold(spark):
    """Grid values equal the closed form with the exact quantization
    discipline, and the half-crossing sits at the (1/b)^(1/r)
    threshold (~0.595 for the configured 8x4)."""
    from synthea_etl_spark.plans.llm26 import (
        _LSH_BANDS,
        _LSH_ROWS,
        q245_lsh_operating_curve,
    )

    rows = {
        r.j_pct: r for r in q245_lsh_operating_curve(spark, SF_DIR).collect()
    }
    assert len(rows) == 19
    for j, r in rows.items():
        p = 1 - (1 - (j / 100.0) ** _LSH_ROWS) ** _LSH_BANDS
        assert r.p_candidate_micro == math.floor(
            round(p, 6) * 1_000_000 + 0.5
        )
    thresh = (1 / _LSH_BANDS) ** (1 / _LSH_ROWS) * 100  # ~59.5
    for j, r in rows.items():
        if j <= thresh - 5:
            assert not r.above_half, j
        if j >= thresh + 5:
            assert r.above_half, j


def test_q244_q245_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm26 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
