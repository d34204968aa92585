"""Round-13 batch-7 tests: hard negatives, CDC chunk dedup,
Poisson-bootstrap CI."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        path + "/documents.parquet"
    )


def test_hard_negatives_exclude_gold_and_its_dups(spark, tmp_path):
    """The gold doc never appears; an exact dup of the gold's text is
    excluded as a false negative; a lexically-overlapping doc does
    appear, with a positive margin to gold."""
    from synthea_etl_spark.plans.llm28 import q252_hard_negatives

    sf = str(tmp_path)
    qtext = "alpha beta gamma delta epsilon zeta"
    _write_docs(
        spark,
        sf,
        [
            (0, qtext, "s"),
            (1, "one two three four five six", "s"),
            (2, "red green blue cyan magenta yellow", "s"),
            (10, qtext, "s"),  # exact dup of query 0 -> excluded
            (11, "alpha beta gamma other words here", "s"),  # overlap
            (12, "totally unrelated junk words here", "s"),
        ],
    )
    rows = [
        r
        for r in q252_hard_negatives(spark, sf).collect()
        if r.query_id == 0
    ]
    ids = {r.doc_id for r in rows}
    assert 0 not in ids  # gold
    assert 10 not in ids  # dup of gold
    assert 11 in ids
    for r in rows:
        assert r.margin_micro > 0
        assert r.near_tie == (r.margin_micro < 50_000)
    ranks = sorted(r.neg_rank for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_cdc_chunks_partition_tokens_and_resync(spark, tmp_path):
    """Chunks partition every doc's tokens exactly; a doc that is
    another doc's text with two extra head tokens re-synchronizes —
    at least one identical chunk dedups across the unaligned pair
    (the CDC property a fixed-size blocker lacks)."""
    from synthea_etl_spark.plans.llm28 import q253_cdc_chunk_dedup

    sf = str(tmp_path)
    base = " ".join(f"tok{i % 13}x{i % 7}" for i in range(120))
    shifted = "pre1 pre2 " + base
    _write_docs(spark, sf, [(0, base, "a"), (1, shifted, "b")])
    rows = {r.source: r for r in q253_cdc_chunk_dedup(spark, sf).collect()}
    assert rows["a"].chunk_tokens == 120
    assert rows["b"].chunk_tokens == 122
    # tail chunks coincide despite the 2-token misalignment
    assert rows["a"].n_dup_chunks + rows["b"].n_dup_chunks >= 1
    for r in rows.values():
        assert r.mean_chunk_tokens_micro == (
            r.chunk_tokens * 1_000_000 // r.n_chunks
        )
        assert r.dedup_savings_micro == (
            r.dup_chunk_tokens * 1_000_000 // r.chunk_tokens
        )


def test_cdc_short_doc_is_one_whole_chunk(spark, tmp_path):
    """Docs shorter than the gram window produce exactly one chunk
    covering every token (guards the sequence(1,n) boundary-filter
    form — a bare sequence(3, n) DESCENDS for n < 3 in Spark)."""
    from synthea_etl_spark.plans.llm28 import q253_cdc_chunk_dedup

    sf = str(tmp_path)
    _write_docs(spark, sf, [(0, "only two", "s"), (1, "one", "s")])
    rows = {r.source: r for r in q253_cdc_chunk_dedup(spark, sf).collect()}
    assert rows["s"].n_chunks == 2  # one chunk per doc
    assert rows["s"].chunk_tokens == 3
    assert rows["s"].n_dup_chunks == 0


def test_bootstrap_ci_brackets_the_estimate(spark):
    """One row; the percentile bounds bracket the full-corpus point
    estimate; width is consistent; replicate count is the configured
    R."""
    from synthea_etl_spark.plans.llm28 import (
        _BOOT_R,
        q254_bootstrap_ci,
    )

    r = q254_bootstrap_ci(spark, SF_DIR).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_replicates == _BOOT_R
    assert row.lo_micro <= row.estimate_micro <= row.hi_micro
    assert row.width_micro == row.hi_micro - row.lo_micro
    assert row.width_micro >= 0


def test_llm28_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm28 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
