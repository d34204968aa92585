"""Round-13 batch-1 tests: SFT turn structure, prompt-key dedup,
rendezvous sharding, memorization risk."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_turn_structure_budgets_and_roles(spark, tmp_path):
    """Closed-form per-role budgets equal the explicit chunking, and
    the role hashes cover exactly the alternating 8-token turns."""
    from synthea_etl_spark.plans.llm22 import q232_turn_structure

    sf = str(tmp_path)
    toks = lambda n: " ".join(f"t{i}" for i in range(n))
    _docs(
        spark,
        [
            (0, ""),  # zero turns
            (1, "one"),  # single 1-token user turn
            (2, toks(8)),  # exactly one user turn
            (3, toks(16)),  # user + assistant, well formed
            (4, toks(17)),  # trailing 1-token user turn
            (5, toks(20)),  # 8 user + 8 asst + 4 user
        ],
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    out = {
        r.doc_id: r for r in q232_turn_structure(spark, sf).collect()
    }
    assert (out[0].n_turns, out[0].n_user_tokens, out[0].well_formed) == (
        0,
        0,
        False,
    )
    assert (out[1].n_turns, out[1].n_user_tokens, out[1].n_asst_tokens) == (
        1,
        1,
        0,
    )
    assert (out[2].n_turns, out[2].n_user_tokens) == (1, 8)
    assert (out[3].n_turns, out[3].n_user_tokens, out[3].well_formed) == (
        2,
        8,
        True,
    )
    assert (out[4].n_turns, out[4].n_user_tokens, out[4].ends_on_assistant) == (
        3,
        9,
        False,
    )
    assert (out[5].n_turns, out[5].n_user_tokens, out[5].n_asst_tokens) == (
        3,
        12,
        8,
    )
    # role hash = hash of exactly the role's turns, in order
    import hashlib

    def md5(s):
        return hashlib.md5(s.encode()).hexdigest()

    w = toks(20).split()
    assert out[5].user_md5 == md5(" ".join(w[0:8] + w[16:20]))
    assert out[5].asst_md5 == md5(" ".join(w[8:16]))
    assert out[0].user_md5 == md5("")


def test_prompt_dedup_clusters_on_first_turn_only(spark, tmp_path):
    """Records sharing the first 8 tokens cluster together no matter
    how their responses differ; the min-doc_id rep is elected."""
    from synthea_etl_spark.plans.llm22 import q233_prompt_dedup

    sf = str(tmp_path)
    p = "a b c d e f g h"
    _docs(
        spark,
        [
            (10, p + " resp one"),
            (11, p + " a totally different response text"),
            (12, "other prompt entirely x y z"),
            (13, ""),  # empty: excluded
        ],
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    rows = {r.doc_id: r for r in q233_prompt_dedup(spark, sf).collect()}
    assert set(rows) == {10, 11, 12}
    assert rows[10].cluster_n == 2 and rows[11].cluster_n == 2
    assert rows[10].is_rep and not rows[11].is_rep
    assert rows[11].rep_doc_id == 10
    assert rows[12].cluster_n == 1 and rows[12].is_rep


def test_hrw_minimal_disruption_and_second_choice(spark, tmp_path):
    """HRW properties, exactly: (1) keys move iff their owner is the
    failed shard; (2) a moved key lands on its second-choice shard
    (the argmax excluding the failed one equals the global second
    max when the max was the failed shard)."""
    from synthea_etl_spark.plans.llm22 import (
        _HRW_FAILED,
        _HRW_SHARDS,
        q234_hrw_shards,
    )

    sf = str(tmp_path)
    _docs(
        spark, [(i, "x") for i in range(400)]
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    rows = q234_hrw_shards(spark, sf).collect()
    assert all(r.minimal_disruption for r in rows)
    assert all(r.moved == (r.shard == _HRW_FAILED) for r in rows)
    # python replay: second choice wins after failure
    import hashlib

    def hx(u, s):
        return int(hashlib.md5(f"{u}#{s}".encode()).hexdigest()[:8], 16)

    for r in rows[:50]:
        scores = sorted(
            ((hx(r.url, s), s) for s in range(_HRW_SHARDS)), reverse=True
        )
        assert r.shard == scores[0][1]
        expect_after = next(
            s for _, s in scores if s != _HRW_FAILED
        )
        assert r.shard_after == expect_after
    # every live shard owns something at this key count
    assert {r.shard for r in rows} == set(range(_HRW_SHARDS))


def test_memorization_risk_counts_cross_doc_grams(spark, tmp_path):
    """A doc sharing an 8-gram with another doc gets exactly that
    gram flagged; within-doc repetition alone is NOT risky (distinct
    fingerprints), and short docs (<8 tokens) drop out."""
    from synthea_etl_spark.plans.llm22 import q235_memorization_risk

    sf = str(tmp_path)
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    _docs(
        spark,
        [
            # 9 tokens -> grams: [shared], [s2..u1]
            (0, shared + " u1"),
            # the same 8-gram embedded elsewhere + unique tail
            (1, "z0 " + shared + " z1 z2"),
            # within-doc repeat of its own gram: 16 tokens, every
            # gram distinct-after-dedup and unshared
            (2, "r1 r2 r3 r4 r5 r6 r7 r8 r1 r2 r3 r4 r5 r6 r7 r8"),
            (3, "too short to gram"),
        ],
    ).withColumn("lang", F.lit("en")).withColumn(
        "source", F.lit("s")
    ).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    rows = {r.doc_id: r for r in q235_memorization_risk(spark, sf).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0].n_grams == 2 and rows[0].n_risky == 1
    assert rows[0].risk_micro == 500_000 and rows[0].at_risk
    assert rows[1].n_risky == 1
    # doc 2: the repeated span's grams are cyclic rotations (8
    # distinct after dedup), each appearing only within doc 2 ->
    # corpus doc-count 1 -> not risky
    assert rows[2].n_risky == 0 and not rows[2].at_risk


def test_q232_q235_match_duckdb_on_testdata(duck, spark):
    """Module-level oracle parity at gate scale (the selfcheck run,
    pinned as a test so regressions surface in pytest)."""
    from synthea_etl_spark.plans.llm22 import QUERIES

    from tests.conftest import SF_DIR

    for name, spec in QUERIES.items():
        got = {
            tuple(r)
            for r in QUERIES[name]
            .fn(spark, SF_DIR)
            .collect()
        }
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
