"""Round-14 tests: ANN ranking metrics, post-training audits,
Matryoshka/FIM/ablation governance, and the histogram-store queries."""

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


def test_ranking_metrics_ann_rides_ivf_and_stays_query_grain(spark):
    """q259 returns exactly one row per panel query with metric
    invariants: mrr/ndcg in [0, 1e6], dcg <= idcg, n_rel_topk <= 10,
    and first_rel_rank = 0 iff no relevant in top-k."""
    from synthea_etl_spark.plans.llm31 import q259_ranking_metrics_ann

    rows = q259_ranking_metrics_ann(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0 <= r.mrr_micro <= 1_000_000
        assert 0 <= r.ndcg_micro <= 1_000_000
        assert r.dcg_micro <= r.idcg_micro or r.idcg_micro == 0
        assert 0 <= r.n_rel_topk <= 10
        assert (r.first_rel_rank == 0) == (r.n_rel_topk == 0)


def test_fim_split_spans_partition_every_doc(spark, tmp_path):
    """prefix >= 1, middle >= 1, suffix >= 0, and the three spans sum
    to the doc's token count — per source, in aggregate."""
    from synthea_etl_spark.plans.llm31 import q264_fim_split_stats

    sf = str(tmp_path)
    rows = [
        (i, " ".join(f"w{j}" for j in range(2 + i % 9)), f"s{i % 2}")
        for i in range(40)
    ]
    _write_docs(spark, sf, rows)
    for r in q264_fim_split_stats(spark, sf).collect():
        assert r.prefix_tokens >= r.n_fimable      # >= 1 each
        assert r.middle_tokens >= r.n_fimable      # >= 1 each
        assert r.suffix_tokens >= 0
        assert (
            r.prefix_tokens + r.middle_tokens + r.suffix_tokens
            == r.fim_tokens
        )
        total = (
            r.prefix_share_micro
            + r.middle_share_micro
            + r.suffix_share_micro
        )
        assert 999_997 <= total <= 1_000_000  # floor-div rounding


def test_matryoshka_fractions_monotone_and_bounded(spark):
    """Prefix-energy fractions grow with width and never exceed 1."""
    from synthea_etl_spark.plans.llm31 import q263_matryoshka_audit

    rows = {
        r.width: r for r in q263_matryoshka_audit(spark, SF_DIR).collect()
    }
    assert set(rows) == {16, 32, 48}
    assert (
        rows[16].mean_fraction_micro
        <= rows[32].mean_fraction_micro
        <= rows[48].mean_fraction_micro
        <= 1_000_000
    )
    assert rows[16].min_fraction_micro >= 0


def test_ablation_arms_disjoint_and_complete(spark):
    """The 16 arms partition the corpus: doc/token sums equal the
    corpus totals and shares sum to ~1e6."""
    from synthea_etl_spark.plans.llm31 import q265_ablation_manifest
    from synthea_etl_spark.plans.common import load
    import synthea_etl_spark.operators.text as T

    rows = q265_ablation_manifest(spark, SF_DIR).collect()
    assert len(rows) == 16
    d = load(spark, SF_DIR, "documents").filter(T.token_count("text") > 0)
    want = d.agg(
        F.count("*").alias("n"),
        F.sum(T.token_count("text").cast("long")).alias("t"),
    ).collect()[0]
    assert sum(r.n_docs for r in rows) == want["n"]
    assert sum(r.n_tokens for r in rows) == want["t"]
    share = sum(r.token_share_micro for r in rows)
    assert 1_000_000 - 16 <= share <= 1_000_000


def test_length_drift_bin_shift_consistency(spark):
    """drifted <=> |bin_shift| > 2, and approx values are positive."""
    from synthea_etl_spark.plans.llm31 import q267_length_drift_from_store

    rows = q267_length_drift_from_store(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.drifted == (abs(r.bin_shift) > 2)
        assert r.approx_ref >= 1 and r.approx_live >= 1


def test_response_dedup_flags_cross_prompt_openers(spark, tmp_path):
    """Same 8-token opener under two DIFFERENT prompts -> one group
    with cross_prompt=true; same opener under the SAME prompt ->
    cross_prompt=false; unique openers emit nothing."""
    from synthea_etl_spark.plans.llm31 import q271_response_dedup

    sf = str(tmp_path)
    p1 = "p1 p2 p3 p4 p5 p6 p7 p8"
    p2 = "q1 q2 q3 q4 q5 q6 q7 q8"
    opener = "as an ai language model i cannot do"
    rows = [
        (0, f"{p1} {opener} that thing", "s"),
        (1, f"{p2} {opener} anything else", "s"),
        (2, f"{p1} {opener} more words", "s"),
        (3, f"{p1} completely unique answer body here x y z", "s"),
    ]
    _write_docs(spark, sf, rows)
    got = {r.response_key: r for r in q271_response_dedup(spark, sf).collect()}
    assert len(got) == 1
    (g,) = got.values()
    assert g.n_docs == 3
    assert g.n_prompts == 2
    assert g.cross_prompt is True
    assert g.rep_doc_id == 0


def test_preference_length_bias_pair_annotations(spark, tmp_path):
    """Token counts and the chosen_longer flag line up with the
    underlying docs for a hand-built prompt group."""
    from synthea_etl_spark.plans.llm31 import q260_preference_length_bias

    sf = str(tmp_path)
    prompt = "p1 p2 p3 p4 p5 p6 p7 p8"
    rows = [
        (0, prompt + " short", "s"),
        (1, prompt + " a much longer response body here", "s"),
        (2, prompt + " mid sized answer", "s"),
    ]
    _write_docs(spark, sf, rows)
    out = q260_preference_length_bias(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert {r.chosen_id, r.rejected_id} <= {0, 1, 2}
    assert r.chosen_tokens >= 9 and r.rejected_tokens >= 9
    assert r.len_delta_tokens == r.chosen_tokens - r.rejected_tokens
    assert r.chosen_longer == (r.chosen_tokens > r.rejected_tokens)


def test_llm31_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm31 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name


def test_q270_topk_plans_take_ordered_not_global_window(spark):
    """The vocabulary top-k must plan as TakeOrderedAndProject
    (per-partition partial top-k, k-row merge) — never a global
    row_number window, which funnels the whole Heaps-law-sized
    term-stats table through one sort task (the r14 verdict's
    scale-hazard #1). Same assertion style as q45's pruning pin."""
    from synthea_etl_spark.plans.llm31 import q270_burstiness_audit

    df = q270_burstiness_audit(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
