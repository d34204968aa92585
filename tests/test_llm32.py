"""Round-15 tests: ANN health verdict, vocab drift, cluster purity,
stopword calibration, prefix-cache accounting, embedding dim health,
and the grouped_topk utility."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_grouped_topk_matches_plain_window(spark):
    """Two-stage per-group top-k is exact: identical rows and ranks
    to the plain partitioned row_number window, for every bucket
    count (bucketing may not change results)."""
    from pyspark.sql import Window

    from synthea_etl_spark.operators.util import grouped_topk

    rows = [
        (g, f"t{i:03d}", (i * 7 + gi * 3) % 50)
        for gi, g in enumerate(("a", "b", "c"))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "g string, t string, c long")
    w = Window.partitionBy("g").orderBy(F.desc("c"), F.asc("t"))
    want = {
        tuple(r)
        for r in df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .collect()
    }
    for nb in (1, 4, 64):
        got = {
            tuple(r)
            for r in grouped_topk(
                df,
                ["g"],
                [F.desc("c"), F.asc("t")],
                10,
                bucket_col="t",
                n_buckets=nb,
            ).collect()
        }
        assert got == want, nb


def test_grouped_topk_requires_bucket_for_sortorder(spark):
    import pytest

    from synthea_etl_spark.operators.util import grouped_topk

    df = spark.createDataFrame([("a", 1)], "g string, c long")
    with pytest.raises(ValueError):
        grouped_topk(df, ["g"], [F.desc("c")], 5)


def test_q272_verdict_row_invariants(spark):
    """One row; metrics in range; every breach boolean is exactly its
    threshold comparison; retrain_needed is their OR."""
    from synthea_etl_spark.plans.llm32 import (
        _Q272_COH_MIN,
        _Q272_HOT_MAX,
        _Q272_RECALL_MIN,
        _Q272_SKEW_MAX,
        q272_ann_health_verdict,
    )

    rows = q272_ann_health_verdict(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r.recall_micro <= 1_000_000
    assert 0 <= r.hot_frac_micro <= 1_000_000
    assert r.occ_skew_micro >= 1_000_000  # max >= mean always
    assert r.recall_low == (r.recall_micro < _Q272_RECALL_MIN)
    assert r.hot_high == (r.hot_frac_micro > _Q272_HOT_MAX)
    assert r.skew_high == (r.occ_skew_micro > _Q272_SKEW_MAX)
    assert r.coherence_low == (r.coherence_micro < _Q272_COH_MIN)
    assert r.retrain_needed == (
        r.recall_low or r.hot_high or r.skew_high or r.coherence_low
    )


def test_q276_prefix_cache_hand_corpus(spark, tmp_path):
    """Hand-built corpus: 3 docs sharing a 4-token prefix + 1 short
    doc + 1 singleton — reuse counts and tokens_saved are exact."""
    from synthea_etl_spark.plans.llm32 import q276_prefix_cache_accounting

    rows = [
        (0, "p1 p2 p3 p4 alpha", "s"),
        (1, "p1 p2 p3 p4 beta gamma", "s"),
        (2, "p1 p2 p3 p4 delta", "s"),
        (3, "p1 p2", "s"),  # shorter than every k
        (4, "solo text here now ok", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).write.parquet(
        str(tmp_path) + "/documents.parquet"
    )
    out = {
        r.k: r
        for r in q276_prefix_cache_accounting(spark, str(tmp_path)).collect()
    }
    assert set(out) == {4, 8, 16}
    k4 = out[4]
    # groups at k=4: {0,1,2} (p1..p4), {3} (p1 p2), {4}
    assert k4.n_docs == 5 and k4.n_groups == 3 and k4.max_group_n == 3
    assert k4.tokens_saved == 2 * 4  # two extra members, 4 tokens each
    # at k=8 doc texts differ beyond the shared prefix: no reuse
    assert out[8].n_groups == 5 and out[8].tokens_saved == 0


def test_q277_dim_health_dead_flag(spark, tmp_path):
    """A constant dimension is flagged dead; a varying one is not;
    sums are the exact micro totals."""
    from synthea_etl_spark.plans.llm32 import q277_embedding_dim_health

    rows = [
        (0, [0.5, 1.0, -0.25]),
        (1, [0.5, 2.0, 0.75]),
        (2, [0.5, -1.0, 0.0]),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    ).write.parquet(str(tmp_path) + "/embeddings.parquet")
    out = {r.dim: r for r in
           q277_embedding_dim_health(spark, str(tmp_path)).collect()}
    assert out[0].dead and not out[1].dead and not out[2].dead
    assert out[0].sum_micro == 1_500_000
    assert out[1].sum_micro == 2_000_000
    assert out[2].sum_micro == 500_000
    assert out[2].min_micro == -250_000 and out[2].max_micro == 750_000


def test_q273_halves_and_jaccard_bounds(spark):
    """Per-lang rows: counts bounded by V, jaccard in [0, 1e6], and
    n_common <= min(n_ref, n_live)."""
    from synthea_etl_spark.plans.llm32 import (
        _Q273_V,
        q273_vocab_drift_jaccard,
    )

    for r in q273_vocab_drift_jaccard(spark, SF_DIR).collect():
        assert 1 <= r.n_ref <= _Q273_V and 1 <= r.n_live <= _Q273_V
        assert r.n_common <= min(r.n_ref, r.n_live)
        assert 0 <= r.jaccard_micro <= 1_000_000
        assert 0 <= r.new_term_frac_micro <= 1_000_000


def test_q275_bins_partition_the_corpus(spark):
    """Bin ids in 0..9 and doc counts sum to the non-empty doc
    count."""
    from synthea_etl_spark.plans.llm32 import q275_stopword_quality_bins
    from synthea_etl_spark.plans.common import load

    rows = q275_stopword_quality_bins(spark, SF_DIR).collect()
    assert all(0 <= r.bin <= 9 for r in rows)
    n = (
        load(spark, SF_DIR, "documents")
        .filter(F.length(F.trim("text")) > 0)
        .count()
    )
    assert sum(r.n_docs for r in rows) == n


def test_llm32_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm32 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name


def test_q279_funnel_bloom_superset_of_exact(spark):
    """Exact dups are a subset of Bloom hits (no escapes), and the
    funnel fractions are consistent."""
    from synthea_etl_spark.plans.llm32 import q279_bloom_dedup_funnel

    r = q279_bloom_dedup_funnel(spark, SF_DIR).collect()[0]
    assert r.n_escaped == 0 and r.fn_zero
    assert r.n_exact_dups <= r.n_bloom_hits <= r.n_batch
    assert 0 <= r.exact_work_avoided_micro <= 1_000_000


def test_q280_novelty_bound_holds_per_source(spark):
    from synthea_etl_spark.plans.llm32 import q280_bloom_novelty_bounds

    rows = q280_bloom_novelty_bounds(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bound_ok and r.novel_min <= r.novel_exact <= r.n_live_fps
        assert r.novelty_lower_micro <= r.novelty_exact_micro


def test_q281_shortlist_shape_and_order(spark):
    """k rows per source, ranks 1..k, margin non-increasing within a
    source with doc_id tiebreak."""
    from synthea_etl_spark.plans.llm32 import (
        _Q281_K,
        q281_source_quality_shortlist,
    )

    rows = q281_source_quality_shortlist(spark, SF_DIR).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= _Q281_K
        for a, b in zip(rs, rs[1:]):
            assert (a.margin_micro, -a.doc_id) >= (
                b.margin_micro,
                -b.doc_id,
            ) or a.margin_micro > b.margin_micro or (
                a.margin_micro == b.margin_micro and a.doc_id < b.doc_id
            )


def test_q282_policies_same_count_quality_no_worse(spark):
    """Both policies keep the same doc count (one rep per cluster),
    and the best-quality policy's mean kept margin is >= min_doc's."""
    from synthea_etl_spark.plans.llm32 import q282_rep_policy_audit

    out = {r.policy: r for r in q282_rep_policy_audit(spark, SF_DIR).collect()}
    assert set(out) == {"min_doc", "best_quality"}
    assert out["min_doc"].n_kept == out["best_quality"].n_kept
    assert (
        out["best_quality"].mean_margin_kept_micro
        >= out["min_doc"].mean_margin_kept_micro
    )


def test_q283_bounds_hold_and_are_ordered(spark):
    from synthea_etl_spark.plans.llm32 import q283_budget_forecast_bounds

    rows = q283_budget_forecast_bounds(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.bound_ok
        assert 0 <= r.fit_min <= r.fit_exact <= r.fit_max <= r.n_docs
