"""Round-13 batch-2 tests: selective pruning, vocab coverage,
threshold sweep, ranking metrics."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_selective_pruning_is_consistent_with_q220(spark):
    """q236 rides the SAME scored bigram stream as the gated q220:
    per-doc position counts must match exactly, the focus subset is
    bounded by it, and a non-empty focus set's mean NLL exceeds the
    threshold by construction."""
    from synthea_etl_spark.plans.llm17 import q220_bigram_lm_quality
    from synthea_etl_spark.plans.llm23 import (
        _FOCUS_NLL_MICRO,
        q236_selective_pruning,
    )

    q220 = {
        r.doc_id: r.n_bigrams
        for r in q220_bigram_lm_quality(spark, SF_DIR).collect()
    }
    rows = q236_selective_pruning(spark, SF_DIR).collect()
    assert {r.doc_id for r in rows} == set(q220)
    for r in rows:
        assert r.n_bigrams == q220[r.doc_id]
        assert 0 <= r.n_focus <= r.n_bigrams
        if r.n_focus > 0:
            assert r.focus_nll_micro_mean > _FOCUS_NLL_MICRO
        else:
            assert r.focus_nll_micro_mean == 0


def test_vocab_coverage_counts_only_out_of_vocab_mass(spark, tmp_path):
    """A token absent from the top-V reference vocabulary counts as
    OOV occurrence-weighted; reference-slice membership follows
    doc_id % 10 < 3."""
    from synthea_etl_spark.plans.llm23 import q237_vocab_coverage

    sf = str(tmp_path)
    # ref docs (0..2) establish the vocab; 17 distinct tokens with
    # 'rare' the least frequent (rank 17 > V=16 -> OOV)
    common = " ".join(f"w{i} w{i}" for i in range(16))  # w0..w15 twice
    rows = [
        (0, common, "en", "ref"),
        (1, common + " rare", "en", "ref"),
        (2, common, "en", "ref"),
        # non-ref doc: 3 vocab tokens + 2 OOV occurrences ('rare'
        # ranks below the cut; 'never' is unseen in the reference)
        (10, "w0 w1 w2 rare never", "en", "live"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text")).write.parquet(
        sf + "/documents.parquet"
    )
    out = {
        (r.source, r.lang): r
        for r in q237_vocab_coverage(spark, sf).collect()
    }
    live = out[("live", "en")]
    assert (live.n_occ, live.n_oov) == (5, 2)
    assert live.oov_micro == 400_000
    ref = out[("ref", "en")]
    # 'rare' occurs once in the ref slice and is OOV even there
    assert (ref.n_occ, ref.n_oov) == (97, 1)


def test_threshold_sweep_is_cumulative_exact(spark, duck):
    """The sweep's cumulative columns are running sums of its own
    bins, precision/recall stay in [0, 1e6], and the last bin
    recovers every positive (recall == 1e6)."""
    from synthea_etl_spark.plans.llm23 import q238_filter_threshold_sweep

    rows = sorted(
        q238_filter_threshold_sweep(spark, SF_DIR).collect(),
        key=lambda r: r.bin,
    )
    cum_d = cum_p = 0
    for r in rows:
        cum_d += r.n_docs
        cum_p += r.n_pos
        assert (r.cum_docs, r.cum_pos) == (cum_d, cum_p)
        assert 0 <= r.precision_micro <= 1_000_000
        assert 0 <= r.recall_micro <= 1_000_000
    assert rows[-1].cum_docs == 500
    if cum_p > 0:
        assert rows[-1].recall_micro == 1_000_000
    # positives agree with q235's doc-level risk flags
    from synthea_etl_spark.plans.llm22 import q235_memorization_risk

    n_pos_q235 = (
        q235_memorization_risk(spark, SF_DIR)
        .filter(F.col("n_risky") >= 1)
        .count()
    )
    assert cum_p == n_pos_q235


def test_ranking_metrics_match_python_replay(spark):
    """MRR/NDCG replayed in numpy with the identical rounding and
    tie-break discipline for a few queries."""
    import numpy as np

    from synthea_etl_spark.plans.llm23 import (
        _RANK_K,
        q239_ranking_metrics,
    )

    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").collect()
    vecs = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in e}
    lbls = {r.vec_id: r.label for r in e}
    out = {r.query_id: r for r in q239_ranking_metrics(spark, SF_DIR).collect()}
    assert len(out) == 20

    w = {
        r: math.floor(round(1.0 / math.log2(r + 1), 6) * 1_000_000 + 0.5)
        for r in range(1, _RANK_K + 1)
    }
    cum_w = {r: sum(w[i] for i in range(1, r + 1)) for r in w}
    for qid in (0, 5, 12):
        qv = vecs[qid]
        sims = []
        for nid, cv in vecs.items():
            if nid == qid:
                continue
            s = round(
                float(qv @ cv / (np.linalg.norm(qv) * np.linalg.norm(cv))), 6
            )
            sims.append((-s, nid))
        sims.sort()
        top = sims[:_RANK_K]
        rel = [lbls[nid] == lbls[qid] for _, nid in top]
        n_rel = sum(1 for v in lbls.values() if v == lbls[qid]) - 1
        first = next((i + 1 for i, x in enumerate(rel) if x), None)
        dcg = sum(w[i + 1] for i, x in enumerate(rel) if x)
        idcg = cum_w[min(n_rel, _RANK_K)] if n_rel >= 1 else 0
        r = out[qid]
        assert r.n_rel == n_rel
        assert r.first_rel_rank == (first or 0)
        assert r.mrr_micro == (1_000_000 // first if first else 0)
        assert r.dcg_micro == dcg
        assert r.idcg_micro == idcg
        assert r.ndcg_micro == (dcg * 1_000_000 // idcg if idcg else 0)


def test_q236_q239_match_duckdb_on_testdata(duck, spark):
    """Oracle parity at gate scale, pinned in pytest."""
    from synthea_etl_spark.plans.llm23 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name


def test_q237_vocab_cut_plans_take_ordered_not_global_window(spark):
    """The top-V vocabulary cut must plan as TakeOrderedAndProject —
    the vocab dim is Heaps-law-bounded but still vocabulary-sized at
    100 TB, so a global row_number window would serialize it through
    one sort task (the r14 verdict's scale-hazard, q270's twin)."""
    from synthea_etl_spark.plans.llm23 import q237_vocab_coverage

    df = q237_vocab_coverage(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
