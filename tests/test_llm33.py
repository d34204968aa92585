"""Round-15 batch-3 tests: AUC rank statistic, Bradley-Terry fit,
vocabulary audit invariants, kappa sign semantics, and the
frequency-sandwich gate properties at sf0.01 (the oracle
differential itself is covered by tools/selfcheck + the driver
gate; these pin the INTERNAL math invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_q284_auc_in_range_and_perfect_on_separable(spark):
    """AUC lands in [0, M]; a synthetically separable corpus scores
    exactly M (binned AUC of a perfectly ordered signal)."""
    from synthea_etl_spark.plans.llm33 import q284_quality_auc

    rows = q284_quality_auc(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.auc_micro <= 1_000_000
        assert 0 <= r.ks_micro <= 1_000_000
        assert r.n_pos + r.n_neg > 0


def test_q285_bt_strengths_sum_and_order(spark):
    """Normalized strengths sum to ~policies*M (integer truncation
    only), ranks are a permutation, and the win matrix is conserved
    (sum of wins = total games / 2 directed)."""
    from synthea_etl_spark.plans.llm33 import _BT_POLICIES, q285_bt_strength

    rows = q285_bt_strength(spark, SF_DIR).collect()
    assert len(rows) == _BT_POLICIES
    tot = sum(r.strength_micro for r in rows)
    assert _BT_POLICIES * 1_000_000 - 4 * _BT_POLICIES <= tot \
        <= _BT_POLICIES * 1_000_000
    assert sorted(r.rank for r in rows) == list(range(1, _BT_POLICIES + 1))
    by_rank = sorted(rows, key=lambda r: r.rank)
    for a, b in zip(by_rank, by_rank[1:]):
        assert a.strength_micro >= b.strength_micro
    assert sum(r.wins for r in rows) * 2 == sum(r.games for r in rows)


def test_q286_vocab_invariants(spark):
    """hapax <= vocab, top mass <= total, Good-Turing mass equals
    hapax/N in micro, and the head term really is a max-count term."""
    from synthea_etl_spark.plans.llm33 import q286_vocab_zipf_audit

    rows = q286_vocab_zipf_audit(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.hapax + r.dis <= r.vocab
        assert 0 <= r.gt_unseen_micro <= 1_000_000
        assert 0 <= r.simpson_micro <= 1_000_000
        assert 0 < r.top_mass_micro <= 1_000_000
        assert r.hapax * 1_000_000 // r.n_tokens == r.gt_unseen_micro


def test_q287_kappa_bounds_and_confusion_conservation(spark):
    from synthea_etl_spark.plans.llm33 import q287_rater_agreement

    rows = q287_rater_agreement(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.n11 + r.n10 + r.n01 + r.n00 == r.n_docs
        assert -1_000_000 <= r.kappa_micro <= 1_000_000
        assert r.moderate_agreement == (r.kappa_micro >= 400_000)


def test_q288_bounds_proven_and_mass_exact(spark):
    from synthea_etl_spark.plans.llm33 import q288_cms_frequency_audit

    rows = {r.probe_class: r for r in
            q288_cms_frequency_audit(spark, SF_DIR).collect()}
    assert set(rows) == {"corpus", "synthetic"}
    for r in rows.values():
        assert r.n_upper_viol == 0 and r.n_lower_viol == 0
        assert r.bounds_ok and r.store_mass_exact
    c = rows["corpus"]
    # the sandwich is non-trivial at gate scale: W=16 forces real
    # collisions (upper strictly over) and the candidate store
    # genuinely undershoots (lower strictly under)
    assert c.sum_est > c.sum_exact > c.sum_lower
    assert c.n_candidates > 0


def test_q289_classes_proven_and_complete(spark):
    from synthea_etl_spark.plans.llm33 import q289_heavy_hitter_bounds

    rows = q289_heavy_hitter_bounds(spark, SF_DIR).collect()
    assert rows
    assert all(r.all_heavy_covered for r in rows)
    assert all(r.class_proven for r in rows)
    for r in rows:
        assert r.lower <= r.exact <= r.est
        assert r["class"] in ("heavy", "light", "uncertain")


def test_q290_ece_bounds(spark):
    from synthea_etl_spark.plans.llm33 import q290_ece_calibration

    rows = q290_ece_calibration(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 <= r.ece_micro <= r.max_gap_micro <= 1_000_000
        assert 0 <= r.brier_micro <= 1_000_000
        assert r.n_docs > 0


def test_q291_prefix_panel_proven(spark):
    """The prefix panel PROVES the intersection machinery: every
    prefix shingle set is a subset of its full doc's set, so
    containment(a in b) is exactly 1 for every pair."""
    from synthea_etl_spark.plans.llm33 import q291_containment_direction

    rows = {r.panel: r for r in
            q291_containment_direction(spark, SF_DIR).collect()}
    assert set(rows) == {"prefix", "background"}
    p = rows["prefix"]
    assert p.all_a_subsets
    assert p.mean_cont_a_micro == 1_000_000
    assert p.n_a_in_b + p.n_symmetric == p.n_pairs
    b = rows["background"]
    assert (
        b.n_a_in_b + b.n_b_in_a + b.n_symmetric + b.n_unrelated
        == b.n_pairs
    )


def test_q292_drift_bound_holds(spark):
    from synthea_etl_spark.plans.llm33 import q292_cms_drift_bound

    r = q292_cms_drift_bound(spark, SF_DIR).collect()[0]
    assert r.bound_ok
    assert 0 <= r.l1_row_min <= r.l1_lower <= r.exact_l1
    assert r.n_rows == 4
    assert 0 <= r.slack_permille <= 1000


def test_q293_cusum_identity_matches_recursion(spark):
    """The prefix-sum/running-min identity equals the textbook
    recursion S_t = max(0, S_{t-1} + x_t - k), checked per type by
    replaying the recursion on the collected hourly grid."""
    from synthea_etl_spark.plans.common import load_events
    from synthea_etl_spark.plans.llm33 import (
        _Q293_H_MEAN_HOURS,
        _Q293_SLACK_PERMILLE,
        q293_rate_cusum_monitor,
    )
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in
           q293_rate_cusum_monitor(spark, SF_DIR).collect()}
    ev = load_events(spark, SF_DIR)
    rows = (
        ev.select(
            "event_type",
            (F.unix_timestamp("ts") / 3600).cast("long").alias("h"),
        )
        .groupBy("event_type", "h")
        .agg(F.count("*").cast("long").alias("x"))
        .collect()
    )
    h0 = min(r.h for r in rows)
    h1 = max(r.h for r in rows)
    by_type: dict[str, dict[int, int]] = {}
    for r in rows:
        by_type.setdefault(r.event_type, {})[r.h] = r.x
    M = 1_000_000
    for et, counts in by_type.items():
        n_hours = h1 - h0 + 1
        total = sum(counts.values())
        mean = total * M // n_hours
        k = mean + mean * _Q293_SLACK_PERMILLE // 1000
        thresh = mean * _Q293_H_MEAN_HOURS
        s = 0
        max_s = 0
        alarms = 0
        first = -1
        for h in range(h0, h1 + 1):
            s = max(0, s + counts.get(h, 0) * M - k)
            max_s = max(max_s, s)
            if s > thresh:
                alarms += 1
                if first == -1:
                    first = h
        g = got[et]
        assert g.n_hours == n_hours
        assert g.mean_rate_micro == mean
        assert g.max_excursion_micro == max_s, et
        assert g.n_alarm_hours == alarms, et
        assert g.first_alarm_hour == first, et
        assert g.drifted == (alarms > 0)
