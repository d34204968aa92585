"""Round-12 batch-2 tests: snapshot novelty, crawl budget
allocation, DoReMi reweighting."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL

MICRO = 1_000_000


def test_snapshot_novelty_first_snapshot_all_novel(spark, tmp_path):
    """Snapshot 0 is all-novel by construction (no earlier snapshot
    exists); cross-snapshot duplicates register as staleness (the
    TESTDATA corpus has no byte-identical dups, so the curve is
    exercised on a planted corpus); counts are a partition."""
    import os

    from synthea_etl_spark.plans.llm20 import q227_snapshot_novelty

    # real corpus: trivially all-novel (no exact dups) but exact
    rows = {
        r.snapshot: r
        for r in q227_snapshot_novelty(spark, SF_SMALL).collect()
    }
    assert set(rows) == {0, 1, 2, 3}
    assert rows[0].novelty_micro == MICRO and rows[0].n_stale == 0
    for r in rows.values():
        assert r.novelty_micro == r.n_novel * MICRO // r.n_docs

    # planted corpus: snapshot s holds docs {s, s+4, s+8, s+12};
    # half of each later snapshot's CONTENT was crawled before
    content = {
        0: "A", 4: "B", 8: "C", 12: "D",          # snap 0: all new
        1: "A", 5: "B", 9: "E", 13: "F",          # snap 1: A,B stale
        2: "C", 6: "E", 10: "G", 14: "H",         # snap 2: C,E stale
        3: "A", 7: "H", 11: "I", 15: "J",         # snap 3: A,H stale
    }
    docs = spark.createDataFrame(
        [(i, f"content {c} " * 3) for i, c in content.items()],
        "doc_id long, text string",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    planted = {
        r.snapshot: r for r in q227_snapshot_novelty(spark, sf).collect()
    }
    assert planted[0].n_stale == 0 and planted[0].novelty_micro == MICRO
    for s in (1, 2, 3):
        assert planted[s].n_docs == 4
        assert planted[s].n_stale == 2, planted[s]
        assert planted[s].novelty_micro == 2 * MICRO // 4


def test_crawl_budget_respects_quotas_and_order(spark):
    """Per-host admissions equal min(quota, host size); admitted docs
    are exactly the host's md5-smallest; the global admission count
    never exceeds the budget."""
    import hashlib

    from synthea_etl_spark.plans.llm20 import (
        _BUDGET_DEN,
        _BUDGET_NUM,
        _TIER_W,
        q228_crawl_budget_allocation,
    )

    rows = q228_crawl_budget_allocation(spark, SF_SMALL).collect()
    n_total = len(rows)
    budget = n_total * _BUDGET_NUM // _BUDGET_DEN
    assert sum(r.admitted for r in rows) <= budget
    by_host: dict[str, list] = {}
    for r in rows:
        by_host.setdefault(r.host, []).append(r)
    # recompute quotas from the output itself
    wn = sum(
        len(v) * _TIER_W[v[0].crawl_tier] for v in by_host.values()
    )
    for host, v in by_host.items():
        quota = budget * (len(v) * _TIER_W[v[0].crawl_tier]) // wn
        admitted = [r for r in v if r.admitted]
        assert len(admitted) == min(quota, len(v)), host
        # admission order = md5('cb'||doc_id), then doc_id
        key = lambda r: (  # noqa: E731
            hashlib.md5(f"cb{r.doc_id}".encode()).hexdigest(),
            r.doc_id,
        )
        want = {r.doc_id for r in sorted(v, key=key)[: len(admitted)]}
        assert {r.doc_id for r in admitted} == want, host


def test_doremi_weights_normalized_and_monotone(spark):
    """Weights are a probability vector in micro units (up to
    integer-division dust), excess is clamped at zero, and sources
    with larger excess loss never get smaller weights."""
    from synthea_etl_spark.plans.llm20 import q229_doremi_reweight

    rows = q229_doremi_reweight(spark, SF_SMALL).collect()
    assert len(rows) > 1
    s = sum(r.weight_micro for r in rows)
    assert MICRO - len(rows) <= s <= MICRO
    assert all(r.excess_micro >= 0 for r in rows)
    ordered = sorted(rows, key=lambda r: r.excess_micro)
    for a, b in zip(ordered, ordered[1:]):
        assert a.weight_micro <= b.weight_micro
    # at least one source is flagged above the reference fit
    assert any(r.excess_micro > 0 for r in rows)


def test_unimax_allocation_caps_and_budget(spark, tmp_path):
    """Allocations sum to the budget EXACTLY, the capped set is a
    capacity prefix, capped languages sit at exactly the epoch cap,
    and on a skewed corpus the tiny language caps while the dominant
    one runs under one epoch."""
    import os

    from synthea_etl_spark.plans.llm21 import (
        _UNIMAX_EPOCH_CAP,
        q230_unimax_allocation,
    )

    rows = q230_unimax_allocation(spark, SF_SMALL).collect()
    n = sum(r.n_tokens for r in rows)
    assert sum(r.alloc_tokens for r in rows) == n
    ordered = sorted(rows, key=lambda r: (r.cap_tokens, r.lang))
    flags = [r.capped for r in ordered]
    assert flags == sorted(flags, reverse=True)  # capped is a prefix
    for r in rows:
        if r.capped:
            assert r.alloc_tokens == r.cap_tokens
            assert r.epochs_micro == _UNIMAX_EPOCH_CAP * MICRO
        else:
            assert r.alloc_tokens <= r.cap_tokens

    # skewed synthetic corpus: 1 tiny + 1 huge language
    docs = spark.createDataFrame(
        [(i, "w " * 100, "big", "s", 200) for i in range(50)]
        + [(100, "w w w w", "tiny", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf")
    os.makedirs(sf)
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    got = {r.lang: r for r in q230_unimax_allocation(spark, sf).collect()}
    assert got["tiny"].capped and got["tiny"].alloc_tokens == 8
    assert not got["big"].capped
    assert got["big"].alloc_tokens == (5004 - 8)
    assert got["big"].epochs_micro < MICRO  # under one epoch


def test_robots_longest_match_semantics(spark):
    """REP semantics: the longer Allow overrides the shorter
    Disallow on the same prefix; an unoverridden Disallow blocks; a
    length TIE goes to Allow; no match allows."""
    from synthea_etl_spark.plans.llm21 import (
        q231_robots_filter,
        robots_allowed,
    )
    from tests.conftest import SF_SMALL

    rows = q231_robots_filter(spark, SF_SMALL).collect()
    for r in rows:
        h = int(r.host.removeprefix("site").removesuffix(".com"))
        page = r.path.removeprefix("/p/").removesuffix("/")
        if page == str(h % 10):
            assert r.crawlable, r  # Allow /p/X/ overrides Disallow /p/X
        elif page == str((h + 1) % 10):
            assert not r.crawlable, r
        else:
            assert r.crawlable, r
    blocked = sum(not r.crawlable for r in rows)
    assert 0 < blocked < len(rows)

    # tie -> allow; no match -> allow (unit, via the evaluator)
    probe = spark.createDataFrame(
        [("/a/b", ["/a/"], ["/a/"]), ("/zz", ["/a/"], ["/b/"])],
        "path string, allow array<string>, disallow array<string>",
    ).select(
        "path",
        robots_allowed(
            F.col("path"), F.col("allow"), F.col("disallow")
        ).alias("ok"),
    )
    assert [r.ok for r in probe.orderBy("path").collect()] == [True, True]
