"""Round-13 batch-8 tests: cluster-grain split, contamination CI."""

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


def test_cluster_split_has_zero_cross_pairs_and_counts_groups(
    spark, tmp_path
):
    """An exact-dup pair plus a near-dup all land in ONE group; the
    cross-split candidate-pair count is zero; doc and group counts
    reconcile."""
    from synthea_etl_spark.plans.llm29 import q255_cluster_grain_split

    sf = str(tmp_path)
    base = " ".join(f"w{i}" for i in range(30))
    near = base.replace("w9 ", "zz ", 1)
    rows = [(0, base, "s"), (1, base, "s"), (2, near, "s")] + [
        (i, " ".join(f"u{i}x{j}" for j in range(20)), "s")
        for i in range(3, 11)
    ]
    _write_docs(spark, sf, rows)
    out = q255_cluster_grain_split(spark, sf).collect()
    assert sum(r.n_docs for r in out) == 11
    assert all(r.cross_split_pairs == 0 for r in out)
    # {0,1,2} is one group, 8 singletons -> 9 groups across splits
    assert sum(r.n_groups for r in out) == 9


def test_cluster_split_on_testdata_matches_group_invariant(spark):
    """On the real corpus: zero cross-split pairs (the guarantee),
    and n_groups <= n_docs per split."""
    from synthea_etl_spark.plans.llm29 import q255_cluster_grain_split

    out = q255_cluster_grain_split(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.cross_split_pairs == 0
        assert 0 < r.n_groups <= r.n_docs


def test_contamination_ci_flags_copied_doc(spark, tmp_path):
    """A corpus doc that shares all its 3-grams with a benchmark doc
    is contaminated; a disjoint one is not; bounds bracket the rate
    when every doc agrees (degenerate interval)."""
    from synthea_etl_spark.plans.llm29 import q256_contamination_ci

    sf = str(tmp_path)
    bench = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [(0, bench, "bench")] + [
        (100, bench, "copy"),  # 100% overlap -> contaminated
        (101, "one two three four five six seven", "clean"),
    ]
    _write_docs(spark, sf, rows)
    out = {r.source: r for r in q256_contamination_ci(spark, sf).collect()}
    assert out["copy"].n_contaminated == 1
    assert out["copy"].rate_micro == 1_000_000
    # every replicate of a 1-doc fully-contaminated source is 1.0
    assert out["copy"].lo_micro == out["copy"].hi_micro == 1_000_000
    assert out["clean"].n_contaminated == 0
    assert out["clean"].rate_micro == 0
    assert out["clean"].lo_micro == out["clean"].hi_micro == 0


def test_contamination_ci_brackets_rate_on_testdata(spark):
    from synthea_etl_spark.plans.llm29 import q256_contamination_ci

    rows = q256_contamination_ci(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.lo_micro <= r.hi_micro
        # percentile bounds need not strictly bracket the point rate
        # for tiny sources, but they may never invert around it badly
        assert r.lo_micro <= r.rate_micro + 1
        assert r.hi_micro + 1 >= r.rate_micro


def test_connected_components_converges_on_long_chain(spark):
    """Regression for the round-13 q255 catch: a 64-hop path graph
    must collapse to ONE component within the default max_iters —
    plain relax-only propagation covers only diameter <= 15 and left
    the tail mislabeled (q255's cross-split verification found the
    leaked pair on organic sf10); pointer jumping makes convergence
    O(log diameter)."""
    from synthea_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    labels = connected_components(pairs).collect()
    assert len(labels) == 65
    assert {r.cluster_id for r in labels} == {0}


def test_connected_components_raises_when_unconverged(spark):
    """Defense-in-depth for the same bug class: exiting at max_iters
    with changes pending must RAISE, never return a silently-partial
    labeling (every consumer treats cluster_id as ground truth)."""
    import pytest

    from synthea_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=2)
    # and the guard does not fire on a converged run at a tight but
    # sufficient bound: 64 hops needs ~log2(64)+slack jump rounds
    ok = connected_components(pairs, max_iters=10).collect()
    assert {r.cluster_id for r in ok} == {0}


def test_connected_components_empty_edge_frame(spark):
    """The r15 loop restructure converges via an exact decimal
    label-sum probe; SUM over zero rows is NULL and must mean 'empty
    graph, converged trivially' — an empty label frame, never a
    raise or a NULL-labeled row."""
    from synthea_etl_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(pairs).collect() == []


def test_llm29_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm29 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
