"""Round-9 operator family: RRF hybrid fusion, canonical near-dup
representatives, language quotas, and the persisted corpus sketch
store."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_rrf_fuse_exact_and_order_independent(spark):
    """RRF micro-contributions are exact integers: fused score of a
    doc in both arms is floor(1e12/(60+ra)) + floor(1e12/(60+rb));
    arm order and partitioning never change the sum; single-arm docs
    rank below two-arm docs with comparable ranks."""
    from synthea_etl_spark.operators.retrieval import RRF_MICRO, rrf_fuse

    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, doc_id long, rank int",
    )
    b = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2)], "query_id long, doc_id long, rank int"
    )
    out = {
        r.doc_id: (r.rrf_micro, r.n_arms, r.rank)
        for r in rrf_fuse([a, b], topk=10).collect()
    }
    c = lambda rk: RRF_MICRO // (60 + rk)  # noqa: E731
    assert out[11] == (c(2) + c(1), 2, 1)  # both arms: top fused
    assert out[10] == (c(1), 1, 2)
    assert out[13] == (c(2), 1, 3)
    assert out[12] == (c(3), 1, 4)

    flipped = {
        r.doc_id: (r.rrf_micro, r.n_arms, r.rank)
        for r in rrf_fuse(
            [b.repartition(7), a.repartition(3)], topk=10
        ).collect()
    }
    assert flipped == out  # arm order / partitioning invariant


def test_corpus_sketch_store_roundtrip_and_small_corpus_estimate(
    spark, tmp_path
):
    """The persisted per-slice sketches merge to the direct corpus
    sketch through parquet, replaying a slice is a no-op (dynamic
    overwrite), and the union-count denominator makes two identical
    small corpora estimate Jaccard 1.0 (not n/k)."""
    import synthea_etl_spark.operators.dedup as D

    docs = spark.createDataFrame(
        [(i, f"tiny corpus doc {i}") for i in range(10)],
        "doc_id long, text string",
    )
    store = str(tmp_path / "sketches")
    D.corpus_sketch_store(docs.filter("doc_id < 5"), store, "s0", k=64)
    D.corpus_sketch_store(docs.filter("doc_id >= 5"), store, "s1", k=64)
    D.corpus_sketch_store(docs.filter("doc_id >= 5"), store, "s1", k=64)  # replay
    merged = D.merge_bottomk_sketches(spark.read.parquet(store), k=64)
    direct = D.corpus_bottomk_sketch(docs, k=64)
    assert sorted(r.h for r in merged.collect()) == sorted(
        r.h for r in direct.collect()
    )

    est = D.corpus_overlap_from_sketches(merged, direct, k=64).collect()[0]
    assert (est.k, est.n_union, est.n_common) == (64, 10, 10)
    assert est.jaccard_micro == 1_000_000  # identical corpora -> 1.0


def test_language_quota_caps_each_language(spark):
    """Every language keeps at most the quota, ranks are 1..n within
    a language, and the admission order is the deterministic md5."""
    from synthea_etl_spark.plans.llm5 import _LANG_QUOTA, q181_language_quota

    out = q181_language_quota(spark, "/root/testdata/sf0.001").collect()
    by_lang: dict = {}
    for r in out:
        by_lang.setdefault(r.lang_guess, []).append(r)
    for lang, rows in by_lang.items():
        kept = [r for r in rows if r.keep]
        assert len(kept) <= _LANG_QUOTA, lang
        assert sorted(r.lang_rank for r in rows) == list(
            range(1, len(rows) + 1)
        ), lang
        assert all(r.keep == (r.lang_rank <= _LANG_QUOTA) for r in rows)


def test_canonical_reps_pick_best_quality_member(spark, monkeypatch):
    """Within each near-dup cluster the representative is the
    max-score member (tie: min doc_id) and n_members counts the whole
    component."""
    import synthea_etl_spark.operators.dedup as D
    from synthea_etl_spark.plans.llm5 import _int_quality_score

    # synthetic components: pairs (1,2),(2,3) and (10,11)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    clusters = D.connected_components(pairs)
    docs = spark.createDataFrame(
        [
            (1, "short text."),
            (2, "a much longer and richer document with many words"),
            (3, "short text too."),
            (10, "twin one alpha"),
            (11, "twin one beta"),
        ],
        "doc_id long, text string",
    )
    scores = docs.select(
        F.col("doc_id").alias("id"), _int_quality_score("text").alias("score")
    )
    from pyspark.sql import Window

    members = clusters.join(scores, "id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("score"), F.asc("id"))
    wc = Window.partitionBy("cluster_id")
    reps = {
        r.cluster_id: (r.rep_doc_id, r.n_members)
        for r in members.withColumn("_rn", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(wc))
        .filter("_rn = 1")
        .select(
            "cluster_id", F.col("id").alias("rep_doc_id"), "n_members"
        )
        .collect()
    }
    assert reps[1] == (2, 3)  # richest doc wins the 3-member cluster
    # twins tie on score shape? equal token counts -> tie broken by id
    assert reps[10][1] == 2


def test_temperature_mixture_alloc_properties(spark):
    """alpha=0.5 allocation: total kept <= budget, no language
    exceeds its own supply, and any below-average-count language gets
    a keep RATE at least that of any above-average one (the
    low-resource boost that distinguishes temperature sampling from
    proportional sampling)."""
    from synthea_etl_spark.plans.llm5 import (
        _MIX_BUDGET,
        q182_temperature_mixture,
    )

    rows = q182_temperature_mixture(spark, "/root/testdata/sf0.001").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang_guess, []).append(r)
    kept_total = sum(1 for r in rows if r.keep)
    assert kept_total <= _MIX_BUDGET
    rates = {
        lang: sum(1 for r in v if r.keep) / len(v)
        for lang, v in by_lang.items()
    }
    sizes = {lang: len(v) for lang, v in by_lang.items()}
    for small, ns in sizes.items():
        for big, nb in sizes.items():
            if ns < nb and rates[big] < 1.0:
                # sqrt weighting: smaller language keeps a >= rate
                # (unless both are supply-capped at 1.0)
                assert rates[small] >= rates[big] - 1e-9, (small, big, rates)


def test_ivf_index_stats_counts_and_hot_flag(spark):
    """The health report partitions the corpus exactly (occupancies
    sum to n), mean coherence is the micro-quantized mean, and the
    hot flag fires iff occupancy > 2x the mean cell."""
    from synthea_etl_spark.plans.llm5 import q183_ivf_index_stats

    rows = q183_ivf_index_stats(spark, "/root/testdata/sf0.001").collect()
    total = sum(r.n_vecs for r in rows)
    assert total == 500  # sf0.001 embeddings table row count
    avg = total / len(rows)
    for r in rows:
        assert r.hot == (r.n_vecs > 2 * avg)
        assert -1_000_000 <= r.mean_sim_micro <= 1_000_000
