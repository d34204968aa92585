"""Count-Min / candidate "frequency sandwich" store (12th stream
family): slice additivity across compaction, the two PROVEN bounds
(est >= true >= lower), the batch-local candidate guarantee, exact
N recovery from the sketch, and erasure parity with a
rebuild-from-survivors."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, ids_texts):
    return spark.createDataFrame(
        [(i, t, f"src{i % 3}") for i, t in ids_texts],
        "doc_id long, text string, source string",
    )


def _corpus(spark):
    # a skewed corpus: 'alpha' dominates, a mid tier, and hapaxes
    rows = []
    for i in range(40):
        rows.append((i, "alpha alpha alpha beta gamma"))
    for i in range(40, 55):
        rows.append((i, "beta delta epsilon"))
    for i in range(55, 60):
        rows.append((i, f"rare{i} zeta"))
    return _docs(spark, rows)


def _exact_counts(docs):
    from synthea_etl_spark.operators.dedup import batch_term_counts

    return {r.t: r.c for r in batch_term_counts(docs).collect()}


def test_cms_slices_merge_to_oneshot(spark, tmp_path):
    """Batch-sliced ingest + mid-stream compaction answers cell-
    identically to a one-shot store (CMS is a linear sketch)."""
    from synthea_etl_spark.operators.dedup import (
        cms_store,
        compact_counting_slices,
        counting_store_totals,
    )

    docs = _corpus(spark)
    store = str(tmp_path / "sliced")
    oneshot = str(tmp_path / "oneshot")
    cms_store(docs.filter(F.col("doc_id") % 2 == 0), store, "batch0")
    compact_counting_slices(spark, store, 0, ["d", "b"], "c")
    cms_store(docs.filter(F.col("doc_id") % 2 == 1), store, "batch1")
    cms_store(docs, oneshot, "batch0")

    def cells(p):
        return {
            (r.d, r.b): r.c
            for r in counting_store_totals(
                spark, p, ["d", "b"], "c"
            ).collect()
        }

    assert cells(store) == cells(oneshot)


def test_cms_upper_and_candidate_lower_bounds(spark, tmp_path):
    """est >= true for every term (CMS guarantee), lower <= true for
    every candidate term, and every term with global count*k > N is
    present in the candidate store (the batch-local threshold
    guarantee) even when ingested across skewed batches."""
    from synthea_etl_spark.operators.dedup import (
        HH_K,
        cms_estimate_from_store,
        cms_store,
        hh_candidate_store,
        hh_lower_from_store,
    )

    docs = _corpus(spark)
    exact = _exact_counts(docs)
    n = sum(exact.values())
    cms = str(tmp_path / "cms")
    cand = str(tmp_path / "cand")
    for b, pred in ((0, F.col("doc_id") < 50), (1, F.col("doc_id") >= 50)):
        batch = docs.filter(pred)
        cms_store(batch, cms, f"batch{b}")
        hh_candidate_store(batch, cand, f"batch{b}")

    probes = spark.createDataFrame(
        [(t,) for t in exact] + [("absent_term",)], "t string"
    )
    est = {
        r.t: r.est
        for r in cms_estimate_from_store(spark, cms, probes).collect()
    }
    assert est["absent_term"] >= 0
    for t, c in exact.items():
        assert est[t] >= c, (t, est[t], c)

    lower = {r.t: r.lower for r in hh_lower_from_store(spark, cand).collect()}
    for t, lo in lower.items():
        assert lo <= exact[t], (t, lo, exact[t])
    for t, c in exact.items():
        if c * HH_K > n:
            assert t in lower, f"guaranteed candidate {t} missing"


def test_cms_total_tokens_exact(spark, tmp_path):
    from synthea_etl_spark.operators.dedup import cms_store, cms_total_tokens

    docs = _corpus(spark)
    n = sum(_exact_counts(docs).values())
    store = str(tmp_path / "cms")
    cms_store(docs, store, "batch0")
    assert cms_total_tokens(spark, store).collect()[0].n_tokens == n


def test_cms_erasure_matches_rebuild(spark, tmp_path):
    """Deletion slices + compaction leave BOTH stores answering
    bit-identically to stores rebuilt from only the survivors, and
    a fully-erased term's estimate reads 0 immediately (pending
    deletion slice, pre-compaction)."""
    from synthea_etl_spark.operators.dedup import (
        batch_term_counts,
        cms_estimate_from_store,
        cms_slice_from_counts,
        cms_store,
        compact_counting_slices,
        counting_store_totals,
        deletion_slice,
        hh_candidate_store,
        publish_counting_slice,
    )

    docs = _corpus(spark)
    erased = docs.filter(F.col("doc_id") >= 55)  # all rare docs
    survivors = docs.filter(F.col("doc_id") < 55)
    cms = str(tmp_path / "cms")
    cand = str(tmp_path / "cand")
    cms_store(docs, cms, "batch0")
    hh_candidate_store(docs, cand, "batch0")

    ec = batch_term_counts(erased)
    publish_counting_slice(
        deletion_slice(cms_slice_from_counts(ec), ["c"]), cms, "batch1"
    )
    # erased 'rare*' terms read 0 IMMEDIATELY (deletion pending)
    est = {
        r.t: r.est
        for r in cms_estimate_from_store(
            spark, cms, spark.createDataFrame([("rare55",)], "t string")
        ).collect()
    }
    assert est["rare55"] == 0
    publish_counting_slice(deletion_slice(ec, ["c"]), cand, "batch1")

    compact_counting_slices(spark, cms, 1, ["d", "b"], "c")
    compact_counting_slices(spark, cand, 1, ["t"], "c")
    cms_rebuilt = str(tmp_path / "cms_rebuilt")
    cand_rebuilt = str(tmp_path / "cand_rebuilt")
    cms_store(survivors, cms_rebuilt, "batch0")
    hh_candidate_store(survivors, cand_rebuilt, "batch0")

    def cells(p, keys):
        return {
            tuple(r[k] for k in keys) + (r.c,)
            for r in counting_store_totals(spark, p, keys, "c").collect()
        }

    assert cells(cms, ["d", "b"]) == cells(cms_rebuilt, ["d", "b"])
    # candidate store: post-erasure nets stay a valid lower bound of
    # the TRUE surviving counts (NOT comparable slice-for-slice to a
    # survivor rebuild — batch thresholds are relative)
    exact_surv = _exact_counts(survivors)
    net = {r.t: r.c for r in counting_store_totals(spark, cand, ["t"], "c").collect()}
    for t, c in net.items():
        if c > 0:
            assert c <= exact_surv.get(t, 0), (t, c, exact_surv.get(t))
    # and the rebuild is itself a valid lower bound (sanity)
    rb = {r.t: r.c for r in counting_store_totals(spark, cand_rebuilt, ["t"], "c").collect()}
    for t, c in rb.items():
        assert c <= exact_surv.get(t, 0), (t, c, exact_surv.get(t))


def test_candidate_store_all_empty_slices_reads_empty(spark, tmp_path):
    """A near-uniform corpus admits ZERO candidates per batch (the
    measured organic-sf10 regime); the store then holds only
    _SUCCESS markers and must read as EMPTY, not raise."""
    from synthea_etl_spark.operators.dedup import (
        hh_candidate_store,
        hh_lower_from_store,
    )

    docs = _docs(
        spark,
        [(i, " ".join(f"u{i}_{j}" for j in range(40))) for i in range(40)],
    )
    store = str(tmp_path / "cand")
    for b in (0, 1):
        hh_candidate_store(
            docs.filter(F.col("doc_id") % 2 == b), store, f"batch{b}"
        )
    assert hh_lower_from_store(spark, store).collect() == []
    # a store dir that was never written at all also reads empty
    assert (
        hh_lower_from_store(spark, str(tmp_path / "never")).collect() == []
    )
