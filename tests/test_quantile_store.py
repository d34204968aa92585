"""Length-quantile histogram store (10th stream family): integer
log-binning, merge-exactness across slices and compaction, the
one-bin quantile error bound, and free erasure via deletion_slice."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, rows):
    # rows: (doc_id, n_tokens) -> synthesize a doc with that many tokens
    return spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(n)), f"s{i % 2}") for i, n in rows],
        "doc_id long, text string, source string",
    )


def test_log_bin_exact_below_8_and_geometric_above(spark):
    from synthea_etl_spark.operators.dedup import log_bin

    df = spark.createDataFrame(
        [(v,) for v in [1, 7, 8, 15, 16, 17, 1000, 1024]], "v long"
    )
    got = {r.v: r.b for r in df.select("v", log_bin("v").alias("b")).collect()}
    assert got[1] == 1 and got[7] == 7          # exact small bins
    assert got[8] == 24 and got[15] == 31       # msb=3 sub 0..7
    assert got[16] == 32 and got[17] == 32      # 16,17 share a bin
    assert got[1000] == 79 and got[1024] == 80


def test_hist_store_merges_and_bounds_quantiles(spark, tmp_path):
    from synthea_etl_spark.operators.dedup import (
        compact_counting_slices,
        counting_store_totals,
        length_hist_slice,
        length_hist_store,
        quantiles_from_hist_store,
    )

    lens = [3, 5, 9, 12, 20, 40, 80, 200, 500, 1000]
    docs = _docs(spark, list(enumerate(lens)))
    store = str(tmp_path / "hist")
    length_hist_store(docs.filter(F.col("doc_id") < 5), store, "batch1")
    length_hist_store(docs.filter(F.col("doc_id") >= 5), store, "batch2")
    # merged totals == one-shot slice over the whole corpus
    merged = {
        (r.source, r.b, r.c)
        for r in counting_store_totals(
            spark, store, ["source", "b"], "c"
        ).collect()
    }
    oneshot = {
        (r.source, r.b, r.c) for r in length_hist_slice(docs).collect()
    }
    assert merged == oneshot
    compact_counting_slices(spark, store, 2, ["source", "b"], "c")
    merged2 = {
        (r.source, r.b, r.c)
        for r in counting_store_totals(
            spark, store, ["source", "b"], "c"
        ).collect()
    }
    assert merged2 == oneshot
    # one-bin error bound per source/quantile vs the exact order stat
    qs = [500, 900]
    got = {
        (r.source, r.q_permille): (r.n_docs, r.approx)
        for r in quantiles_from_hist_store(spark, store, qs).collect()
    }
    per_src = {"s0": sorted(lens[0::2]), "s1": sorted(lens[1::2])}
    for (src, q), (n_docs, approx) in got.items():
        vals = per_src[src]
        assert n_docs == len(vals)
        k = (q * n_docs + 999) // 1000
        exact = vals[k - 1]
        assert approx <= exact <= approx + approx // 8, (src, q)


def test_hist_store_erasure_via_deletion_slice(spark, tmp_path):
    from synthea_etl_spark.operators.dedup import (
        compact_counting_slices,
        counting_store_totals,
        deletion_slice,
        length_hist_slice,
        length_hist_store,
    )

    lens = [3, 5, 9, 12, 20, 40]
    docs = _docs(spark, list(enumerate(lens)))
    store = str(tmp_path / "hist")
    rebuilt = str(tmp_path / "hist_rebuilt")
    length_hist_store(docs, store, "batch1")
    erased = docs.filter(F.col("doc_id").isin(1, 4))
    (
        deletion_slice(length_hist_slice(erased), ["c"])
        .withColumn("slice_id", F.lit("batch2"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("slice_id")
        .parquet(store)
    )
    length_hist_store(
        docs.filter(~F.col("doc_id").isin(1, 4)), rebuilt, "batch1"
    )
    compact_counting_slices(spark, store, 2, ["source", "b"], "c")
    got = {
        (r.source, r.b, r.c)
        for r in counting_store_totals(
            spark, store, ["source", "b"], "c"
        ).collect()
    }
    want = {
        (r.source, r.b, r.c)
        for r in counting_store_totals(
            spark, rebuilt, ["source", "b"], "c"
        ).collect()
    }
    assert got == want
