"""Counting-Bloom membership store (11th stream family): slice
additivity, probe semantics (zero false negatives), erasure parity
with a rebuild-from-survivors, and bucket determinism."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark, ids_texts):
    return spark.createDataFrame(
        [(i, t, f"src{i % 3}") for i, t in ids_texts],
        "doc_id long, text string, source string",
    )


def test_bloom_slices_merge_to_oneshot(spark, tmp_path):
    """Batch-sliced ingest + compaction answers identically to a
    one-shot store of the whole corpus (additivity across the
    compaction boundary)."""
    from synthea_etl_spark.operators.dedup import (
        bloom_store,
        compact_counting_slices,
        counting_store_totals,
    )

    docs = _docs(spark, [(i, f"text number {i}") for i in range(40)])
    store = str(tmp_path / "sliced")
    oneshot = str(tmp_path / "oneshot")
    bloom_store(docs.filter(F.col("doc_id") < 20), store, "batch0")
    bloom_store(docs.filter(F.col("doc_id") >= 20), store, "batch1")
    compact_counting_slices(spark, store, 1, ["b"], "c")
    bloom_store(docs, oneshot, "batch1")

    def totals(p):
        return {
            (r.b, r.c)
            for r in counting_store_totals(spark, p, ["b"], "c").collect()
        }

    assert totals(store) == totals(oneshot)


def test_bloom_probe_no_false_negatives_and_dedup_duplicates(
    spark, tmp_path
):
    """Every ingested fingerprint probes present (the Bloom
    guarantee); duplicate texts share a fingerprint and keep
    membership while any copy survives."""
    from synthea_etl_spark.operators.dedup import (
        bloom_probe_from_store,
        bloom_slice,
        bloom_store,
        compact_counting_slices,
        deletion_slice,
        doc_fingerprint,
    )

    docs = _docs(
        spark,
        [(i, f"unique body {i}") for i in range(30)]
        + [(100, "shared dup text"), (101, "shared dup text")],
    )
    store = str(tmp_path / "store")
    bloom_store(docs, store, "batch0")
    fps = docs.select(doc_fingerprint().alias("fp")).distinct()
    out = {
        r.fp: r.present
        for r in bloom_probe_from_store(spark, store, fps).collect()
    }
    assert all(out.values())  # zero false negatives
    # erase ONE copy of the duplicate: fingerprint stays present
    one_copy = docs.filter(F.col("doc_id") == 100)
    (
        deletion_slice(bloom_slice(one_copy), ["c"])
        .withColumn("slice_id", F.lit("batch1"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("slice_id")
        .parquet(store)
    )
    compact_counting_slices(spark, store, 1, ["b"], "c")
    dup_fp = one_copy.select(doc_fingerprint().alias("fp"))
    out2 = bloom_probe_from_store(spark, store, dup_fp).collect()
    assert out2[0].present  # the other copy still holds the buckets


def test_bloom_erasure_matches_rebuild(spark, tmp_path):
    """deletion_slice purge leaves the store bit-identical to one
    rebuilt from only the surviving documents — totals and probe
    verdicts, immediately and post-compaction."""
    from synthea_etl_spark.operators.dedup import (
        bloom_probe_from_store,
        bloom_slice,
        bloom_store,
        compact_counting_slices,
        counting_store_totals,
        deletion_slice,
        doc_fingerprint,
    )

    docs = _docs(spark, [(i, f"doc body {i} {i * 7}") for i in range(50)])
    erase = docs.filter(F.col("doc_id") % 5 == 2)
    survivors = docs.join(erase.select("doc_id"), "doc_id", "left_anti")
    store = str(tmp_path / "store")
    rebuilt = str(tmp_path / "rebuilt")
    bloom_store(docs, store, "batch0")
    (
        deletion_slice(bloom_slice(erase), ["c"])
        .withColumn("slice_id", F.lit("batch1"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("slice_id")
        .parquet(store)
    )
    bloom_store(survivors, rebuilt, "batch0")

    def totals(p):
        return {
            (r.b, r.c)
            for r in counting_store_totals(spark, p, ["b"], "c").collect()
        }

    probes = docs.select(doc_fingerprint().alias("fp")).distinct()

    def verdicts(p):
        return {
            r.fp: r.present
            for r in bloom_probe_from_store(spark, p, probes).collect()
        }

    assert totals(store) == totals(rebuilt)  # immediate (zero-net filter)
    assert verdicts(store) == verdicts(rebuilt)
    compact_counting_slices(spark, store, 1, ["b"], "c")
    assert totals(store) == totals(rebuilt)
    assert verdicts(store) == verdicts(rebuilt)


def test_bloom_buckets_deterministic_and_bounded(spark):
    from synthea_etl_spark.operators.dedup import (
        BLOOM_K,
        BLOOM_M,
        bloom_buckets,
    )

    df = spark.createDataFrame([("abc",), ("def",)], "fp string")
    a = df.select(bloom_buckets(F.col("fp")).alias("bs")).collect()
    b = df.select(bloom_buckets(F.col("fp")).alias("bs")).collect()
    assert [r.bs for r in a] == [r.bs for r in b]
    for r in a:
        assert len(r.bs) == BLOOM_K
        assert all(0 <= x < BLOOM_M for x in r.bs)
