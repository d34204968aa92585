"""Round-13 batch-3 tests: mixed-aggregate slice compaction, the
prompt-key store family, and the q240 store-vs-batch gate."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_compact_agg_slices_merges_min_and_sum(spark, tmp_path):
    """MIN partials must re-merge to the global min across the
    compaction boundary (SUM alone was covered by the counting
    store), and a crash in the publish->watermark window stays
    convergent: the retry overwrites the same versioned partition
    with the same data."""
    from synthea_etl_spark.operators.dedup import (
        agg_store_totals,
        compact_agg_slices,
    )

    store = str(tmp_path / "store")
    aggs = {"n": "sum", "min_doc": "min"}
    rows = [
        [("a", 2, 10), ("b", 1, 7)],
        [("a", 1, 3)],
        [("a", 1, 30), ("b", 2, 5)],
    ]
    for b, rs in enumerate(rows):
        (
            spark.createDataFrame(rs, "pkey string, n long, min_doc long")
            .withColumn("slice_id", F.lit(f"batch{b}"))
            .write.mode("append")
            .partitionBy("slice_id")
            .parquet(store)
        )

    def totals():
        return {
            (r.pkey, r.n, r.min_doc)
            for r in agg_store_totals(
                spark, store, ["pkey"], aggs
            ).collect()
        }

    want = {("a", 4, 3), ("b", 3, 5)}
    assert totals() == want
    compact_agg_slices(spark, store, 1, ["pkey"], aggs)
    assert totals() == want
    # simulate the crash window: a half-published NEXT compacted
    # partition (no watermark flip) must stay invisible...
    orphan = [("a", 99, 1), ("zz", 1, 1)]
    (
        spark.createDataFrame(orphan, "pkey string, n long, min_doc long")
        .withColumn("slice_id", F.lit("compacted2"))
        .write.mode("append")
        .partitionBy("slice_id")
        .parquet(store)
    )
    assert totals() == want
    # ...and the retry overwrites it with the correct fold
    compact_agg_slices(spark, store, 2, ["pkey"], aggs)
    assert totals() == want
    assert not os.path.isdir(os.path.join(store, "slice_id=batch0"))


def test_prompt_key_slices_remerge_to_corpus_clusters(spark):
    """Any doc_id split of the corpus re-merges to q233's clusters:
    SUM(n) = cluster size, MIN(min_doc) = representative."""
    from synthea_etl_spark.operators.dedup import prompt_key_slice
    from synthea_etl_spark.plans.llm22 import q233_prompt_dedup

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    a = prompt_key_slice(docs.filter(F.col("doc_id") % 2 == 0))
    b = prompt_key_slice(docs.filter(F.col("doc_id") % 2 == 1))
    merged = {
        (r.pkey, r.n, r.min_doc)
        for r in a.unionByName(b)
        .groupBy("pkey")
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.min("min_doc").cast("long").alias("min_doc"),
        )
        .collect()
    }
    want = {
        (r.pkey, r.cluster_n, r.rep_doc_id)
        for r in q233_prompt_dedup(spark, SF_DIR)
        .select("pkey", "cluster_n", "rep_doc_id")
        .distinct()
        .collect()
    }
    assert merged == want


def test_q240_equals_q233_bit_for_bit(spark):
    """The gate contract: the store-answered frame is exactly the
    batch q233 frame (through the in-query mid-build compaction)."""
    from synthea_etl_spark.plans.llm22 import q233_prompt_dedup
    from synthea_etl_spark.plans.llm24 import q240_prompt_dedup_from_store

    got = {
        tuple(r) for r in q240_prompt_dedup_from_store(spark, SF_DIR).collect()
    }
    want = {tuple(r) for r in q233_prompt_dedup(spark, SF_DIR).collect()}
    assert got == want


def test_unmergeable_aggregate_is_rejected(spark, tmp_path):
    """'avg' partials do NOT re-merge; the spec must refuse rather
    than silently compute a wrong fold."""
    from synthea_etl_spark.operators.dedup import (
        _slice_agg_exprs,
        agg_store_totals,
    )

    with pytest.raises(ValueError, match="unmergeable"):
        _slice_agg_exprs({"n": "avg"})
