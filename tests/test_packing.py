"""Unit tests: distributed cumulative sum, sequence packing,
contamination screen, int8 quantization."""

from __future__ import annotations

from pyspark.sql import functions as F

import synthea_etl_spark.operators.dedup as D
import synthea_etl_spark.operators.packing as P
import synthea_etl_spark.operators.similarity as S
from synthea_etl_spark.operators.util import distributed_cumsum


def test_distributed_cumsum_matches_single_window(spark):
    rows = [(i, (i * 7) % 13 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, v long").repartition(8)
    got = {
        r.id: r.cs
        for r in distributed_cumsum(df, "id", "v", out_col="cs").collect()
    }
    run, want = 0, {}
    for i, v in rows:
        run += v
        want[i] = run
    assert got == want


def test_distributed_cumsum_exclusive_starts_at_zero(spark):
    df = spark.createDataFrame([(1, 10), (2, 20), (3, 30)], "id long, v long")
    got = {
        r.id: r.cs
        for r in distributed_cumsum(
            df, "id", "v", out_col="cs", exclusive=True
        ).collect()
    }
    assert got == {1: 0, 2: 10, 3: 30}


def test_pack_sequences_budget_boundaries(spark):
    # 3 docs x 4 tokens, budget 6: doc0 starts pack0 off0, doc1 starts
    # pack0 off4, doc2 starts at offset 8 -> pack1 off2
    df = spark.createDataFrame(
        [(0, "a b c d"), (1, "e f g h"), (2, "i j k l")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in P.pack_sequences(df, "text", "doc_id", budget=6).collect()}
    assert (out[0].pack_id, out[0].pack_offset) == (0, 0)
    assert (out[1].pack_id, out[1].pack_offset) == (0, 4)
    assert (out[2].pack_id, out[2].pack_offset) == (1, 2)


def test_pack_sequences_empty_doc_zero_width(spark):
    df = spark.createDataFrame(
        [(0, "a b"), (1, "   "), (2, "c d")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in P.pack_sequences(df, "text", "doc_id", budget=10).collect()}
    assert out[1].n_tokens == 0
    assert out[1].start_offset == 2 and out[2].start_offset == 2


def test_contamination_full_and_zero_overlap(spark):
    bench = spark.createDataFrame([(100, "the quick brown fox jumps")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),  # fully contaminated
            (2, "совершенно другой текст здесь есть"),  # disjoint
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in D.contamination_overlap(corpus, bench, "text", "doc_id").collect()}
    assert out[1].overlap_ratio == 1.0 and out[1].n_overlap == out[1].n_shingles
    assert out[2].n_overlap == 0 and out[2].overlap_ratio == 0.0


def test_quantize_int8_range_and_zero_dim(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0, -2.0]), (2, [-4.0, 0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = S.quantize_embeddings_int8(df).collect()
    by = {(r.vec_id, r.pos): r for r in rows}
    assert by[(2, 0)].q == -127  # max |x| in dim 0 is 4.0
    assert by[(1, 0)].q == round(1.0 * 127 / 4.0)
    assert by[(1, 1)].q == 0 and by[(2, 1)].q == 0  # all-zero dim
    assert all(-127 <= r.q <= 127 for r in rows)
    # dequantization error bounded by scale/254 (half a quant step)
    for r in rows:
        if r.scale > 0:
            x = {1: [1.0, 0.0, -2.0], 2: [-4.0, 0.0, 1.0]}[r.vec_id][r.pos]
            assert abs(r.q * r.scale / 127.0 - x) <= r.scale / 254.0 + 1e-12


def test_approx_distinct_within_rsd(spark):
    """q101's gate shape emits exact counts + the HLL tolerance
    verdict; the exact side must match an independent recount and
    every verdict must be true (the sketch within ±3%)."""
    from synthea_etl_spark.plans.extended2 import q101_approx_distinct

    sf = "/root/testdata/sf0.01"
    got = {r.o_orderpriority: r for r in q101_approx_distinct(spark, sf).collect()}
    o = spark.read.parquet(f"{sf}/orders.parquet")
    exact = {
        r.o_orderpriority: r
        for r in o.groupBy("o_orderpriority")
        .agg(
            F.countDistinct("o_custkey").alias("c"),
            F.countDistinct("o_orderdate").alias("d"),
        )
        .collect()
    }
    for k, e in exact.items():
        assert got[k].exact_customers == e.c
        assert got[k].exact_dates == e.d
        assert got[k].hll_ok


def test_approx_percentiles_within_tolerance(spark):
    from synthea_etl_spark.plans.extended2 import q102_approx_percentiles

    sf = "/root/testdata/sf0.01"
    got = {r.l_returnflag: r for r in q102_approx_percentiles(spark, sf).collect()}
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    exact = {
        r.l_returnflag: r.p
        for r in li.groupBy("l_returnflag")
        .agg(F.expr("percentile(l_extendedprice, array(0.5, 0.95, 0.99))").alias("p"))
        .collect()
    }
    for k, (e50, e95, e99) in exact.items():
        # the gate shape emits exact DISCRETE percentiles (element at
        # rank ceil(p*n)) — close to the interpolated exact values on
        # this distribution — plus the GK-within-rank-window verdict
        assert abs(got[k].p50_exact - e50) / e50 < 0.02
        assert abs(got[k].p95_exact - e95) / e95 < 0.02
        assert abs(got[k].p99_exact - e99) / e99 < 0.02
        assert got[k].gk_ok
