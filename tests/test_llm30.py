"""Round-13 batch-9 tests: preference pairs, ICL ordering."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_preference_pairs_pick_extremes_and_denoise(spark, tmp_path):
    """Three responses under one prompt: chosen is the max-reward
    doc, rejected the min-reward doc, margin exact; a single-response
    prompt emits nothing."""
    from synthea_etl_spark.plans.llm30 import q257_preference_pairs

    sf = str(tmp_path)
    prompt = "p1 p2 p3 p4 p5 p6 p7 p8"
    rows = [
        (0, prompt + " resp zero", "s"),
        (1, prompt + " resp one", "s"),
        (2, prompt + " resp two", "s"),
        (3, "q1 q2 q3 q4 q5 q6 q7 q8 lonely", "s"),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    ).withColumn("lang", F.lit("en")).withColumn(
        "n_chars", F.length("text")
    ).write.parquet(
        sf + "/documents.parquet"
    )
    import hashlib

    def reward(doc_id):
        h = int(hashlib.md5(f"rw{doc_id}".encode()).hexdigest()[:8], 16)
        return h % 2001 - 1000

    out = q257_preference_pairs(spark, sf).collect()
    rewards = {i: reward(i) for i in (0, 1, 2)}
    hi = max(rewards, key=lambda i: (rewards[i], -i))
    lo = min(rewards, key=lambda i: (rewards[i], -i))
    margin = rewards[hi] - rewards[lo]
    if margin >= 100:
        assert len(out) == 1
        r = out[0]
        assert r.chosen_id == hi and r.rejected_id == lo
        assert r.margin_milli == margin
        assert r.n_responses == 3
    else:  # denoised away (depends only on fixed md5 values)
        assert out == []


def test_icl_order_groups_and_orders_within_buckets(spark):
    """Every vector appears exactly once; positions are 1..n dense
    per bucket; distances are non-decreasing along each bucket's
    order (the semantic-locality contract)."""
    from synthea_etl_spark.plans.llm30 import q258_icl_order

    rows = q258_icl_order(spark, SF_DIR).collect()
    assert len(rows) == 500
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for b, rs in by_bucket.items():
        rs.sort(key=lambda r: r.position)
        assert [r.position for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.dist_nano for r in rs]
        assert dists == sorted(dists)


def test_llm30_match_duckdb_on_testdata(duck, spark):
    from synthea_etl_spark.plans.llm30 import QUERIES

    for name, spec in QUERIES.items():
        got = {tuple(r) for r in spec.fn(spark, SF_DIR).collect()}
        want = {tuple(r) for r in duck.execute(spec.oracle).fetchall()}
        assert got == want, name
