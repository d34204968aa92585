"""Unit tests for expectations, timeseries gap fill, and incremental
aggregate maintenance (oracle parity is covered by tools/selfcheck;
these pin the semantic corners the oracle can't see)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from synthea_etl_spark.operators.expectations import (
    accepted_values,
    check,
    fk_check,
    in_range,
    not_null,
)
from synthea_etl_spark.operators.incremental import (
    agg_state,
    finalize,
    merge_states,
)
from synthea_etl_spark.operators.timeseries import gap_fill, resample


def test_expectations_single_pass_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (None, "b", 50.0), (2, "zz", None), (3, "a", -1.0)],
        "k int, cat string, x double",
    )
    out = check(
        df,
        [not_null("k"), accepted_values("cat", ["a", "b"]), in_range("x", 0, 10)],
    )
    rows = {r["expectation"]: r for r in out.collect()}
    assert rows["not_null_k"]["violations"] == 1
    assert rows["accepted_values_cat"]["violations"] == 1
    # null x and out-of-range x both violate (3-valued logic pinned)
    assert rows["in_range_x"]["violations"] == 3
    assert all(r["n_checked"] == 4 for r in rows.values())


def test_expectations_quoted_names_and_empty_list(spark):
    """Expectation names flow through as typed literals — a quote in a
    column-derived name must not break the plan — and an empty list
    yields an empty typed frame, not invalid stack(0,) SQL."""
    df = spark.createDataFrame([("x'y",), (None,)], "`it's` string")
    rows = {r["expectation"]: r for r in check(df, [not_null("it's")]).collect()}
    assert rows["not_null_it's"]["violations"] == 1
    empty = check(df, [])
    assert empty.collect() == []
    assert [f.name for f in empty.schema.fields] == [
        "expectation",
        "violations",
        "n_checked",
    ]


def test_fk_check_counts_orphans_ignores_null_keys(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,)], "pk int")
    row = fk_check(child, "fk", parent, "pk").collect()[0]
    assert row["violations"] == 1  # 99 only; NULL key is not an orphan
    assert row["n_checked"] == 4


def test_gap_fill_carries_forward_and_flags(spark):
    daily = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1), 10.0),
            (1, datetime(2024, 1, 4), 40.0),
            (2, datetime(2024, 1, 2), 5.0),
        ],
        "user_id int, day timestamp_ntz, v double",
    )
    out = gap_fill(daily, "user_id", "day", "INTERVAL 1 DAY", ["v"])
    rows = {(r["user_id"], r["day"].day): r for r in out.collect()}
    assert len(rows) == 5  # user1: 1..4 (4 days), user2: 2 (1 day)
    assert rows[(1, 2)]["v"] == 10.0 and not rows[(1, 2)]["was_observed"]
    assert rows[(1, 3)]["v"] == 10.0 and not rows[(1, 3)]["was_observed"]
    assert rows[(1, 4)]["v"] == 40.0 and rows[(1, 4)]["was_observed"]
    assert rows[(2, 2)]["v"] == 5.0 and rows[(2, 2)]["was_observed"]


def test_resample_buckets(spark):
    e = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, 5), 1.0), (1, datetime(2024, 1, 1, 23), 2.0),
         (1, datetime(2024, 1, 2, 1), 4.0)],
        "user_id int, ts timestamp_ntz, value double",
    )
    out = resample(e, "user_id", "ts", "1 day", [F.sum("value").alias("s")])
    got = {r["bucket"].day: r["s"] for r in out.collect()}
    assert got == {1: 3.0, 2: 4.0}


def test_incremental_merge_equals_recompute(spark):
    full = spark.createDataFrame(
        [("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", -3.0), ("b", 0.25)],
        "k string, v double",
    )
    h1, h2 = full.filter("v >= 0"), full.filter("v < 0")
    merged = finalize(merge_states(agg_state(h1, ["k"], "v"),
                                   agg_state(h2, ["k"], "v")))
    direct = finalize(agg_state(full, ["k"], "v"))
    assert sorted(merged.collect()) == sorted(direct.collect())


def test_incremental_merge_handles_new_keys(spark):
    old = spark.createDataFrame([("a", 1.0)], "k string, v double")
    new = spark.createDataFrame([("b", 2.0)], "k string, v double")
    out = finalize(merge_states(agg_state(old, ["k"], "v"),
                                agg_state(new, ["k"], "v")))
    got = {r["k"]: (r["count"], r["sum"]) for r in out.collect()}
    assert got == {"a": (1, 1.0), "b": (1, 2.0)}


def test_heavy_hitters_exact_vs_groupby(spark):
    from synthea_etl_spark.operators.frequency import heavy_hitters

    # skewed: key 0 -> 400 rows, key 1 -> 120, keys 2..201 -> 4 each
    rows = [(0,)] * 400 + [(1,)] * 120 + [(k,) for k in range(2, 202) for _ in range(4)]
    df = spark.createDataFrame(rows, "user_id long").repartition(8)
    n = len(rows)
    thr = 100
    k = 64  # threshold > N/k (1320/64 ~ 21) -> exactness guaranteed
    assert thr > n / k
    got = {(r["user_id"], r["cnt"]) for r in
           heavy_hitters(df, "user_id", threshold=thr, k=k).collect()}
    exact = {(r["user_id"], r["cnt"]) for r in
             df.groupBy("user_id").count().withColumnRenamed("count", "cnt")
               .filter(F.col("cnt") >= thr).collect()}
    assert got == exact == {(0, 400), (1, 120)}


def test_mg_merge_bounds_state(spark):
    from synthea_etl_spark.operators.frequency import _mg_merge

    counters = {}
    for batch in ({"a": 50, "b": 3}, {"c": 2, "d": 2, "a": 10}, {"e": 9}):
        counters = _mg_merge(counters, batch, k=2)
        assert len(counters) <= 2
    assert "a" in counters  # dominant key survives every merge


def test_pagerank_toy_graph(spark):
    from synthea_etl_spark.operators.graph import pagerank

    # star: everyone links to hub 'a'; 'a' links back to 'b' only
    edges = spark.createDataFrame(
        [("b", "a", 1), ("c", "a", 1), ("d", "a", 1), ("a", "b", 1)],
        "src string, dst string, weight long",
    )
    ranks = {r["node"]: r["rank"] for r in
             pagerank(edges, iterations=10, checkpoint_every=3).collect()}
    assert set(ranks) == {"a", "b", "c", "d"}
    # the a<->b cycle oscillates at finite iterations, so only the
    # stable facts are asserted: both cycle nodes dominate the leaves
    assert min(ranks["a"], ranks["b"]) > ranks["c"]
    assert abs(ranks["c"] - ranks["d"]) < 1e-12  # symmetric leaves
    assert abs(sum(ranks.values()) - 1.0) < 1e-6  # no dangling nodes
