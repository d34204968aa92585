"""Extended-surface tests: approximate aggregate twins (sketches are
not cross-engine comparable, so the oracle covers the exact form and
these cover the approximations with tolerance) and plan-shape
assertions for partition pruning and salting."""

from __future__ import annotations

from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import load
from synthea_etl_spark.plans.extended import (
    q45_partition_pruned_read,
    q46_salted_agg,
    q53_distinct_agg,
    q54_percentiles,
)
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_count_distinct_within_tolerance(spark):
    """HLL++ (rsd=2%) must land within 5% of the exact distinct count
    — the mergeable one-pass scale path for q53."""
    e = load(spark, SF_DIR, "events")
    exact = {
        r.event_type: r.n_users for r in q53_distinct_agg(spark, SF_DIR).collect()
    }
    approx = {
        r.event_type: r.au
        for r in e.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=0.02).alias("au"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(approx[t] - n) / n < 0.05, (t, approx[t], n)


def test_percentile_approx_within_tolerance(spark):
    """percentile_approx (accuracy=10000) must land within 2% relative
    of the exact interpolated percentile — the one-pass mergeable
    scale path for q54."""
    e = load(spark, SF_DIR, "events")
    exact = {r.event_type: r.p90 for r in q54_percentiles(spark, SF_DIR).collect()}
    approx = {
        r.event_type: r.ap
        for r in e.groupBy("event_type")
        .agg(F.percentile_approx("value", 0.9, 10000).alias("ap"))
        .collect()
    }
    for t, v in exact.items():
        assert abs(approx[t] - v) <= max(abs(v) * 0.02, 1e-6), (t, approx[t], v)


def test_partition_pruning_reaches_scan(spark):
    """q45's latest-date predicate must prune at the file-index level:
    the scan's PartitionFilters carry the date equality, and no
    post-scan Filter node re-checks it."""
    df = q45_partition_pruned_read(spark, SF_DIR)
    plan = _plan(df)
    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert "event_date" in plan[start : start + 200]


def test_salted_agg_no_single_key_reducer(spark):
    """The first (wide) aggregation of the salted plan must group by
    (key, salt) — visible as two HashAggregate pairs in the plan."""
    df = q46_salted_agg(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("HashAggregate") >= 4  # partial+final, both phases
    assert "_salt" in plan
