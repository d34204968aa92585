"""AQE skew-join behavior assertions — the runtime half of the
engine's skew story (the planned half, explicit salting, is
operators/util.salted_agg / salted_join, tested in test_extended).

At 100 TB a hot key turns one reducer into the whole job's critical
path. The engine's defense layers: AQE skew-join splitting (runtime,
no code change) where it applies, explicit salting where it doesn't.
These tests pin BOTH halves of that "where it applies" boundary,
measured on this Spark version, so the knowledge survives as an
executable assertion rather than folklore:

- a skewed shuffle join whose output feeds an exchange on a DIFFERENT
  key IS split (``SortMergeJoin(skew=true)``, ``AQEShuffleRead ...
  skewed``);
- the SAME join aggregated on the JOIN key is NOT split — AQE refuses
  because splitting breaks the hash-partition guarantee the downstream
  aggregation relies on. This is exactly the shape where explicit
  salting (util.salted_agg) remains necessary, and why the engine
  ships it.

Skew thresholds are SQL confs (runtime-settable), scaled down here so
a ~400k-row fixture crosses them; the plan shapes are identical at any
scale.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SKEW_CONFS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
}


@pytest.fixture()
def skew_confs(spark):
    saved = {k: spark.conf.get(k) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    yield
    for k, v in saved.items():
        spark.conf.set(k, v)


def _skewed_join(spark):
    """Key 0 owns 300k of 400k rows; dim side is uniform and tiny."""
    hot = spark.range(300_000).select(
        F.lit(0).alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(100_000).select(
        (F.col("id") % 100 + 1).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(101).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return hot.union(cold).join(dim, "k")


def test_aqe_splits_skewed_join_partition(spark, skew_confs):
    """The hot partition is split at runtime: the executed plan carries
    skew markers AND the result is exact (splitting must not duplicate
    or drop the replicated dim rows)."""
    out = _skewed_join(spark).groupBy((F.col("v") % 10).alias("b")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("w").alias("sw")
    )
    rows = {r.b: (r.n, r.sw) for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, plan
    assert "skewed" in plan, plan
    # exactness: 400k rows survive the split join; every bucket holds
    # 30k hot rows (w=0) + 10k cold rows
    assert sum(n for n, _ in rows.values()) == 400_000
    assert len(rows) == 10
    for b, (n, _) in rows.items():
        assert n == 40_000, (b, n)


def test_aqe_skips_split_when_agg_needs_join_partitioning(spark, skew_confs):
    """Negative space: aggregating on the JOIN key right after the join
    suppresses the split (AQE preserves the required distribution).
    This is the documented boundary where explicit salting
    (operators/util.salted_agg) is still the answer at scale."""
    out = _skewed_join(spark).groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    rows = {r.k: r.n for r in out.collect()}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" not in plan, plan
    assert rows[0] == 300_000 and len(rows) == 101
