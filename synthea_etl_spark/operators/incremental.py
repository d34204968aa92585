"""Incremental aggregate maintenance (materialized rollup upkeep).

A 100 TB pipeline never re-aggregates history to refresh a rollup: it
keeps a STATE table of mergeable partial aggregates per key and folds
each new load's delta in. This module implements that contract for the
classic mergeable set (count, sum, min, max — avg derives at
finalize): state ⊎ delta is a unionByName + one re-aggregation over
|keys| + |delta keys| rows, independent of history size. The same
algebra underlies Spark's own partial aggregation (map-side combine)
and every streaming agg state store — here it's exposed as a batch
operator over a plain table, the piece the reference's
recompute-everything datamart job lacks (``Patient_datamart.py``
rereads the full staging table every run).

Sums are kept in DECIMAL(25,6): state merges must be exact, or the
maintained rollup drifts from a from-scratch recompute (the oracle
twins assert exactly this equality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import DEC


def agg_state(df: DataFrame, keys: list[str], value: Column | str) -> DataFrame:
    """Build the mergeable partial-aggregate state for one value column:
    (keys, cnt, sum_dec, min_v, max_v)."""
    v = F.col(value) if isinstance(value, str) else value
    return df.groupBy(*keys).agg(
        F.count(v).alias("cnt"),
        F.sum(v.cast(DEC)).alias("sum_dec"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(state: DataFrame, delta: DataFrame) -> DataFrame:
    """Fold a delta state into an existing state. Both inputs carry the
    same schema; the merge is the same combine Spark applies between
    partial aggregates, so (state ⊎ delta) == agg_state(full data)
    exactly."""
    keys = [c for c in state.columns if c not in ("cnt", "sum_dec", "min_v", "max_v")]
    return (
        state.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum_dec").alias("sum_dec"),
            F.min("min_v").alias("min_v"),
            F.max("max_v").alias("max_v"),
        )
    )


def finalize(state: DataFrame, prefix: str = "") -> DataFrame:
    """Derive the user-facing aggregates from state: count, exact sum
    (double), avg (exact sum / count), min, max."""
    keys = [c for c in state.columns if c not in ("cnt", "sum_dec", "min_v", "max_v")]
    return state.select(
        *keys,
        F.col("cnt").alias(f"{prefix}count"),
        F.col("sum_dec").cast("double").alias(f"{prefix}sum"),
        (F.col("sum_dec").cast("double") / F.col("cnt").cast("double")).alias(
            f"{prefix}avg"
        ),
        F.col("min_v").alias(f"{prefix}min"),
        F.col("max_v").alias(f"{prefix}max"),
    )
