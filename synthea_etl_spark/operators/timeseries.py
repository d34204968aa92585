"""Time-series resampling and gap filling on plain DataFrames.

The reference has no time-series operators (SURVEY.md §1.1: "No
streams ... time-series structures"); these are the batch twins of the
streaming rollups (plans/streaming_batch) that any events table needs:
regularize an irregular event stream onto a fixed grid, then carry
values across empty buckets so downstream windows see a dense series.

At 100 TB the shape matters: resample is one groupBy (map-side partial
aggs); gap_fill generates each key's missing buckets WITH the key's
data (per-key min/max from the same aggregation, ``sequence`` +
``explode`` executor-side — never a driver-side calendar loop or a
cross join against a global calendar, which would produce |keys| x
|buckets| rows before filtering), and the forward fill is one window
per key ordered by bucket — the sort is within each key's partition,
no global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    key: str,
    ts: str,
    step: str,
    aggs: list[Column],
) -> DataFrame:
    """Aggregate an irregular series onto a fixed grid: one row per
    (key, bucket) where bucket = window start of ``step`` (e.g.
    '1 day'). Empty buckets are absent — see gap_fill."""
    return (
        df.groupBy(F.col(key), F.window(F.col(ts), step).start.alias("bucket"))
        .agg(*aggs)
    )


def gap_fill(
    df: DataFrame,
    key: str,
    bucket: str,
    step_expr: str,
    fill_cols: list[str],
) -> DataFrame:
    """Densify a resampled frame: emit every ``step_expr`` bucket
    between each key's first and last observation, forward-filling
    ``fill_cols`` from the most recent observed bucket.

    Adds ``was_observed`` so consumers can distinguish carried values.
    The bucket domain comes from a per-key aggregate joined back on the
    key (both sides shuffle on the key once — or broadcast when the
    key-count is dim-sized); the carry is ``last(col, ignorenulls)``
    over (key ORDER BY bucket), Spark's IGNORE NULLS window form."""
    marked = df.withColumn("_obs", F.lit(True))
    domain = (
        df.groupBy(key)
        .agg(F.min(bucket).alias("_lo"), F.max(bucket).alias("_hi"))
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(step_expr))
            ).alias(bucket),
        )
    )
    joined = domain.join(marked, on=[key, bucket], how="left")
    w = (
        Window.partitionBy(key)
        .orderBy(bucket)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = joined.select(
        key,
        bucket,
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in fill_cols],
        F.coalesce(F.col("_obs"), F.lit(False)).alias("was_observed"),
    )
    return filled
