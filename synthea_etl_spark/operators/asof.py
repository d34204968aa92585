"""As-of and range joins — operators Spark's DataFrame API lacks,
composed from built-ins (no custom Catalyst rule, no Python on the
data path).

**As-of join** (``asof_join``): for each left row, the single latest
right row with ``right_ts <= left_ts`` within the same key. The naive
form — inequality join + per-left-row max — is a quadratic blowup per
key. This implementation uses the union trick instead: tag both
sides, union them, sort within key by (ts, tag), and carry the last
seen right-side values forward with ``last(..., ignorenulls=True)``
over an unbounded-preceding window. Cost: ONE shuffle (hash by key) +
one per-key sort — the same price as a self-window query, independent
of how many right rows precede each left row.

**Range join** (``range_join_bucketed``): join left rows to right
intervals containing them (``lo <= v <= hi``). A plain conditional
join degenerates to per-key cross products; bucketing the value domain
turns it into an equi-join on (key, bucket): each interval is exploded
to the buckets it overlaps, each probe row to its one bucket, then the
exact BETWEEN predicate filters within buckets. Bucket width trades
replication factor (intervals spanning many buckets) against bucket
fan-in; pick ~= median interval width.

At 100 TB both operators are shuffle-bounded on the join key — no
broadcast or driver materialization of either side is ever needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Backward as-of join: left enriched with the latest preceding
    right row's ``value_cols`` (null when none). Ties on the same
    timestamp take the right row (tag order: right sorts before left
    at equal ts, matching DuckDB ASOF's >= semantics).

    ``tolerance_seconds`` drops matches older than the window (like
    pandas merge_asof tolerance)."""
    lcols = [c for c in left.columns]
    l = left.withColumn("_tag", F.lit(1)).withColumn("_ts", F.col(left_ts))
    r = right.select(
        *key_cols,
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).withColumn("_tag", F.lit(0)).withColumn("_ts", F.col("_rts"))

    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_c_{c}")
            for c in value_cols
        ],
        F.last("_rts", ignorenulls=True).over(w).alias("_c_ts"),
    )
    out = carried.filter(F.col("_tag") == 1)
    if tolerance_seconds is not None:
        stale = (
            F.col("_ts").cast("timestamp").cast("long")
            - F.col("_c_ts").cast("timestamp").cast("long")
        ) > tolerance_seconds
        out = out.select(
            *lcols,
            *[
                F.when(stale, F.lit(None)).otherwise(F.col(f"_c_{c}")).alias(c)
                for c in value_cols
            ],
        )
    else:
        out = out.select(*lcols, *[F.col(f"_c_{c}").alias(c) for c in value_cols])
    return out


def range_join_bucketed(
    probes: DataFrame,
    intervals: DataFrame,
    key_cols: list[str],
    probe_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner range join: probe rows x intervals with
    ``lo <= probe <= hi`` (same key), via bucketing. Returns all
    probe columns + all interval columns (name-collision-free inputs
    expected). ``bucket_width`` is in the probe column's integer
    domain (cast timestamps to epoch first)."""
    def as_long(df, colname):
        c = F.col(colname)
        if "timestamp" in dict(df.dtypes)[colname]:
            c = c.cast("timestamp")  # ntz -> tz first; direct long cast fails
        return c.cast("long")

    p = probes.withColumn(
        "_b", F.floor(as_long(probes, probe_col) / bucket_width)
    )
    i = intervals.withColumn(
        "_bs",
        F.sequence(
            F.floor(as_long(intervals, lo_col) / bucket_width),
            F.floor(as_long(intervals, hi_col) / bucket_width),
        ),
    ).withColumn("_b", F.explode("_bs")).drop("_bs")
    joined = p.join(i, on=[*key_cols, "_b"], how="inner").filter(
        (F.col(probe_col) >= F.col(lo_col)) & (F.col(probe_col) <= F.col(hi_col))
    )
    return joined.drop("_b")
