"""Stream-shaped analytics, batch-expressed with DuckDB oracles.

The reference has no Spark streaming (its micro-batching lives in
Lambda; SURVEY §2.8) — these queries cover the stream-analytics surface
a Spark-native engine adds: event-time tumbling rollups and
gap-based sessionization. Their streaming twins (readStream +
watermark, tested in tests/test_streaming.py) reuse the same transform
functions, so the oracle here certifies the streaming logic too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, load


def q50_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour rollup per event_type (count + exact value sum).
    Same function the AvailableNow streaming path runs."""
    from synthea_etl_spark.streaming.ingest import hourly_rollup

    return hourly_rollup(load(spark, sf_dir, "events"))


ORACLE_Q50 = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
FROM events GROUP BY 1, 2
"""


def q51_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity gap) per user via
    lag + running sum — the batch twin of a session-window streaming
    agg. One shuffle on user_id; both window functions share the same
    partitioning so Catalyst plans a single exchange."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # EXACT microsecond epochs (ntz->timestamp under the pinned-UTC
    # session, then unix_micros): a cast to long would truncate
    # sub-second precision and silently disagree with any engine that
    # keeps it whenever a gap falls inside (1800, 1801) seconds.
    epoch = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = epoch - F.lag(epoch).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1_800_000_000), 1).otherwise(0)
    sess = e.select(
        "user_id",
        "ts",
        "event_id",
        F.sum(new_sess).over(w).alias("session_no"),
    )
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


ORACLE_Q51 = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM g
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end
FROM s GROUP BY user_id, session_no
"""


def q52_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window sessionization (30-min gap): Spark's
    native session assignment, state-managed by Catalyst in streaming.
    Window semantics differ from q51's lag-based split on the exact
    boundary: session_window starts a NEW session when the gap is >=
    30 min (window [t, t+gap) half-open), and session_end is
    last_event + gap. The oracle mirrors that exactly."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"),
            F.col("user_id"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


ORACLE_Q52 = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS session_no
  FROM g
)
SELECT user_id, MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events
FROM s GROUP BY user_id, session_no
"""


QUERIES: dict[str, QuerySpec] = {
    "q50_events_hourly": QuerySpec(
        q50_events_hourly, ORACLE_Q50, "tumbling hourly rollup (stream twin)", ("stream",)
    ),
    "q51_sessionize": QuerySpec(
        q51_sessionize, ORACLE_Q51, "gap-based sessionization", ("stream", "window")
    ),
    "q52_session_window": QuerySpec(
        q52_session_window, ORACLE_Q52, "built-in session_window rollup", ("stream", "window")
    ),
}
