"""Extended analytics surface beyond the reference inventory: more
source formats, partition-pruned reads, skew-resistant aggregation,
distinct/percentile/rollup/pivot aggregates — the operations a
warehouse user of the reference would reach for next, each with a
DuckDB oracle.

Reference ties: the reference reads CSV only (SURVEY §2.1) and fakes
partition selection with driver-side folder listing (S9,
``Raw_To_Staging.py:143-152``); q44/q45 are the Spark-native versions
(schema'd JSONL source; real partition columns + Catalyst partition
pruning). The rest are beyond-reference but standard warehouse ops.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, dsum, load, sql_dsum

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


# ---------------------------------------------------------------------------
# q44 JSONL source / q45 partition-pruned read
# ---------------------------------------------------------------------------


def q44_jsonl_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines round trip (the interchange format of LLM corpus
    pipelines): write documents metadata as JSONL, read back with an
    EXPLICIT schema — no inference pass, single scan, same contract as
    the reference's schema-registry CSV reads (Raw_To_Staging.py:164-166,
    S8)."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = tempfile.gettempdir() + "/sparkgraft_jsonl_roundtrip"
    d.write.mode("overwrite").json(out)
    return spark.read.schema("doc_id long, lang string, source string").json(out)


ORACLE_Q44 = """
SELECT doc_id, lang, source FROM documents
"""


def q45_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-partition semantics done right (reference S9 lists S3
    folders driver-side and picks max(): Raw_To_Staging.py:143-152):
    write events into a date-partitioned layout, then read WHERE
    event_date = <latest>. The literal predicate prunes at the
    catalog/file-index level — the scan never touches other dates'
    files (PartitionFilters in the plan), exactly how a 100 TB
    date-partitioned lake serves 'today's load'."""
    e = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = tempfile.gettempdir() + "/sparkgraft_part_events"
    e.write.mode("overwrite").partitionBy("event_date").parquet(out)
    part = spark.read.parquet(out)
    latest = part.agg(F.max("event_date")).collect()[0][0]  # tiny scalar
    return part.filter(F.col("event_date") == F.lit(latest)).select(
        "event_id", "user_id", "event_type", "value", "event_date"
    )


ORACLE_Q45 = """
SELECT event_id, user_id, event_type, value, CAST(ts AS DATE) AS event_date
FROM events
WHERE CAST(ts AS DATE) = (SELECT MAX(CAST(ts AS DATE)) FROM events)
"""


# ---------------------------------------------------------------------------
# q46 salted (skew-resistant) aggregation
# ---------------------------------------------------------------------------


def q46_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over the (heavily skewed: 5 keys,
    100k+ rows) event_type column — identical results to a direct
    groupBy, but no single reducer ever owns a whole hot key. See
    operators/util.salted_agg."""
    from synthea_etl_spark.operators.util import salted_agg

    e = load(spark, sf_dir, "events")
    out = salted_agg(
        e,
        keys=["event_type"],
        salt_expr=F.crc32(F.col("event_id").cast("string")),
        n_salt=16,
        sums={"sum_value": F.col("value").cast("decimal(25,6)")},
        count_alias="n_events",
    )
    return out.select(
        "event_type", F.col("sum_value").cast("double").alias("sum_value"), "n_events"
    )


ORACLE_Q46 = f"""
SELECT event_type, {sql_dsum('value', 'sum_value')}, COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q53-q56 distinct / percentile / rollup / pivot aggregates
# ---------------------------------------------------------------------------


def q53_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase under the hood):
    distinct users and event days per event_type. The approximate
    twin (approx_count_distinct / HLL) is tested with tolerance in
    tests/test_extended.py — sketches aren't cross-engine
    hash-comparable."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.to_date("ts")).alias("n_days"),
        F.count(F.lit(1)).alias("n_events"),
    )


ORACLE_Q53 = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
       COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q54_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles of value per event_type
    (F.percentile == SQL percentile_cont semantics; DuckDB
    quantile_cont is the same definition). Rounded to 6 decimals so
    the one interpolation division compares across engines. The
    approximate scale path (percentile_approx / KLL-style sketch,
    mergeable, one pass) is covered with tolerance in
    tests/test_extended.py."""
    e = load(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    return e.groupBy("event_type").agg(
        *[
            F.round(F.element_at(pct, i + 1), 6).alias(a)
            for i, a in enumerate(("p50", "p90", "p99"))
        ]
    )


ORACLE_Q54 = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events GROUP BY event_type
"""


def q55_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: order counts + exact spend by
    (year, priority), (year), and grand total — one pass, Expand-based
    partial aggregation (no re-scan per grouping set)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("int"))
        .rollup("order_year", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), dsum("o_totalprice", "spend"))
    )


ORACLE_Q55 = f"""
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, o_orderpriority,
       COUNT(*) AS n_orders, {sql_dsum('o_totalprice', 'spend')}
FROM orders GROUP BY ROLLUP (order_year, o_orderpriority)
"""


def q56_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type. Pivot
    values are EXPLICIT — at scale, never let pivot() run its own
    distinct-collect job to discover them."""
    e = load(spark, sf_dir, "events")
    piv = (
        e.withColumn("event_date", F.to_date("ts"))
        .groupBy("event_date")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
        .na.fill(0, list(EVENT_TYPES))
    )
    return piv


def _sql_pivot_oracle() -> str:
    cols = ",\n       ".join(
        f"SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST(ts AS DATE) AS event_date,
       {cols}
FROM events GROUP BY 1
"""


def q57_sql_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's Athena/Power BI serving path collapsed to
    spark.sql over catalog views (SURVEY §3 entry point 3, §2.9
    dashboard workload shape): register the table, serve SQL text.
    Same Catalyst plan as the DataFrame twin (q18/q19) — parse +
    analyze resolve against the session catalog."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT c_mktsegment AS segment, count(*) AS cnt
        FROM v_customer
        GROUP BY c_mktsegment
        ORDER BY cnt DESC, segment
        """
    )


ORACLE_Q57 = """
SELECT c_mktsegment AS segment, count(*) AS cnt
FROM customer GROUP BY c_mktsegment
"""


QUERIES: dict[str, QuerySpec] = {
    "q44_jsonl_source": QuerySpec(
        q44_jsonl_source, ORACLE_Q44, "schema'd JSON-lines source round trip", ("source",)
    ),
    "q45_partition_pruned_read": QuerySpec(
        q45_partition_pruned_read, ORACLE_Q45, "latest-partition read via partition pruning", ("source",)
    ),
    "q46_salted_agg": QuerySpec(
        q46_salted_agg, ORACLE_Q46, "skew-resistant salted two-phase aggregation", ("agg", "skew")
    ),
    "q53_distinct_agg": QuerySpec(
        q53_distinct_agg, ORACLE_Q53, "exact multi-distinct aggregation", ("agg",)
    ),
    "q54_percentiles": QuerySpec(
        q54_percentiles, ORACLE_Q54, "exact interpolated percentiles", ("agg",)
    ),
    "q55_rollup": QuerySpec(
        q55_rollup, ORACLE_Q55, "ROLLUP grouping sets", ("agg",)
    ),
    "q56_pivot": QuerySpec(
        q56_pivot, _sql_pivot_oracle(), "pivot with explicit values", ("agg",)
    ),
    "q57_sql_dashboard": QuerySpec(
        q57_sql_dashboard, ORACLE_Q57, "spark.sql serving path over catalog views", ("sql",)
    ),
}
