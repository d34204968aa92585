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
    event_date = <latest>. The predicate prunes at the
    catalog/file-index level — the scan never touches other dates'
    files (PartitionFilters in the plan), exactly how a 100 TB
    date-partitioned lake serves 'today's load'.

    Fully declarative (round 5): the JOIN form of the latest-date
    lookup defeats dynamic partition pruning (aggregate-only build
    side -> ``PartitionFilters: [isnotnull(event_date)]``, full scan;
    measured round 4), but a non-correlated SCALAR SUBQUERY lands
    directly in the scan's PartitionFilters and Spark evaluates it
    before file listing: measured 8/80 files = 1/10 date partitions
    read on a 10-date layout, identical to a literal predicate
    (test_extended.py::test_partition_pruning_reaches_scan asserts the
    runtime numFiles metric). One SQL statement, no driver round-trip;
    the max() subquery itself reads only the partition column
    (``ReadSchema: struct<>`` — values come from the file index, not
    the data files)."""
    e = load(spark, sf_dir, "events").withColumn("event_date", F.to_date("ts"))
    out = tempfile.gettempdir() + "/sparkgraft_part_events"
    e.write.mode("overwrite").partitionBy("event_date").parquet(out)
    return spark.sql(
        f"""
        SELECT event_id, user_id, event_type, value, event_date
        FROM parquet.`{out}`
        WHERE event_date = (SELECT MAX(event_date) FROM parquet.`{out}`)
        """
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
    (year, priority), (year), and grand total — one scan, all levels.

    Shaped for scale (round 4): a naive ``rollup()`` over the raw scan
    Expands every input row 3x AND accumulates Decimal per row (both
    measured costs). Instead phase 1 groups by (year, priority,
    partition) summing exact integer micro-units in whole-stage
    codegen — no Expand, no Decimal on the wide path; the rollup runs
    over the tiny partial set only (COUNT/SUM are decomposable, so
    rollup(partials) == rollup(raw); micro-long sums equal dsum exactly
    on <=6-dp money, see common.exact_agg/msum_bounded)."""
    o = load(spark, sf_dir, "orders")
    x = F.col("o_totalprice") * 1_000_000
    micro = (
        F.when(x >= 0, F.floor(x + F.lit(0.5)))
        .otherwise(-F.floor(-x + F.lit(0.5)))
        .cast("long")
    )
    partial = (
        o.select(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "o_orderpriority",
            F.spark_partition_id().alias("_pid"),
            micro.alias("_m"),
        )
        .groupBy("order_year", "o_orderpriority", "_pid")
        .agg(F.sum("_m").alias("_m"), F.count(F.lit(1)).alias("_n"))
    )
    return (
        partial.rollup("order_year", "o_orderpriority")
        .agg(
            F.sum("_n").alias("n_orders"),
            F.sum(F.col("_m").cast("decimal(38,0)")).alias("_ms"),
        )
        .select(
            "order_year",
            "o_orderpriority",
            "n_orders",
            (F.col("_ms").cast("double") / 1_000_000).alias("spend"),
        )
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
        f"CAST(SUM(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS {t}"
        for t in EVENT_TYPES
    )
    return f"""
SELECT CAST(ts AS DATE) AS event_date,
       {cols}
FROM events GROUP BY 1
"""


def q58_regr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear regression (value vs. event day) from exact
    decimal moments: n, Σx, Σy, Σxx, Σxy, Σyy accumulate exactly
    (partial-agg friendly, one pass), and slope/intercept/corr derive
    from them in double. The built-in regr_slope/corr accumulate in
    floating point — partial-aggregation-order-dependent, hence
    unreproducible at scale; the moment form is the deterministic
    equivalent (same trick as plans/common.dsum)."""
    e = load(spark, sf_dir, "events")
    # Exact MICROsecond epochs (cast-to-long would truncate fractional
    # seconds that DuckDB's epoch() keeps — sub-second drift shifts
    # every moment). x is micro-days = micros/86400: one IEEE division
    # of identical integers -> identical doubles on both engines.
    day0 = F.unix_micros(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    micros = F.unix_micros(F.col("ts").cast("timestamp")) - day0
    # micro-unit integers: every product below is exact 64-bit integer
    # arithmetic (no decimal-multiplication semantics to diverge on);
    # per-row products fit long, sums go through decimal(38,0).
    # Centering near the data means (15 days, value~50) conditions the
    # covariance formula: without it, n*Sxy - Sx*Sy cancels 10+ leading
    # digits and the engines' last-ulp differences (FMA contraction)
    # surface in the 6th decimal of the slope.
    xi = F.round(micros / F.lit(86400.0)).cast("long") - F.lit(15_000_000)
    yi = F.round(F.col("value") * 1e6).cast("long") - F.lit(50_000_000)
    d = e.select("event_type", xi.alias("xi"), yi.alias("yi"))
    big = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(big(F.col("xi"))).cast("double").alias("sx"),
        F.sum(big(F.col("yi"))).cast("double").alias("sy"),
        F.sum(big(F.col("xi") * F.col("xi"))).cast("double").alias("sxx"),
        F.sum(big(F.col("xi") * F.col("yi"))).cast("double").alias("sxy"),
        F.sum(big(F.col("yi") * F.col("yi"))).cast("double").alias("syy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx  # micro-unit scales cancel; shift-invariant
    mean_x = F.col("sx") / F.col("n") + 15_000_000.0  # de-centered micro
    mean_y = F.col("sy") / F.col("n") + 50_000_000.0
    return m.select(
        "event_type",
        F.round(slope, 6).alias("slope"),
        F.round((mean_y - slope * mean_x) / 1e6, 6).alias("intercept"),
        F.round(cov / F.sqrt(varx * vary), 6).alias("corr"),
    )


ORACLE_Q58 = """
WITH d AS (
  SELECT event_type,
         CAST(round((epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01')) / 86400.0) AS BIGINT) - 15000000 AS xi,
         CAST(round(value * 1e6) AS BIGINT) - 50000000 AS yi
  FROM events
),
m AS (
  SELECT event_type,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(xi AS DECIMAL(38,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(yi AS DECIMAL(38,0))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(xi * xi AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(xi * yi AS DECIMAL(38,0))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(yi * yi AS DECIMAL(38,0))) AS DOUBLE) AS syy
  FROM d GROUP BY event_type
)
SELECT event_type,
       round((n*sxy - sx*sy) / (n*sxx - sx*sx), 6) AS slope,
       round(((sy / n + 50000000.0)
              - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * (sx / n + 15000000.0))
             / 1e6, 6) AS intercept,
       round((n*sxy - sx*sy) / sqrt((n*sxx - sx*sx) * (n*syy - sy*sy)), 6) AS corr
FROM m
"""


# ---------------------------------------------------------------------------
# q59 as-of join / q60 bucketed range join
# ---------------------------------------------------------------------------


def q59_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join (an operator Spark's API lacks; composed
    from union + windowed last-ignorenulls, one shuffle — see
    operators/asof.py): each purchase event enriched with the user's
    latest view event at-or-before it. (user_id, ts) pairs are unique
    per event type in TESTDATA, so the latest-preceding row is
    well-defined."""
    from synthea_etl_spark.operators.asof import asof_join

    e = load(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("ts").alias("vts"),
        F.col("ts").alias("view_ts"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        purchases, views, ["user_id"], "ts", "vts", ["view_ts", "view_value"]
    )


ORACLE_Q59 = """
SELECT l.event_id, l.user_id, l.ts, l.value,
       r.ts AS view_ts, r.value AS view_value
FROM (SELECT * FROM events WHERE event_type = 'purchase') l
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def q60_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join (operators/asof.range_join_bucketed): map
    every event to the gap-session interval containing it — an
    equi-join on (key, time-bucket) with interval explosion, never a
    per-key cross product. Gap sessions can't overlap, so each event
    lands in exactly one interval."""
    from synthea_etl_spark.operators.asof import range_join_bucketed
    from synthea_etl_spark.plans.streaming_batch import q51_sessionize

    e = load(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    sessions = q51_sessionize(spark, sf_dir).select(
        "user_id", "session_no", "session_start", "session_end"
    )
    out = range_join_bucketed(
        e,
        sessions,
        ["user_id"],
        "ts",
        "session_start",
        "session_end",
        bucket_width=3600,
    )
    return out.select("event_id", "user_id", "session_no")


ORACLE_Q60 = """
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
),
sess AS (
  SELECT user_id, session_no, MIN(ts) AS session_start, MAX(ts) AS session_end
  FROM s GROUP BY user_id, session_no
)
SELECT e.event_id, e.user_id, sess.session_no
FROM events e
JOIN sess ON e.user_id = sess.user_id
         AND e.ts BETWEEN sess.session_start AND sess.session_end
"""


def q66_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on the lake (a column added mid-history):
    older files lack `source`; ``mergeSchema`` unions the file schemas
    and null-fills the missing column — no rewrite of old data. At
    100 TB, schema-merge happens over footers only."""
    d = load(spark, sf_dir, "documents")
    out = tempfile.gettempdir() + "/sparkgraft_schema_evo"
    old = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    new = d.filter(F.col("doc_id") % 2 == 1).select("doc_id", "lang", "source")
    old.write.mode("overwrite").parquet(out + "/v1")
    new.write.mode("overwrite").parquet(out + "/v2")
    return (
        spark.read.option("mergeSchema", True)
        .option("recursiveFileLookup", True)
        .parquet(out)
    )


ORACLE_Q66 = """
SELECT doc_id, lang,
       CASE WHEN doc_id % 2 = 1 THEN source ELSE NULL END AS source
FROM documents
"""


def q67_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join with unmatched rows on BOTH sides (customers
    without order stats, order stats without selected customers) —
    the only outer-join flavor the §2 inventory lacked."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 3 != 0).select(
        "c_custkey", "c_name"
    )
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") % 3 != 1)
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, on="c_custkey", how="full_outer").select(
        "c_custkey", "c_name", "n_orders"
    )


ORACLE_Q67 = """
WITH c AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 3 <> 0),
o AS (SELECT o_custkey AS c_custkey, COUNT(*) AS n_orders
      FROM orders WHERE o_custkey % 3 <> 1 GROUP BY 1)
SELECT COALESCE(c.c_custkey, o.c_custkey) AS c_custkey, c_name, n_orders
FROM c FULL OUTER JOIN o ON c.c_custkey = o.c_custkey
"""


def q68_window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function breadth over one (partition, total order):
    lag/lead, 3-row moving exact sum, dense rank by value, quartile
    bucket, running count. All share the user_id partitioning — one
    exchange serves every window."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wv = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    mov = w.rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(mov)
        .cast("double")
        .alias("moving_sum3"),
        F.dense_rank().over(wv).alias("value_rank"),
        F.ntile(4).over(w).alias("quartile"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


ORACLE_Q68 = """
SELECT event_id, user_id,
       lag(value) OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER
            (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
       CAST(dense_rank() OVER (PARTITION BY user_id
            ORDER BY value DESC, event_id) AS INTEGER) AS value_rank,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS UNBOUNDED PRECEDING) AS running_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


def q83_time_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-count-based): each
    event's trailing-1-hour exact event count and decimal value sum
    for its user. rangeBetween needs a numeric ordering column ->
    exact microsecond epoch; the frame is then [-1h, now] in micros.
    Complements q68's ROWS frames."""
    from pyspark.sql import Window

    e = load(spark, sf_dir, "events")
    epoch_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(epoch_us)
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum(F.col("value").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("sum_trailing_1h"),
    )


ORACLE_Q83 = """
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_trailing_1h,
       CAST(SUM(CAST(value AS DECIMAL(25,6))) OVER w AS DOUBLE) AS sum_trailing_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def q70_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy matching (entity-resolution staple): part-name
    pairs within a brand block with Levenshtein distance <= 2. The
    block key bounds the pair space (never an all-pairs cross join);
    at scale the block is an LSH bucket or sorted-neighborhood key."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_name")
    a, b = p.alias("a"), p.alias("b")
    return (
        a.join(
            b,
            (F.col("a.p_brand") == F.col("b.p_brand"))
            & (F.col("a.p_partkey") < F.col("b.p_partkey")),
        )
        .select(
            F.col("a.p_partkey").alias("key_a"),
            F.col("b.p_partkey").alias("key_b"),
            F.levenshtein(F.col("a.p_name"), F.col("b.p_name")).alias("dist"),
        )
        .filter(F.col("dist") <= 2)
    )


ORACLE_Q70 = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
"""


def q78_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant source (the dirty-data story at the source
    level, complementing the reference's CSV repair): JSONL where
    every doc_id%10==0 line is deterministically mangled, read in
    PERMISSIVE mode with a ``_corrupt_record`` column — bad lines
    quarantine instead of failing the job. Output: good/corrupt
    accounting per language (corrupt rows have no lang -> bucketed
    as '_corrupt')."""
    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    out = tempfile.gettempdir() + "/sparkgraft_corrupt_jsonl"
    line = F.to_json(F.struct("doc_id", "lang"))
    mangled = F.when(
        F.col("doc_id") % 10 == 0, F.concat(F.lit("{BROKEN"), line)
    ).otherwise(line)
    d.select(mangled.alias("value")).write.mode("overwrite").text(out)
    parsed = spark.read.schema(
        "doc_id long, lang string, _corrupt_record string"
    ).json(out)
    return (
        parsed.withColumn(
            "bucket",
            F.when(F.col("_corrupt_record").isNotNull(), F.lit("_corrupt")).otherwise(
                F.col("lang")
            ),
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_Q78 = """
SELECT CASE WHEN doc_id % 10 = 0 THEN '_corrupt' ELSE lang END AS bucket,
       COUNT(*) AS n
FROM documents GROUP BY 1
"""


def q73_group_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-group aggregation via applyInPandas (the
    group-map Arrow path — SURVEY §2.8's missing UDAF surface): exact
    per-user median of value. numpy's interpolated median equals
    SQL percentile_cont/quantile_cont semantics, so even the UDF path
    sits under the DuckDB oracle gate. At scale this is one shuffle on
    the group key; each group materializes as one Arrow batch (fine
    for per-user rows; for giant groups use the two-phase builtin
    instead)."""
    import pandas as pd

    e = load(spark, sf_dir, "events").select("user_id", "value")

    def median(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_value": [round(float(np.median(pdf["value"])), 6)],
                "n": [len(pdf)],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        median, "user_id long, median_value double, n long"
    )


ORACLE_Q73 = """
SELECT user_id, round(quantile_cont(value, 0.5), 6) AS median_value,
       COUNT(*) AS n
FROM events GROUP BY user_id
"""


def q74_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler (data-quality observability): one pass
    computing per-column null count, exact distinct count, min/max
    (as strings) for every customer column — the stats layer a lake
    catalog publishes. Single wide aggregate, then unpivoted
    driver-side expression list (no per-column jobs — contrast the
    reference's per-column count() anti-pattern,
    Raw_To_Staging.py:118)."""
    c = load(spark, sf_dir, "customer")
    aggs = []
    for col in c.columns:
        aggs += [
            F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)).alias(f"{col}__nulls"),
            F.countDistinct(col).alias(f"{col}__distinct"),
            F.min(F.col(col).cast("string")).alias(f"{col}__min"),
            F.max(F.col(col).cast("string")).alias(f"{col}__max"),
        ]
    wide = c.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"),
                F.col(f"{col}__nulls").cast("long").alias("n_nulls"),
                F.col(f"{col}__distinct").cast("long").alias("n_distinct"),
                F.col(f"{col}__min").alias("min_str"),
                F.col(f"{col}__max").alias("max_str"),
            )
            for col in c.columns
        ]
    )
    return wide.select(F.explode(rows).alias("r")).select("r.*")


def _sql_profile_oracle() -> str:
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
    parts = [
        f"""SELECT '{c}' AS column,
            CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
            MIN(CAST({c} AS VARCHAR)) AS min_str,
            MAX(CAST({c} AS VARCHAR)) AS max_str
     FROM customer"""
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)


def q75_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling (train/eval split staple):
    exactly 20 customers per market segment, chosen by md5(id) order —
    a reproducible pseudo-random draw with no RNG state, identical on
    any engine/cluster/partitioning. One shuffle (the window
    partition)."""
    from pyspark.sql import Window

    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.asc("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
        .select("c_custkey", "c_mktsegment", F.col("rn").cast("int").alias("rn"))
    )


ORACLE_Q75 = """
SELECT c_custkey, c_mktsegment, CAST(rn AS INTEGER) AS rn FROM (
  SELECT c_custkey, c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
  FROM customer
) WHERE rn <= 20
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
    "q58_regr_stats": QuerySpec(
        q58_regr_stats, ORACLE_Q58, "deterministic regression/corr from decimal moments", ("agg",)
    ),
    "q59_asof_join": QuerySpec(
        q59_asof_join, ORACLE_Q59, "backward as-of join via union + windowed carry", ("join",)
    ),
    "q60_range_join": QuerySpec(
        q60_range_join, ORACLE_Q60, "bucketed interval/range join", ("join",)
    ),
    "q66_schema_evolution": QuerySpec(
        q66_schema_evolution, ORACLE_Q66, "mergeSchema read across schema versions", ("source",)
    ),
    "q67_full_outer": QuerySpec(
        q67_full_outer, ORACLE_Q67, "full outer join, unmatched both sides", ("join",)
    ),
    "q68_window_suite": QuerySpec(
        q68_window_suite, ORACLE_Q68, "lag/lead/moving-sum/rank/ntile windows", ("window",)
    ),
    "q70_fuzzy_pairs": QuerySpec(
        q70_fuzzy_pairs, ORACLE_Q70, "blocked Levenshtein fuzzy matching", ("join", "text")
    ),
    "q83_time_range_window": QuerySpec(
        q83_time_range_window, ORACLE_Q83, "trailing-1h RANGE-frame window", ("window",)
    ),
    "q78_corrupt_records": QuerySpec(
        q78_corrupt_records, ORACLE_Q78, "PERMISSIVE corrupt-record quarantine", ("source", "quality")
    ),
    "q73_group_median_pandas": QuerySpec(
        q73_group_median_pandas, ORACLE_Q73, "applyInPandas group aggregation (exact median)", ("udf", "agg")
    ),
    "q74_profile_table": QuerySpec(
        q74_profile_table, _sql_profile_oracle(), "one-pass column profiler", ("agg", "quality")
    ),
    "q75_stratified_sample": QuerySpec(
        q75_stratified_sample, ORACLE_Q75, "deterministic stratified sample", ("sample",)
    ),
}
