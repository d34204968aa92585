"""Extended surface, third batch: declarative data-quality
expectations, time-series resample + gap fill, incremental aggregate
maintenance, ORC source round trip, and VARIANT semi-structured
extraction — capabilities a lakehouse ETL engine needs that the
reference only documents as manual practice (xlsx Problem/Handling
columns, recompute-everything datamart) or lacks entirely.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import (
    QuerySpec,
    dsum,
    load,
    sql_dsum,
)


# ---------------------------------------------------------------------------
# q111 — data-quality expectations (one-pass constraint suite + FK)
# ---------------------------------------------------------------------------


def q111_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative expectations over orders: three row-level constraints
    evaluated in ONE aggregate pass (conditional sums — never the
    reference's count()-per-probe, Raw_To_Staging.py:118) plus a
    referential-integrity check as a broadcast left-anti join. Output:
    one row per expectation with its violation count."""
    from synthea_etl_spark.operators.expectations import (
        accepted_values,
        check,
        fk_check,
        in_range,
        not_null,
    )

    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    row_checks = check(
        o,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ["F", "P", "O"]),
            in_range("o_totalprice", 0, 100000),
        ],
    )
    fk = fk_check(o, "o_custkey", c, "c_custkey")
    return row_checks.unionByName(fk).orderBy("expectation")


ORACLE_Q111 = """
SELECT * FROM (
  SELECT 'not_null_o_custkey' AS expectation,
         CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS violations,
         COUNT(*) AS n_checked
  FROM orders
  UNION ALL
  SELECT 'accepted_values_o_orderstatus',
         CAST(SUM(CASE WHEN o_orderstatus IS NULL
                        OR o_orderstatus NOT IN ('F', 'P', 'O')
                       THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
  UNION ALL
  SELECT 'in_range_o_totalprice',
         CAST(SUM(CASE WHEN o_totalprice IS NULL
                        OR o_totalprice NOT BETWEEN 0 AND 100000
                       THEN 1 ELSE 0 END) AS BIGINT),
         COUNT(*)
  FROM orders
  UNION ALL
  SELECT 'fk_o_custkey_references_c_custkey',
         (SELECT COUNT(*) FROM orders
          WHERE o_custkey IS NOT NULL
            AND o_custkey NOT IN (SELECT c_custkey FROM customer)),
         COUNT(*)
  FROM orders
)
ORDER BY expectation
"""


# ---------------------------------------------------------------------------
# q112 — resample + gap fill (dense daily series with forward fill)
# ---------------------------------------------------------------------------


def q112_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events resampled to per-user daily value sums, densified over
    each user's [first, last] day with forward fill. Bucket domains are
    generated executor-side from per-key min/max (sequence + explode —
    no driver calendar, no global-calendar cross join); the carry is
    one last(IGNORE NULLS) window per key."""
    from synthea_etl_spark.operators.timeseries import gap_fill, resample

    e = load(spark, sf_dir, "events")
    daily = resample(
        e, "user_id", "ts", "1 day", [dsum("value", "daily_value")]
    ).withColumnRenamed("bucket", "day")
    return gap_fill(
        daily, "user_id", "day", "INTERVAL 1 DAY", ["daily_value"]
    ).select(
        "user_id",
        "day",
        F.col("daily_value").alias("value_filled"),
        "was_observed",
    )


ORACLE_Q112 = f"""
WITH daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         {sql_dsum('value', 'daily_value')}
  FROM events GROUP BY user_id, date_trunc('day', ts)
), dom AS (
  SELECT user_id,
         unnest(generate_series(min(day), max(day), INTERVAL 1 DAY)) AS day
  FROM daily GROUP BY user_id
), j AS (
  SELECT dom.user_id, dom.day, daily.daily_value,
         daily.daily_value IS NOT NULL AS was_observed
  FROM dom LEFT JOIN daily
    ON dom.user_id = daily.user_id AND dom.day = daily.day
)
SELECT user_id, day,
       last_value(daily_value IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_filled,
       was_observed
FROM j
"""


# ---------------------------------------------------------------------------
# q113 — incremental aggregate maintenance (state ⊎ delta == recompute)
# ---------------------------------------------------------------------------


def q113_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup upkeep: partial-aggregate state built from
    pre-1999 orders, the 1999+ load folded in as a delta — merge cost
    is O(|keys| + |delta|), independent of history size (vs the
    reference datamart's full recompute each run). The oracle is the
    from-scratch aggregate over ALL orders: exact-decimal state makes
    maintained == recomputed an equality, not an approximation."""
    from synthea_etl_spark.operators.incremental import (
        agg_state,
        finalize,
        merge_states,
    )

    o = load(spark, sf_dir, "orders")
    cutoff = F.lit("1999-01-01").cast("timestamp_ntz")
    state = agg_state(
        o.filter(F.col("o_orderdate") < cutoff), ["o_orderpriority"], "o_totalprice"
    )
    delta = agg_state(
        o.filter(F.col("o_orderdate") >= cutoff), ["o_orderpriority"], "o_totalprice"
    )
    return finalize(merge_states(state, delta), prefix="price_")


ORACLE_Q113 = """
SELECT o_orderpriority,
       COUNT(o_totalprice) AS price_count,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS price_sum,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
         / CAST(COUNT(o_totalprice) AS DOUBLE) AS price_avg,
       MIN(o_totalprice) AS price_min,
       MAX(o_totalprice) AS price_max
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q114 — ORC source round trip
# ---------------------------------------------------------------------------


def q114_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round trip (the other columnar lake format Spark reads
    natively): write orders as ORC, read back, aggregate. Predicate
    pushdown and column pruning apply to ORC scans the same as parquet
    (ORC carries its own stripe-level min/max indexes)."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # per-application path: concurrent sessions (bench + correctness,
    # parallel test runs) must not overwrite each other's output
    out = (
        tempfile.gettempdir()
        + f"/sparkgraft_orc_roundtrip_{spark.sparkContext.applicationId}"
    )
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "total_price"),
    )


ORACLE_Q114 = f"""
SELECT o_orderstatus, COUNT(*) AS n_orders,
       {sql_dsum('o_totalprice', 'total_price')}
FROM orders
GROUP BY o_orderstatus
"""


# ---------------------------------------------------------------------------
# q115 — VARIANT semi-structured extraction
# ---------------------------------------------------------------------------


def q115_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props parsed into Spark 4's VARIANT type
    (parse_json -> variant_get): open-schema JSON columns without a
    fixed StructType, the lakehouse answer to evolving event payloads.
    The shredded extraction stays columnar (no per-row Python); at
    100 TB the parse cost is the scan's, paid once, and extraction
    pushes into the same projection."""
    e = load(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json(F.col("props")), "$.k", "long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


ORACLE_Q115 = """
SELECT event_type,
       COUNT(k) AS n_events,
       CAST(SUM(k) AS BIGINT) AS sum_k,
       MIN(k) AS min_k,
       MAX(k) AS max_k
FROM (
  SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# q116 — heavy hitters (Misra-Gries sketch + exact verify)
# ---------------------------------------------------------------------------


def q116_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users with >= 80 events, found with sketch-bounded state: each
    partition keeps a 256-counter Misra-Gries summary (mapInPandas,
    vectorized per-batch histograms), candidates broadcast back for an
    exact count. For threshold > N/k the result equals the plain
    GROUP BY HAVING — which is the oracle — but the aggregation state
    never grows with key cardinality, the property that matters when
    the keys are 100 TB of document fingerprints rather than 150
    users."""
    from synthea_etl_spark.operators.frequency import heavy_hitters

    e = load(spark, sf_dir, "events")
    # data-proportional threshold, computed from the actual row count
    # (a parquet-footer count, no full scan) so query and oracle agree
    # at every scale factor and on regenerated data
    thr = max(int(e.count() * 0.008), 2)
    return heavy_hitters(e, "user_id", threshold=thr, k=256)


ORACLE_Q116 = """
SELECT user_id, COUNT(*) AS cnt
FROM events
GROUP BY user_id
HAVING COUNT(*) >= GREATEST(CAST((SELECT COUNT(*) FROM events) * 0.008 AS BIGINT), 2)
"""


# ---------------------------------------------------------------------------
# q117 — ordered set concatenation (listagg shape)
# ---------------------------------------------------------------------------


def q117_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct-set concatenation per group (the LISTAGG /
    string_agg reporting shape): distinct order years per priority as
    one sorted comma string. collect_set -> sort_array -> array_join
    keeps the set dedup inside the aggregate (partial collect_sets
    merge map-side); the sort is per-group over a handful of
    elements."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set(F.year("o_orderdate").cast("long"))),
                ",",
            ).alias("order_years")
        )
    )


ORACLE_Q117 = """
SELECT o_orderpriority,
       string_agg(DISTINCT CAST(year(o_orderdate) AS BIGINT), ','
                  ORDER BY CAST(year(o_orderdate) AS BIGINT)) AS order_years
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# q118 — PageRank over the nation trade graph (iterative)
# ---------------------------------------------------------------------------

_PR_DAMP = 0.85
_PR_N = 25  # nation count — fixed dim at every SF
_PR_BASE = (1.0 - _PR_DAMP) / _PR_N
_PR_ITERS = 5


def q118_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank on the nation trade graph (edge = supplier
    nation ships to customer nation, weight = lineitem count), 5
    iterations. Exercises the iterative join+agg loop with lineage
    truncation (operators/graph); exact-decimal contribution sums make
    the ranks bit-reproducible, so the oracle can unroll the SAME
    iterations as chained SQL CTEs."""
    from synthea_etl_spark.operators.graph import pagerank

    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("src"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("dst"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        li.join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(o), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return pagerank(
        edges, iterations=_PR_ITERS, damping=_PR_DAMP, n_nodes=_PR_N
    )


def _pr_oracle() -> str:
    head = """
WITH edges AS (
  SELECT sn.n_name AS src, cn.n_name AS dst, COUNT(*) AS w
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  GROUP BY sn.n_name, cn.n_name
), outdeg AS (
  SELECT src, SUM(w) AS wout FROM edges GROUP BY src
), en AS (
  SELECT src, dst, CAST(w AS DOUBLE) / CAST(wout AS DOUBLE) AS wnorm
  FROM edges JOIN outdeg USING (src)
), nodes AS (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
), pr0 AS (
  SELECT node, CAST(1 AS DOUBLE) / CAST(25 AS DOUBLE) AS rank FROM nodes
)"""
    steps = []
    for i in range(1, _PR_ITERS + 1):
        steps.append(f""", pr{i} AS (
  SELECT n.node,
         CAST({_PR_BASE!r} AS DOUBLE)
           + CAST({_PR_DAMP!r} AS DOUBLE) * COALESCE(c.s, CAST(0 AS DOUBLE))
           AS rank
  FROM nodes n
  LEFT JOIN (
    SELECT e.dst,
           CAST(SUM(CAST(p.rank * e.wnorm AS DECIMAL(25,6))) AS DOUBLE) AS s
    FROM en e JOIN pr{i - 1} p ON e.src = p.node
    GROUP BY e.dst
  ) c ON n.node = c.dst
)""")
    return head + "".join(steps) + f"\nSELECT node, rank FROM pr{_PR_ITERS}"


ORACLE_Q118 = _pr_oracle()


# ---------------------------------------------------------------------------
# q119 — key-skew diagnostic
# ---------------------------------------------------------------------------


def q119_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew profile of lineitem's orderkey (a prospective join/agg
    key): one count-per-key shuffle, one tiny aggregate. The
    skew_factor (max key vs uniform share) is the number that decides
    between a plain shuffle join and salted_join/salted_agg
    (operators/util) before committing a 100 TB shuffle."""
    from synthea_etl_spark.operators.util import key_skew_profile

    li = load(spark, sf_dir, "lineitem")
    return key_skew_profile(li, ["l_orderkey"])


ORACLE_Q119 = """
WITH pk AS (
  SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY l_orderkey
)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       MAX(cnt) AS max_per_key,
       round(quantile_cont(cnt, 0.5), 6) AS p50_per_key,
       round(quantile_cont(cnt, 0.99), 6) AS p99_per_key,
       round(CAST(MAX(cnt) * COUNT(*) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE), 6)
         AS skew_factor
FROM pk
"""


# ---------------------------------------------------------------------------
# q120 — ordered funnel (view -> click -> purchase)
# ---------------------------------------------------------------------------

_FUNNEL = ["view", "click", "purchase"]


def q120_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: users whose FIRST view precedes their
    first click precedes their first purchase, reported as cumulative
    step counts. One conditional-min aggregation per user (single
    shuffle on user_id, map-side partials), then a 3-row rollup of
    boolean conjunctions — the product-analytics shape (windowed
    sequence matching) done as pure aggregation, with no self-joins
    per step (the naive funnel joins the event table once PER STEP)."""
    e = load(spark, sf_dir, "events")
    mins = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
            for i, s in enumerate(_FUNNEL)
        ]
    )
    reached = mins.select(
        F.col("t0").isNotNull().alias("s0"),
        (F.col("t0").isNotNull() & (F.col("t1") > F.col("t0"))).alias("s1"),
        (
            F.col("t0").isNotNull()
            & (F.col("t1") > F.col("t0"))
            & (F.col("t2") > F.col("t1"))
        ).alias("s2"),
    )
    agg = reached.agg(
        *[F.sum(F.col(f"s{i}").cast("long")).alias(f"n{i}") for i in range(3)]
    )
    pairs = ", ".join(f"'{s}', n{i}" for i, s in enumerate(_FUNNEL))
    return agg.selectExpr(f"stack(3, {pairs}) as (step, n_users)")


ORACLE_Q120 = """
WITH mins AS (
  SELECT user_id,
         MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
         MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
         MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
  FROM events GROUP BY user_id
), reached AS (
  SELECT t0 IS NOT NULL AS s0,
         (t0 IS NOT NULL AND t1 > t0) AS s1,
         (t0 IS NOT NULL AND t1 > t0 AND t2 > t1) AS s2
  FROM mins
)
SELECT step, n_users FROM (
  SELECT 'view' AS step, CAST(SUM(CASE WHEN s0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_users, 0 AS ord FROM reached
  UNION ALL
  SELECT 'click', CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT), 1
  FROM reached
  UNION ALL
  SELECT 'purchase', CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT), 2
  FROM reached
)
"""


# ---------------------------------------------------------------------------
# q121 — retention cohorts (first-seen week x week offset)
# ---------------------------------------------------------------------------


def q121_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users bucketed by first-seen week,
    counted per week offset they were active again. Two aggregations
    (first-seen per user; distinct user-weeks) joined on user_id —
    both shuffle on the user key, so a cluster co-partitions them; the
    final (cohort, offset) rollup is cohort-sized."""
    e = load(spark, sf_dir, "events")
    week = F.date_trunc("week", F.col("ts")).cast("date")
    first_seen = e.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    active = e.select("user_id", week.alias("week")).distinct()
    return (
        active.join(first_seen, on="user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


ORACLE_Q121 = """
WITH first_seen AS (
  SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
  FROM events GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events
)
SELECT cohort_week,
       CAST(date_diff('day', cohort_week, week) / 7 AS INTEGER)
         AS week_offset,
       COUNT(*) AS n_users
FROM active JOIN first_seen USING (user_id)
GROUP BY cohort_week, week_offset
"""


# ---------------------------------------------------------------------------
# q122 — IQR outlier screen per group
# ---------------------------------------------------------------------------


def q122_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier counts per event type: upper fence =
    p75 + 1.5*IQR from EXACT interpolated percentiles (the q54-proven
    cross-engine form, rounded to 6dp so the interpolation division
    compares), broadcast back against the events for one conditional
    count. Two passes over the fact — the unavoidable minimum for any
    rank-based fence — with the per-group stats frame dim-sized."""
    e = load(spark, sf_dir, "events")
    pct = F.percentile(F.col("value"), F.array(F.lit(0.25), F.lit(0.75)))
    fences = (
        e.groupBy(F.col("event_type").alias("_et"))
        .agg(
            F.round(F.element_at(pct, 1), 6).alias("_p25"),
            F.round(F.element_at(pct, 2), 6).alias("_p75"),
        )
        .select(
            "_et",
            F.round(
                F.col("_p75") + F.lit(1.5) * (F.col("_p75") - F.col("_p25")), 6
            ).alias("fence_hi"),
        )
    )
    return (
        e.join(F.broadcast(fences), e.event_type == F.col("_et"))
        .groupBy("event_type", "fence_hi")
        .agg(
            F.sum(F.when(F.col("value") > F.col("fence_hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


ORACLE_Q122 = """
WITH fences AS (
  SELECT event_type,
         round(round(quantile_cont(value, 0.75), 6)
               + 1.5 * (round(quantile_cont(value, 0.75), 6)
                        - round(quantile_cont(value, 0.25), 6)), 6)
           AS fence_hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, f.fence_hi,
       CAST(SUM(CASE WHEN e.value > f.fence_hi THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers,
       COUNT(*) AS n_events
FROM events e JOIN fences f ON e.event_type = f.event_type
GROUP BY e.event_type, f.fence_hi
"""


QUERIES: dict[str, QuerySpec] = {
    "q111_expectations": QuerySpec(
        q111_expectations, ORACLE_Q111,
        "one-pass data-quality expectations + FK check", ("quality",),
    ),
    "q112_gap_fill": QuerySpec(
        q112_gap_fill, ORACLE_Q112,
        "daily resample + forward-fill gap densification", ("window", "stream"),
    ),
    "q113_incremental_agg": QuerySpec(
        q113_incremental_agg, ORACLE_Q113,
        "incremental rollup maintenance (state merge == recompute)", ("agg", "etl"),
    ),
    "q114_orc_source": QuerySpec(
        q114_orc_source, ORACLE_Q114, "ORC source round trip", ("source",),
    ),
    "q115_variant_extract": QuerySpec(
        q115_variant_extract, ORACLE_Q115,
        "VARIANT semi-structured extraction (parse_json/variant_get)",
        ("semi",),
    ),
    "q116_heavy_hitters": QuerySpec(
        q116_heavy_hitters, ORACLE_Q116,
        "exact heavy hitters via Misra-Gries sketch + verify",
        ("agg", "approx", "udf"),
    ),
    "q117_listagg": QuerySpec(
        q117_listagg, ORACLE_Q117,
        "ordered distinct-set concatenation (LISTAGG shape)", ("agg",),
    ),
    "q118_pagerank": QuerySpec(
        q118_pagerank, ORACLE_Q118,
        "iterative weighted PageRank with lineage truncation",
        ("join", "agg", "graph"),
    ),
    "q119_skew_profile": QuerySpec(
        q119_skew_profile, ORACLE_Q119,
        "key-skew diagnostic (feeds the salting decision)",
        ("agg", "skew", "quality"),
    ),
    "q120_funnel": QuerySpec(
        q120_funnel, ORACLE_Q120,
        "ordered conversion funnel via conditional-min aggregation",
        ("agg", "window"),
    ),
    "q121_retention": QuerySpec(
        q121_retention, ORACLE_Q121,
        "weekly retention cohort triangle", ("agg", "join"),
    ),
    "q122_outliers": QuerySpec(
        q122_outliers, ORACLE_Q122,
        "Tukey-fence outlier screen per group", ("agg", "quality"),
    ),
}
