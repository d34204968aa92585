"""Extended analytics, second batch: arbitrary GROUPING SETS and the
approximate-aggregate surface (HLL distinct counts, quantile sketches).

Approximate aggregates are first-class at 100 TB — exact distinct
counts and exact percentiles both force full shuffles of the keyed
data, while sketches are one pass, mergeable, and bounded-memory. They
are rows-only in the driver gate (Spark's HLL++/GK sketches differ
from DuckDB's implementations by design); tests/test_packing.py pins
them to the exact answers within the configured error bounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, dsum, load, sql_dsum


def q66b_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — ((flag, status), (flag), ()) — with
    grouping_id to disambiguate subtotal rows. One pass: Spark expands
    the sets map-side (same shuffle count as a plain groupBy), exactly
    like CUBE/ROLLUP but with a user-chosen lattice."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
        FROM v_li
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


ORACLE_Q66B = """
SELECT l_returnflag, l_linestatus,
       CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


def q101_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct customers and distinct order dates per
    order priority. At scale this replaces a full (priority, key)
    shuffle with a fixed ~1.5 KB sketch per group that merges
    associatively — the only way a 100 TB COUNT(DISTINCT) stays one
    pass. rsd=0.01 (~1% relative error; bound asserted in tests)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.01).alias("approx_customers"),
        F.approx_count_distinct("o_orderdate", rsd=0.01).alias("approx_dates"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q102_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch: p50/p95/p99 of extended price
    per return flag at accuracy 10000 (error <= 0.01%%-ile). Exact
    percentiles need a full sort per group; the sketch is one pass and
    mergeable. Tolerance vs the exact interpolated percentiles is
    asserted in tests."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.95, 0.99], 10000
        ).alias("pcts"),
        F.count(F.lit(1)).alias("n_rows"),
    ).select(
        "l_returnflag",
        F.col("pcts")[0].alias("p50"),
        F.col("pcts")[1].alias("p95"),
        F.col("pcts")[2].alias("p99"),
        "n_rows",
    )


QUERIES: dict[str, QuerySpec] = {
    "q66b_grouping_sets": QuerySpec(
        q66b_grouping_sets,
        ORACLE_Q66B,
        "arbitrary GROUPING SETS with grouping_id",
        ("agg",),
    ),
    "q101_approx_distinct": QuerySpec(
        q101_approx_distinct,
        None,
        "HLL++ approx distinct by priority (exact twin: q53; tolerance-tested)",
        ("agg", "approx"),
    ),
    "q102_approx_percentiles": QuerySpec(
        q102_approx_percentiles,
        None,
        "GK-sketch approx percentiles (exact twin: q54; tolerance-tested)",
        ("agg", "approx"),
    ),
}


def q103_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-curve clustering key over (custkey, order epoch-day): the sort
    key operators/layout.zorder_write clusters files on. Projection
    only — pure codegen bit arithmetic; the layout effect (tight
    per-file min/max in BOTH dimensions) is asserted on real parquet
    footers in tests/test_layout.py."""
    from synthea_etl_spark.operators.layout import zvalue

    o = load(spark, sf_dir, "orders")
    day = F.datediff(
        F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
    ).cast("long")
    return o.select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("custkey"),
        day.alias("day_num"),
        zvalue([F.col("o_custkey").cast("long"), day], bits=16).alias("zval"),
    )


def _sql_zvalue(xs: list[str], bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        for j, x in enumerate(xs):
            terms.append(f"((({x} >> {i}) & 1) << {i * len(xs) + j})")
    return " + ".join(terms)


ORACLE_Q103 = f"""
WITH b AS (
  SELECT o_orderkey, CAST(o_custkey AS BIGINT) AS custkey,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT)
           AS day_num
  FROM orders
)
SELECT o_orderkey, custkey, day_num,
       {_sql_zvalue(['custkey', 'day_num'])} AS zval
FROM b
"""


QUERIES["q103_zorder_key"] = QuerySpec(
    q103_zorder_key,
    ORACLE_Q103,
    "Z-order clustering key (layout op, footer-stat tested)",
    ("layout",),
)
