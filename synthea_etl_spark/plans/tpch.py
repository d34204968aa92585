"""TPC-H-shaped benchmark classics over TESTDATA (adapted to its
column subset — no comment/commitdate/receiptdate columns exist).

These complement the SURVEY §2 operator inventory with the standard
multi-join analytics shapes a warehouse bench exercises: fact-dim
join chains with selective filters (Q3/Q5), pure scan-agg (Q6), and
exists-style semi joins (Q4 shape). All money sums go through the
exact decimal path (plans/common.dsum) so results are reproducible at
any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, dsum, load, msum_bounded, sql_dsum

CUT = "1996-03-15"


def q61_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): top-10 unshipped orders by
    revenue for one market segment. Two broadcast-able dims filter the
    fact early; the top-k is ORDER BY + LIMIT (per-partition heaps,
    no global sort), with full tie-breaks for determinism."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit(CUT).cast("timestamp_ntz"))
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit(CUT).cast("timestamp_ntz"))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        # per-order groups are structurally bounded (<=7 lineitems), so
        # the single-phase micro-long sum stays in codegen — no Decimal
        # accumulation on the wide stream; equals dsum on 4-dp revenue
        .agg(msum_bounded(rev, "revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


ORACLE_Q61 = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '{CUT} 00:00:00'
  AND l_shipdate > TIMESTAMP '{CUT} 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q62_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): revenue by nation for one
    region-year where supplier and customer share a nation. Five-table
    join; region/nation/supplier/customer all broadcast, lineitem
    (the only big side) is never shuffled for enrichment."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r.select("r_regionkey")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
    )
    li = load(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(s.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n.select("n_nationkey", "n_name")), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(dsum(rev, "revenue"))
    )


ORACLE_Q62 = f"""
SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
"""


def q63_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-agg — the
    predicate-pushdown showcase (every filter reaches the parquet
    reader; one aggregate row crosses the wire)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp_ntz"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"))


ORACLE_Q63 = f"""
SELECT {sql_dsum('l_extendedprice * l_discount', 'revenue')}
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


def q64_exists_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): orders with at least
    one line shipped >90 days after the order date, counted by
    priority. EXISTS compiles to a left-semi join — the probe side
    deduplicates during the join, no distinct pass."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    sel = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return sel.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


ORACLE_Q64 = """
SELECT o_orderpriority, COUNT(*) AS n_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
)
GROUP BY o_orderpriority
"""


def q65_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-fact join (operators/util.salted_join): lineitem ⋈
    orders on orderkey with an 8-way salt, then revenue by priority.
    Identical results to the plain join; no reducer ever owns a whole
    hot key."""
    from synthea_etl_spark.operators.util import salted_join

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_linenumber"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(
        li, o, ["l_orderkey"], F.crc32(F.col("l_linenumber").cast("string")), 8
    )
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"), dsum("l_extendedprice", "revenue")
    )


ORACLE_Q65 = f"""
SELECT o_orderpriority, COUNT(*) AS n_lines,
       {sql_dsum('l_extendedprice', 'revenue')}
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


QUERIES: dict[str, QuerySpec] = {
    "q61_tpch_q3": QuerySpec(
        q61_tpch_q3, ORACLE_Q61, "TPC-H Q3 shipping priority top-10", ("tpch", "join")
    ),
    "q62_tpch_q5": QuerySpec(
        q62_tpch_q5, ORACLE_Q62, "TPC-H Q5 local supplier volume", ("tpch", "join")
    ),
    "q63_tpch_q6": QuerySpec(
        q63_tpch_q6, ORACLE_Q63, "TPC-H Q6 scan-filter-agg", ("tpch", "agg")
    ),
    "q64_exists_semi": QuerySpec(
        q64_exists_semi, ORACLE_Q64, "EXISTS via left-semi join by priority", ("tpch", "join")
    ),
    "q65_salted_join": QuerySpec(
        q65_salted_join, ORACLE_Q65, "skew-resistant salted fact-fact join", ("tpch", "join", "skew")
    ),
}
