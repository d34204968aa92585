"""TPC-H classics, second batch (Q7/Q8/Q10/Q13/Q14/Q15/Q17/Q18/Q19/Q22
shapes adapted to TESTDATA's column subset) plus the set operations the
first batch lacked (INTERSECT / EXCEPT) and CUBE grouping sets.

These exercise the remaining standard warehouse shapes: bidirectional
join predicates (Q7), conditional-aggregate market share (Q8), outer-
join histograms (Q13), scalar subqueries (Q15), correlated aggregate
subqueries (Q17), HAVING-driven semi joins (Q18), disjunctive join
predicates (Q19), and anti-join + scalar subquery (Q22).

Scale notes: every query keeps the single big fact (lineitem/orders) as
the stream side and broadcasts dimensions; the only fact-fact shuffles
are the Q13 outer join and Q17/Q18 self-aggregations, which shuffle on
their natural keys (custkey/orderkey/partkey) exactly once. Money sums
go through the exact decimal path (plans/common.dsum) so results are
reproducible at any parallelism — see common.py docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import (
    DEC,
    QuerySpec,
    dsum,
    load,
    msum_bounded,
    sql_dsum,
)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------


def q84_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): revenue shipped between NATION_1 and
    NATION_2 (both directions) by year. The pair filter is evaluated
    after two broadcast dim joins; lineitem is never shuffled — the
    groupBy on (supp_nation, cust_nation, year) is the only exchange,
    and it carries pre-aggregated partials (map-side combine)."""
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(rev, "revenue"))
    )


ORACLE_Q84 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_dsum('volume', 'revenue')}
FROM (
  SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
      OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
)
GROUP BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------


def q85_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (market share): NATION_3 suppliers' share of PROMO-part
    revenue sold to ASIA customers, by order year. The share is a
    conditional aggregate (sum(case)/sum), both sums exact-decimal so
    the one double division is deterministic."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n_cust = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r.select("r_regionkey")), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    c = load(spark, sf_dir, "customer").join(
        F.broadcast(n_cust), F.col("c_nationkey") == F.col("cn_key")
    ).select("c_custkey")
    n_supp = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n_supp), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    nat_vol = F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
        F.lit(0).cast(DEC)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(o), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            (
                F.sum(nat_vol).cast("double") / F.sum(vol).cast("double")
            ).alias("mkt_share")
        )
    )


ORACLE_Q85 = """
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                     ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6)) AS volume,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
)
GROUP BY o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned item report
# ---------------------------------------------------------------------------


def q86_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned items): top-20 customers by revenue lost to
    returns in 1996Q1. Orders filter prunes the fact early; customer
    attributes join AFTER the aggregation (20 rows), not before — at
    100 TB that ordering is the difference between broadcasting a dim
    into a 20-row frame and shuffling the whole fact with it."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(F.broadcast(o.select("o_orderkey", "o_custkey")), li.l_orderkey == F.col("o_orderkey"))
        .groupBy("o_custkey")
        # groups bounded by orders-per-customer x 7 lines (TPC-H holds
        # this constant across SF): micro-long sum in codegen == dsum
        .agg(msum_bounded(rev, "revenue"))
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        agg.join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


ORACLE_Q86 = f"""
SELECT c_custkey, c_name,
       {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
       c_acctbal, n_name
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------


def q87_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by
    order count, keeping zero-order customers via left outer join.
    Two-level aggregation; the second groupBy input is one row per
    customer, so the second shuffle is tiny."""
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


ORACLE_Q87 = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
"""


# ---------------------------------------------------------------------------
# Q14 — promotion revenue share
# ---------------------------------------------------------------------------


def q88_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect): % of March-1996 shipped revenue
    from PROMO parts. Part is broadcast; one conditional and one plain
    decimal sum, one double division."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(DEC)
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0).cast(DEC))
    return li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey")).agg(
        (
            F.lit(100.0) * F.sum(promo).cast("double") / F.sum(vol).cast("double")
        ).alias("promo_revenue")
    )


ORACLE_Q88 = """
SELECT 100.0
       * CAST(SUM(CASE WHEN p_type = 'PROMO'
                       THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))
                       ELSE CAST(0 AS DECIMAL(25,6)) END) AS DOUBLE)
       / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(25,6))) AS DOUBLE)
       AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar subquery on an aggregate)
# ---------------------------------------------------------------------------


def q89_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): supplier(s) whose 1996Q1 shipped
    revenue equals the global max. The max is a 1-row aggregate of the
    per-supplier frame, broadcast back as a scalar — both sides derive
    from the SAME exact-decimal sums, so the double equality is safe.
    The per-supplier frame is persisted: it feeds both the max branch
    and the final join, and it is one row per supplier — tiny to cache,
    expensive to recompute (a full lineitem scan + shuffle)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(dsum(rev, "total_revenue")).persist()
    mx = per_supp.agg(F.max("total_revenue").alias("_mx"))
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_supp.join(F.broadcast(mx), F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q89 = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated aggregate subquery)
# ---------------------------------------------------------------------------


def q90_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity orders): revenue from Brand#12 lines
    below 20%% of the part's average quantity. The correlated subquery
    decorrelates to a per-part aggregate joined back on partkey —
    lineitem shuffles on l_partkey once for the aggregate; the brand
    filter makes the join side small enough to broadcast. Quantities
    are integer-valued doubles, so the decimal avg is exact and the
    0.2x threshold comparison is deterministic."""
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#12").select(
        "p_partkey"
    )
    li = load(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    per_part = branded.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (
            F.sum(F.col("l_quantity").cast(DEC)).cast("double")
            / F.count("l_quantity").cast("double")
        ).alias("avg_qty")
    )
    return (
        branded.join(F.broadcast(per_part), branded.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice", "_s")))
        .select((F.col("_s") / 7.0).alias("avg_yearly"))
    )


ORACLE_Q90 = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / 7.0
       AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#12'
  AND l_quantity < 0.2 * (
    SELECT CAST(SUM(CAST(l2.l_quantity AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(COUNT(l2.l_quantity) AS DOUBLE)
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""


# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING-driven semi join)
# ---------------------------------------------------------------------------


def q91_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): orders whose total quantity
    exceeds 300, with customer attributes, top-100 by price. The
    HAVING aggregate runs first (one shuffle on orderkey, map-side
    combine); the surviving ~0.1%% of orderkeys broadcast back against
    orders/customer. Per-orderkey line count is structurally bounded
    (<=7), so the quantity sum uses the codegen-only bounded micro-unit
    path instead of decimal accumulation (1.2->0.85 s at sf0.1)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(msum_bounded("l_quantity", "sum_qty"))
        .filter(F.col("sum_qty") > 300)
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        o.join(F.broadcast(big), o.o_orderkey == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


ORACLE_Q91 = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
FROM orders
JOIN (
  SELECT l_orderkey AS bk,
         CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 300
) ON o_orderkey = bk
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive join predicates
# ---------------------------------------------------------------------------


def q92_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue): three OR'd brand/size/quantity
    predicate groups. Expressed as one equi-join on partkey plus a
    residual disjunction — Catalyst keeps the hash join and evaluates
    the OR as a post-join filter instead of falling into a nested-loop
    join (the classic Q19 trap)."""
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem")
    j = li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & q.between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & q.between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & q.between(20, 30)
        )
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.filter(cond).agg(dsum(rev, "revenue"))


ORACLE_Q92 = f"""
SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# ---------------------------------------------------------------------------
# Q22 shape — dormant high-balance customers (anti join + scalar subquery)
# ---------------------------------------------------------------------------


def q93_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers with
    above-positive-average balance and no orders since 2000, grouped by
    nation. Expressed through spark.sql: the scalar average runs as a
    genuine ScalarSubquery (its own tiny stage, result inlined as a
    literal — no join of any kind), and NOT EXISTS decorrelates to a
    left-anti join against the recent custkeys."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("v_cust")
    load(spark, sf_dir, "orders").createOrReplaceTempView("v_ord")
    return spark.sql(
        """
        SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                 AS totacctbal
        FROM v_cust c
        WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
                   / CAST(COUNT(c_acctbal) AS DOUBLE)
            FROM v_cust WHERE c_acctbal > 0
          )
          AND NOT EXISTS (
            SELECT 1 FROM v_ord o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
        GROUP BY c_nationkey
        """
    )


ORACLE_Q93 = f"""
SELECT CAST(c_nationkey AS BIGINT) AS nationkey, COUNT(*) AS numcust,
       {sql_dsum('c_acctbal', 'totacctbal')}
FROM customer c
WHERE c_acctbal > (
    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(25,6))) AS DOUBLE)
           / CAST(COUNT(c_acctbal) AS DOUBLE)
    FROM customer WHERE c_acctbal > 0
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  )
GROUP BY c_nationkey
"""


# ---------------------------------------------------------------------------
# Set operations: INTERSECT / EXCEPT
# ---------------------------------------------------------------------------


def q94_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT: customers who ordered in both 1995 and 2000.
    Spark plans intersect as a distinct + left-semi join; both inputs
    are pre-filtered projections of the same fact, shuffled once on
    custkey each."""
    o = load(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y00 = o.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y95.intersect(y00)


ORACLE_Q94 = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
"""


def q95_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT: customers who ordered in 1995 but not in 2000 (churn
    set). ``subtract`` is SQL EXCEPT DISTINCT — plans as distinct +
    left-anti join (``exceptAll`` would keep multiplicity and leak
    keys that appear more often in 1995 than 2000)."""
    o = load(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y00 = o.filter(F.year("o_orderdate") == 2000).select("o_custkey")
    return y95.subtract(y00)


ORACLE_Q95 = """
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 2000
"""


# ---------------------------------------------------------------------------
# CUBE grouping sets
# ---------------------------------------------------------------------------


def q96_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(l_returnflag, l_linestatus): all four grouping-set
    combinations in one pass. Spark expands the cube map-side then
    aggregates once — same shuffle count as a plain groupBy."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("l_quantity", "sum_qty"),
    )


ORACLE_Q96 = f"""
SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
       {sql_dsum('l_quantity', 'sum_qty')}
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


QUERIES: dict[str, QuerySpec] = {
    "q84_tpch_q7": QuerySpec(
        q84_tpch_q7, ORACLE_Q84, "TPC-H Q7 volume shipping between nations", ("tpch", "join")
    ),
    "q85_tpch_q8": QuerySpec(
        q85_tpch_q8, ORACLE_Q85, "TPC-H Q8 national market share", ("tpch", "join", "agg")
    ),
    "q86_tpch_q10": QuerySpec(
        q86_tpch_q10, ORACLE_Q86, "TPC-H Q10 returned-item top customers", ("tpch", "join")
    ),
    "q87_tpch_q13": QuerySpec(
        q87_tpch_q13, ORACLE_Q87, "TPC-H Q13 order-count distribution", ("tpch", "join", "agg")
    ),
    "q88_tpch_q14": QuerySpec(
        q88_tpch_q14, ORACLE_Q88, "TPC-H Q14 promotion revenue share", ("tpch", "agg")
    ),
    "q89_tpch_q15": QuerySpec(
        q89_tpch_q15, ORACLE_Q89, "TPC-H Q15 top supplier (scalar subquery)", ("tpch", "join")
    ),
    "q90_tpch_q17": QuerySpec(
        q90_tpch_q17, ORACLE_Q90, "TPC-H Q17 correlated avg-quantity subquery", ("tpch", "agg")
    ),
    "q91_tpch_q18": QuerySpec(
        q91_tpch_q18, ORACLE_Q91, "TPC-H Q18 large-volume customers", ("tpch", "join", "agg")
    ),
    "q92_tpch_q19": QuerySpec(
        q92_tpch_q19, ORACLE_Q92, "TPC-H Q19 disjunctive predicates", ("tpch", "join")
    ),
    "q93_tpch_q22": QuerySpec(
        q93_tpch_q22, ORACLE_Q93, "TPC-H Q22 dormant high-balance customers", ("tpch", "join")
    ),
    "q94_intersect": QuerySpec(
        q94_intersect, ORACLE_Q94, "INTERSECT repeat-year customers", ("set",)
    ),
    "q95_except": QuerySpec(
        q95_except, ORACLE_Q95, "EXCEPT churned customers", ("set",)
    ),
    "q96_cube": QuerySpec(
        q96_cube, ORACLE_Q96, "CUBE grouping sets over returnflag/linestatus", ("agg",)
    ),
}
