"""TPC-H classics, final batch — the seven shapes the first two batches
left out (Q2/Q9/Q11/Q12/Q16/Q20/Q21), adapted to TESTDATA's column
subset (no partsupp table, no commit/receipt dates, no comments):
lineitem stands in as the part-supplier relation, ``p_retailprice`` as
the cost basis, and "late" is ``l_shipdate > o_orderdate + N days``.

Each keeps the defining relational shape of its original:

- Q2: correlated MIN subquery (arg-min supplier per part).
- Q9: multi-dim star join + profit expression, grouped nation x year.
- Q11: HAVING against a scalar-subquery fraction of the global total.
- Q12: fact-fact join + conditional (CASE) counts.
- Q16: NOT IN exclusion subquery + COUNT(DISTINCT).
- Q20: doubly-nested IN subqueries (semi-join chain).
- Q21: EXISTS + NOT EXISTS self-correlation on the same fact.

Scale notes: dims (part/supplier/nation/region and every derived
key-list) broadcast; the only all-fact shuffles are the natural-key
aggregations (partkey/orderkey/suppkey) and the Q21 self-semi/anti
joins, which reuse one exchange of distinct (orderkey, suppkey) pairs.
Money math goes through the exact decimal path (plans/common.dsum) so
results are reproducible at any parallelism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import (
    DEC,
    QuerySpec,
    dsum,
    exact_agg,
    load,
    sql_dsum,
    sql_msum,
)


def _ts(s: str) -> F.Column:
    return F.lit(s).cast("timestamp_ntz")


def _eu_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE suppliers with nation name — shared Q2/Q11 dim chain."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    n = (
        load(spark, sf_dir, "nation")
        .join(F.broadcast(r.select("r_regionkey")),
              F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )


# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN subquery)
# ---------------------------------------------------------------------------


def q104_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (min-cost supplier): for each LARGE part, the
    EUROPE supplier(s) offering the minimum unit price, where unit
    price = min(l_extendedprice / l_quantity) over that pair's lines
    (lineitem plays partsupp). The correlated MIN decorrelates to a
    per-part aggregate of the per-pair frame joined back on equality —
    both sides derive from the SAME double min, so the comparison is
    exact. Pair aggregation shuffles lineitem once on (partkey,
    suppkey); everything after operates on dim-sized frames."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "LARGE")
        .select("p_partkey", "p_name")
    )
    eu = _eu_suppliers(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    pair_cost = (
        li.join(F.broadcast(p.select("p_partkey")),
                li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(eu.select("s_suppkey")),
              li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("cost"))
    )
    min_cost = pair_cost.groupBy(F.col("l_partkey").alias("_mk")).agg(
        F.min("cost").alias("_mc")
    )
    return (
        pair_cost.join(
            F.broadcast(min_cost),
            (F.col("l_partkey") == F.col("_mk")) & (F.col("cost") == F.col("_mc")),
        )
        .join(F.broadcast(eu), F.col("l_suppkey") == eu.s_suppkey)
        .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("l_partkey").alias("partkey"), "p_name", "cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


ORACLE_Q104 = """
WITH eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), pair_cost AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS cost
  FROM lineitem
  JOIN (SELECT p_partkey FROM part WHERE p_type = 'LARGE')
    ON l_partkey = p_partkey
  JOIN eu ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, pc.l_partkey AS partkey, p_name, cost
FROM pair_cost pc
JOIN eu ON pc.l_suppkey = eu.s_suppkey
JOIN part ON pc.l_partkey = p_partkey
WHERE cost = (
  SELECT MIN(pc2.cost) FROM pair_cost pc2 WHERE pc2.l_partkey = pc.l_partkey
)
ORDER BY s_acctbal DESC, n_name, s_name, partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (star join, nation x year)
# ---------------------------------------------------------------------------


def q105_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product profit): profit on red-named parts by
    supplier nation and order year, with profit = revenue - cost where
    cost = 0.5 * p_retailprice * l_quantity (retail price stands in for
    ps_supplycost). Lineitem streams through three broadcast joins —
    part (pre-filtered), supplier->nation, orders (projected to the two
    needed columns) — then one grouped exact-decimal aggregation."""
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.5) * F.col("p_retailprice") * F.col("l_quantity")
    )
    joined = (
        li.join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(s), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(o), li.l_orderkey == F.col("o_orderkey"))
        .select(
            "nation",
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("_amount"),
        )
    )
    # nation x year groups are unbounded, so the exact sum runs as
    # two-phase micro-longs (codegen) with a decimal combine over the
    # tiny partial set — not per-row Decimal on the joined stream.
    # amount is 4-dp money (2dp*2dp), so this equals dsum exactly;
    # the sign branch in exact_agg handles negative profits.
    return exact_agg(joined, keys=["nation", "o_year"], sums={"sum_profit": "_amount"})


ORACLE_Q105 = f"""
SELECT nation, o_year, {sql_msum('amount', 'sum_profit')}
FROM (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount)
           - 0.5 * p_retailprice * l_quantity AS amount
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN orders ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%red%'
)
GROUP BY nation, o_year
"""


# ---------------------------------------------------------------------------
# Q11 — important stock (HAVING vs scalar-subquery fraction)
# ---------------------------------------------------------------------------


def q106_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): parts whose EUROPE-supplied
    line value exceeds 0.1% of the total such value. The global total
    is a 1-row re-aggregation of the SAME per-part frame, broadcast
    back as the HAVING threshold — one lineitem shuffle on partkey,
    then dim-sized work. Both the per-part values and the total go
    through exact decimal so the threshold comparison is reproducible
    at any parallelism."""
    eu = _eu_suppliers(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    per_part = (
        li.join(F.broadcast(eu.select("s_suppkey")),
                li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum("l_extendedprice", "part_value"))
    )
    total = per_part.agg(
        (F.sum(F.col("part_value").cast(DEC)).cast("double") * 0.001).alias("_thr")
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("_thr"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
    )


ORACLE_Q106 = f"""
WITH per_part AS (
  SELECT l_partkey, {sql_dsum('l_extendedprice', 'part_value')}
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, part_value
FROM per_part
WHERE part_value > (
  SELECT CAST(SUM(CAST(part_value AS DECIMAL(25,6))) AS DOUBLE) * 0.001
  FROM per_part
)
"""


# ---------------------------------------------------------------------------
# Q12 — late shipments by line status (conditional counts)
# ---------------------------------------------------------------------------


def q107_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping priority audit): 1996 lines shipped
    more than 60 days after order date, split per line status into
    high-priority (URGENT/HIGH) and low-priority order counts
    (l_linestatus stands in for l_shipmode; ship-vs-order lag for the
    missing commit/receipt dates). The orderkey equi-join is the one
    shuffle; the CASE counts fold into the same hash aggregate."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    j = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return j.groupBy("l_linestatus").agg(
        F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
        F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
    )


ORACLE_Q107 = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
"""


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN + COUNT DISTINCT)
# ---------------------------------------------------------------------------


def q108_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) over lineitem pairs, excluding
    Brand#1 parts and suppliers with negative balance (the NOT IN
    complaint list). The exclusion list is dim-sized, so NOT IN plans
    as a broadcast left-anti join; COUNT(DISTINCT) shuffles the
    deduplicated (brand, type, size, suppkey) projection once."""
    bad = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    p = (
        load(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_Q108 = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — potential part promotion (doubly-nested IN)
# ---------------------------------------------------------------------------


def q109_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (part promotion): suppliers who shipped more
    than 100 units of red-named parts during 1996, with their nation.
    The doubly-nested INs (supplier IN <agg over lineitem restricted
    to part IN <name filter>>) decorrelate to a semi-join chain: the
    part list broadcasts into lineitem, the HAVING aggregate shuffles
    on suppkey once, and the surviving suppkeys broadcast back against
    the supplier dim as a left-semi join."""
    red = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01"))
        & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    eligible = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("_q"))
        .filter(F.col("_q") > 100)
        .select("l_suppkey")
    )
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        s.join(F.broadcast(eligible), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
    )


ORACLE_Q109 = """
SELECT s_suppkey, s_name, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) > 100
)
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------


def q110_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (waiting suppliers): per supplier, the number of
    finished multi-supplier orders where THIS supplier shipped late
    (>90 days after order date) and no OTHER supplier did.

    Both correlated subqueries (EXISTS another-supplier line, NOT
    EXISTS another-LATE-supplier line) correlate on the SAME key
    (orderkey), so the whole predicate pair decorrelates to one
    grouped aggregation per order instead of two self-joins:
    EXISTS-other <=> countDistinct(supp) > 1, NOT-EXISTS-other-late
    <=> countDistinct(late supp) == 1 — and since exactly one supplier
    is then late, max(late supp) IS the waiting supplier. One orderkey
    shuffle total (the naive semi+anti plan shuffles the pair frame
    three times; measured ~2.0s -> ~1.5s at sf0.1, same oracle hash —
    and the gap widens with data size as the extra shuffles grow)."""
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_order = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct(F.when(late, F.col("l_suppkey"))).alias("n_late"),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_supp"),
        )
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        per_order.join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )


ORACLE_Q110 = """
SELECT s_name, COUNT(*) AS numwait
FROM (
  SELECT DISTINCT l_orderkey, l_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate > o_orderdate + INTERVAL 90 DAY
) l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND o3.o_orderstatus = 'F'
      AND l3.l_shipdate > o3.o_orderdate + INTERVAL 90 DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


QUERIES: dict[str, QuerySpec] = {
    "q104_tpch_q2": QuerySpec(
        q104_tpch_q2, ORACLE_Q104,
        "TPC-H Q2 min-cost supplier (correlated MIN)", ("tpch", "join"),
    ),
    "q105_tpch_q9": QuerySpec(
        q105_tpch_q9, ORACLE_Q105,
        "TPC-H Q9 product profit by nation/year", ("tpch", "join", "agg"),
    ),
    "q106_tpch_q11": QuerySpec(
        q106_tpch_q11, ORACLE_Q106,
        "TPC-H Q11 important stock (HAVING vs global fraction)", ("tpch", "agg"),
    ),
    "q107_tpch_q12": QuerySpec(
        q107_tpch_q12, ORACLE_Q107,
        "TPC-H Q12 late shipments conditional counts", ("tpch", "join", "agg"),
    ),
    "q108_tpch_q16": QuerySpec(
        q108_tpch_q16, ORACLE_Q108,
        "TPC-H Q16 supplier count with NOT IN exclusion", ("tpch", "agg"),
    ),
    "q109_tpch_q20": QuerySpec(
        q109_tpch_q20, ORACLE_Q109,
        "TPC-H Q20 nested-IN part promotion", ("tpch", "join"),
    ),
    "q110_tpch_q21": QuerySpec(
        q110_tpch_q21, ORACLE_Q110,
        "TPC-H Q21 waiting suppliers (EXISTS/NOT EXISTS)", ("tpch", "join"),
    ),
}
