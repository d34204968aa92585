"""Relational operator inventory (SURVEY.md §2) over TESTDATA tables.

Each query exercises one (or a few) operators from the reference's
inventory, re-expressed as idiomatic Spark DataFrame plans, with a
DuckDB oracle. Reference citations are per-query docstring comments.

Scale notes applied throughout:
- dims (region/nation/supplier, derived lookup dims) are broadcast —
  no shuffle of the fact side for lookups (J4-style surrogate-key
  joins; ``Patient_datamart.py:203-210`` equivalent);
- aggregations are expressed declaratively so Catalyst plans partial
  (map-side) aggregation before the exchange;
- top-k is ORDER BY + LIMIT → TakeOrderedAndProject (no full sort);
- dedup-by-key uses a window row_number with a total order — the
  reference's ``dropDuplicates(subset)`` (``Patient_datamart.py:196``)
  keeps an arbitrary row, which is non-reproducible at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import (
    QuerySpec,
    davg,
    dsum,
    exact_agg,
    load,
    sql_davg,
    sql_dsum,
    sql_mavg,
    sql_msum,
)

# ---------------------------------------------------------------------------
# Aggregation / flagship
# ---------------------------------------------------------------------------


def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shaped pricing summary.

    Operators: CSV-era A1 group-agg generalized (SURVEY §2.5), P6 cast,
    filter pushdown, multi-aggregate. The filter reaches the parquet
    scan (PushedFilters) and aggregation is partial+final hash agg.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    filtered = li.filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp_ntz")
    )
    # exact_agg: partition-local long partials in micro-units, decimal
    # combine — same exact results as dsum/davg at ~2x the speed (the
    # aggregation, not the scan, dominates this query)
    return exact_agg(
        filtered,
        keys=["l_returnflag", "l_linestatus"],
        sums={
            "sum_qty": F.col("l_quantity"),
            "sum_base_price": F.col("l_extendedprice"),
            "sum_disc_price": disc_price,
            "sum_charge": charge,
        },
        avgs={
            "avg_qty": F.col("l_quantity"),
            "avg_price": F.col("l_extendedprice"),
            "avg_disc": F.col("l_discount"),
        },
        count_alias="count_order",
    ).orderBy("l_returnflag", "l_linestatus")


ORACLE_Q01 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_msum('l_quantity', 'sum_qty')},
       {sql_msum('l_extendedprice', 'sum_base_price')},
       {sql_msum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {sql_msum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {sql_mavg('l_quantity', 'avg_qty')},
       {sql_mavg('l_extendedprice', 'avg_price')},
       {sql_mavg('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# ---------------------------------------------------------------------------
# Projections / column transforms (SURVEY §2.2)
# ---------------------------------------------------------------------------


def q02_select_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 select+alias (`Patient_datamart.py:119-121`): projection with
    renames and a per-row arithmetic column. Column-pruned scan."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("cust_id"),
        F.col("c_name").alias("cust_name"),
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_acctbal") * F.lit(1.1)).alias("acctbal_adj"),
    )


ORACLE_Q02 = """
SELECT c_custkey AS cust_id, c_name AS cust_name,
       c_mktsegment AS segment, c_acctbal * 1.1 AS acctbal_adj
FROM customer
"""


def q03_normalize_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 rename-all-columns (`Raw_To_Staging.py:103-104`): toDF with
    normalized names (lowercase, non-word -> _). Applied to nation."""
    from synthea_etl_spark.operators.clean import normalize_column_names

    n = load(spark, sf_dir, "nation")
    # Simulate messy inbound headers, then normalize (pure metadata op).
    messy = n.toDF("N NationKey", "n-name", "N regionKey!")
    return normalize_column_names(messy)


ORACLE_Q03 = """
SELECT n_nationkey AS n_nationkey, n_name AS n_name, n_regionkey AS n_regionkey
FROM nation
"""


def q04_filter_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/X9 regex predicate (`Raw_To_Staging.py:106,118`): rlike filter
    — pushed as a data filter above the pruned scan."""
    p = load(spark, sf_dir, "part")
    return p.filter(F.col("p_type").rlike(r"^(PROMO|ECONOMY)")).select(
        "p_partkey", "p_type", "p_brand"
    )


ORACLE_Q04 = r"""
SELECT p_partkey, p_type, p_brand
FROM part
WHERE regexp_matches(p_type, '^(PROMO|ECONOMY)')
"""


def q05_multivalue_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 split+getItem (`Raw_To_Staging.py:119-125`): split a
    delimited cell into _part1/_part2 siblings, drop the original (P3).
    The reference splits ' or '-cells; same shape on p_type words."""
    p = load(spark, sf_dir, "part")
    parts = F.split(F.col("p_type"), " ")
    # F.get (not getItem): out-of-range index -> NULL under ANSI mode,
    # matching DuckDB list indexing and the reference's getItem-on-
    # missing-part behavior.
    return (
        p.withColumn("p_type_part1", F.get(parts, 0))
        .withColumn("p_type_part2", F.get(parts, 1))
        .drop("p_type")
        .select("p_partkey", "p_type_part1", "p_type_part2")
    )


ORACLE_Q05 = """
SELECT p_partkey,
       str_split(p_type, ' ')[1] AS p_type_part1,
       str_split(p_type, ' ')[2] AS p_type_part2
FROM part
"""


def q06_regex_fix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 regexp_replace (`Raw_To_Staging.py:114-115`): the reference
    strips '-' from phone columns; same global-replace semantics."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_replace(F.col("c_name"), "[#0]", "").alias("name_fixed"),
    )


ORACLE_Q06 = """
SELECT c_custkey, regexp_replace(c_name, '[#0]', '', 'g') AS name_fixed
FROM customer
"""


def q07_null_sentinel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F6 fillna('None') (`Raw_To_Staging.py:128`): null -> literal
    'None' sentinel in string columns. Nulls synthesized via when()."""
    o = load(spark, sf_dir, "orders")
    nulled = o.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return nulled.fillna("None", subset=["o_orderpriority"]).select(
        "o_orderkey", "o_orderpriority"
    )


ORACLE_Q07 = """
SELECT o_orderkey,
       coalesce(nullif(o_orderpriority, '1-URGENT'), 'None') AS o_orderpriority
FROM orders
"""


def q08_cast_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/X10 cast + X4 date_format (`Raw_To_Staging.py:131-137`):
    schema-cast columns; timestamps serialized to ISO-ish strings
    exactly like the reference's timestamp-as-string quirk."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.date_format("l_shipdate", "yyyy-MM-dd'T'H:mm:ss").alias("ship_ts"),
    )


ORACLE_Q08 = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) AS qty_int,
       strftime(l_shipdate, '%Y-%m-%dT%-H:%M:%S') AS ship_ts
FROM lineitem
"""


def q09_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 trim on every string column (`Raw_To_Staging.py:111`)."""
    c = load(spark, sf_dir, "customer")
    padded = c.select(
        "c_custkey",
        F.concat(F.lit("  "), F.col("c_name"), F.lit(" \t")).alias("c_name"),
        F.col("c_mktsegment"),
    )
    from synthea_etl_spark.operators.clean import trim_strings

    return trim_strings(padded)


ORACLE_Q09 = """
SELECT c_custkey, trim(concat('  ', c_name, ' ' || chr(9))) AS c_name,
       trim(c_mktsegment) AS c_mktsegment
FROM customer
"""


# ---------------------------------------------------------------------------
# Dedup (SURVEY §2.5 A2/A3)
# ---------------------------------------------------------------------------


def q10_dedup_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 full-row distinct (`Raw_To_Staging.py:140`) on a projection
    (A4). Partial-aggregate dedup before the exchange."""
    c = load(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").dropDuplicates()


ORACLE_Q10 = """
SELECT DISTINCT c_nationkey, c_mktsegment FROM customer
"""


def q11_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 subset-key dedup, made deterministic: the reference's
    dropDuplicates(['patient']) (`Patient_datamart.py:196`) keeps an
    arbitrary row; we keep the first order by (o_orderdate, o_orderkey)
    via a window row_number — reproducible at any parallelism."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


ORACLE_Q11 = """
SELECT * EXCLUDE (rn) FROM (
  SELECT o.*, row_number() OVER (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders o
) WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Joins (SURVEY §2.4)
# ---------------------------------------------------------------------------


def q12_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 left outer equi-join (`Patient_datamart.py:68-72`): fact side
    keeps all rows; dim side may miss. customer is small enough that
    Catalyst broadcasts it (no shuffle of orders)."""
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return o.join(
        F.broadcast(c), o.o_custkey == c.c_custkey, "left"
    ).select("o_orderkey", "o_custkey", "c_name", "c_mktsegment")


ORACLE_Q12 = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
"""


def q13_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left anti join (`Patient_datamart.py:82-83`): customers with
    no orders (the SCD2 'unchanged rows' shape)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


ORACLE_Q13 = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
"""


def q14_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3 inner equi-join (`Patient_datamart.py:85-87`): supplier x
    nation with dim broadcast."""
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    return s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "inner").select(
        "s_suppkey", "s_name", "n_name"
    )


ORACLE_Q14 = """
SELECT s_suppkey, s_name, n_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
"""


def q15_join_compound_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 compound-key surrogate lookup (`Patient_datamart.py:203-210`):
    build a (nationkey, segment) dim with sha2 surrogate keys (X5/X6),
    then join facts back on BOTH columns. The dim is tiny → broadcast;
    at 100 TB this is the only join shape that avoids shuffling the
    fact table for dimension enrichment."""
    c = load(spark, sf_dir, "customer")
    dim = (
        c.select("c_nationkey", "c_mktsegment")
        .dropDuplicates()
        .withColumn(
            "loc_sk",
            F.sha2(F.concat_ws("|", "c_nationkey", "c_mktsegment"), 256),
        )
    )
    return (
        c.alias("c")
        .join(
            F.broadcast(dim).alias("d"),
            (F.col("c.c_nationkey") == F.col("d.c_nationkey"))
            & (F.col("c.c_mktsegment") == F.col("d.c_mktsegment")),
            "left",
        )
        .select("c.c_custkey", "c.c_name", "d.loc_sk")
    )


ORACLE_Q15 = """
WITH dim AS (
  SELECT c_nationkey, c_mktsegment,
         sha256(concat_ws('|', c_nationkey, c_mktsegment)) AS loc_sk
  FROM (SELECT DISTINCT c_nationkey, c_mktsegment FROM customer)
)
SELECT c.c_custkey, c.c_name, d.loc_sk
FROM customer c LEFT JOIN dim d
  ON c.c_nationkey = d.c_nationkey AND c.c_mktsegment = d.c_mktsegment
"""


def q16_join_chain_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 chained joins (`Patient_datamart.py:212-215`) at TPC-H Q5
    shape: lineitem⋈orders⋈customer⋈nation⋈region, revenue by nation.
    Dims broadcast; the two big tables shuffle once on the join key;
    aggregation is partial before the final exchange."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .transform(
            lambda joined: exact_agg(
                joined,
                keys=["r_name", "n_name"],
                sums={"revenue": revenue},
                count_alias="n_items",
            )
        )
        .orderBy("r_name", "n_name")
    )


ORACLE_Q16 = f"""
SELECT r_name, n_name,
       {sql_msum('l_extendedprice * (1 - l_discount)', 'revenue')},
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY r_name, n_name
"""


# ---------------------------------------------------------------------------
# Set ops / union (SURVEY §2.6)
# ---------------------------------------------------------------------------


def q17_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 3-way unionByName (`Patient_datamart.py:108-113`): branches
    project the same columns in different orders + a provenance lit
    column (P5); unionByName aligns by name, not position."""
    c = load(spark, sf_dir, "customer")
    lo = c.filter(F.col("c_acctbal") < 1000).select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("nm"),
        F.lit("low").alias("band"),
    )
    mid = c.filter(
        (F.col("c_acctbal") >= 1000) & (F.col("c_acctbal") < 5000)
    ).select(
        F.lit("mid").alias("band"),
        F.col("c_name").alias("nm"),
        F.col("c_custkey").alias("k"),
    )
    hi = c.filter(F.col("c_acctbal") >= 5000).select(
        F.col("c_name").alias("nm"),
        F.lit("high").alias("band"),
        F.col("c_custkey").alias("k"),
    )
    return lo.unionByName(mid).unionByName(hi)


ORACLE_Q17 = """
SELECT c_custkey AS k, c_name AS nm, 'low' AS band FROM customer WHERE c_acctbal < 1000
UNION ALL
SELECT c_custkey, c_name, 'mid' FROM customer WHERE c_acctbal >= 1000 AND c_acctbal < 5000
UNION ALL
SELECT c_custkey, c_name, 'high' FROM customer WHERE c_acctbal >= 5000
"""


# ---------------------------------------------------------------------------
# Dashboard shapes (SURVEY §2.9)
# ---------------------------------------------------------------------------


def q18_groupby_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 p.1 'count of gender by gender' shape: single-column
    group-by count over events.event_type."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt"))


ORACLE_Q18 = """
SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type
"""


def q19_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 pp.4-5 'top cities / top medications' shape: GROUP BY +
    ORDER BY count DESC LIMIT N. Spark plans TakeOrderedAndProject —
    no full sort; the tie-break on p_brand makes the cut deterministic."""
    p = load(spark, sf_dir, "part")
    return (
        p.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("p_brand"))
        .limit(10)
    )


ORACLE_Q19 = """
SELECT p_brand, COUNT(*) AS cnt FROM part
GROUP BY p_brand ORDER BY cnt DESC, p_brand ASC LIMIT 10
"""


def q20_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 p.3 'count of patient_id by birthdate' shape: date-bucketed
    histogram (year buckets) over orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("order_year")
    )


ORACLE_Q20 = """
SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year, COUNT(*) AS cnt
FROM orders GROUP BY 1 ORDER BY order_year
"""


# ---------------------------------------------------------------------------
# Window / analytic (beyond-reference; SURVEY §2.8 notes none exist)
# ---------------------------------------------------------------------------


def q21_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window row_number per key (the deterministic replacement the
    reference lacked): latest 3 orders per customer by value."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


ORACLE_Q21 = """
SELECT o_custkey, o_orderkey, o_totalprice, CAST(rk AS INTEGER) AS rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice, row_number() OVER (
    PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) WHERE rk <= 3
"""


def q22_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access: pull a JSON field out of events.props
    and aggregate it (JVM-side get_json_object; no Python UDF)."""
    e = load(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("cnt"))
    )


ORACLE_Q22 = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       COUNT(*) AS cnt
FROM events GROUP BY event_type
"""


def q23_existence_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 existence probe (`Raw_To_Staging.py:118`) done right: the
    reference runs one count() job per string column to decide the
    multi-value split; we compute ALL column probes in ONE aggregate
    pass (max of boolean per column) — one job instead of N."""
    p = load(spark, sf_dir, "part")
    string_cols = ["p_name", "p_brand", "p_type"]
    probes = [
        F.max(F.col(c).rlike(r"\s+[oOóÓ][rR]\s+").cast("int")).alias(f"has_or_{c}")
        for c in string_cols
    ]
    return p.agg(*probes)


ORACLE_Q23 = r"""
SELECT CAST(MAX(CASE WHEN regexp_matches(p_name, '\s+[oOóÓ][rR]\s+') THEN 1 ELSE 0 END) AS INTEGER) AS has_or_p_name,
       CAST(MAX(CASE WHEN regexp_matches(p_brand, '\s+[oOóÓ][rR]\s+') THEN 1 ELSE 0 END) AS INTEGER) AS has_or_p_brand,
       CAST(MAX(CASE WHEN regexp_matches(p_type, '\s+[oOóÓ][rR]\s+') THEN 1 ELSE 0 END) AS INTEGER) AS has_or_p_type
FROM part
"""


QUERIES: dict[str, QuerySpec] = {
    "q01_pricing_summary": QuerySpec(
        q01_pricing_summary, ORACLE_Q01, "flagship TPC-H Q1 pricing summary", ("agg",)
    ),
    "q02_select_alias": QuerySpec(q02_select_alias, ORACLE_Q02, "P1 select+alias", ("project",)),
    "q03_normalize_names": QuerySpec(q03_normalize_names, ORACLE_Q03, "P2 rename-all", ("project",)),
    "q04_filter_rlike": QuerySpec(q04_filter_rlike, ORACLE_Q04, "F1 regex predicate", ("filter",)),
    "q05_multivalue_split": QuerySpec(q05_multivalue_split, ORACLE_Q05, "X3 split parts", ("project",)),
    "q06_regex_fix": QuerySpec(q06_regex_fix, ORACLE_Q06, "X2 regexp_replace", ("project",)),
    "q07_null_sentinel": QuerySpec(q07_null_sentinel, ORACLE_Q07, "F6 fillna sentinel", ("clean",)),
    "q08_cast_format": QuerySpec(q08_cast_format, ORACLE_Q08, "P6 cast + X4 date_format", ("clean",)),
    "q09_trim": QuerySpec(q09_trim, ORACLE_Q09, "X1 trim strings", ("clean",)),
    "q10_dedup_full": QuerySpec(q10_dedup_full, ORACLE_Q10, "A2 full-row distinct", ("dedup",)),
    "q11_dedup_by_key": QuerySpec(q11_dedup_by_key, ORACLE_Q11, "A3 deterministic key dedup", ("dedup",)),
    "q12_join_left": QuerySpec(q12_join_left, ORACLE_Q12, "J1 left equi-join", ("join",)),
    "q13_join_anti": QuerySpec(q13_join_anti, ORACLE_Q13, "J2 left anti join", ("join",)),
    "q14_join_inner": QuerySpec(q14_join_inner, ORACLE_Q14, "J3 inner equi-join", ("join",)),
    "q15_join_compound_dim": QuerySpec(q15_join_compound_dim, ORACLE_Q15, "J4 compound surrogate lookup", ("join",)),
    "q16_join_chain_revenue": QuerySpec(q16_join_chain_revenue, ORACLE_Q16, "J5 chained joins + agg", ("join", "agg")),
    "q17_union_by_name": QuerySpec(q17_union_by_name, ORACLE_Q17, "U1 unionByName", ("set",)),
    "q18_groupby_count": QuerySpec(q18_groupby_count, ORACLE_Q18, "dashboard group-count", ("agg",)),
    "q19_topk": QuerySpec(q19_topk, ORACLE_Q19, "dashboard top-k", ("agg",)),
    "q20_date_histogram": QuerySpec(q20_date_histogram, ORACLE_Q20, "dashboard date histogram", ("agg",)),
    "q21_window_rank": QuerySpec(q21_window_rank, ORACLE_Q21, "window row_number", ("window",)),
    "q22_json_extract": QuerySpec(q22_json_extract, ORACLE_Q22, "JSON field extract + agg", ("semi",)),
    "q23_existence_probe": QuerySpec(q23_existence_probe, ORACLE_Q23, "one-pass multi-col probe", ("agg",)),
}
