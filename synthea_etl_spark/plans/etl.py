"""ETL-surface queries: the reference's cleaning pipeline, SCD2 merge,
and dirty-CSV repair exercised over TESTDATA with DuckDB oracles.

The dirt is synthesized deterministically from the clean tables
(padding, nulls, ' or ' multi-value cells, messy header names), so the
oracle can reproduce the expected post-clean state in pure SQL.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from synthea_etl_spark.plans.common import QuerySpec, dsum, load, sql_dsum

TS1 = datetime(2024, 1, 1)
TS2 = datetime(2024, 2, 1)


def _dirty_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically dirtied customer projection: messy header
    names, padded strings, nulls (custkey%7==0), ' or ' multi-value
    cells (custkey%5==0)."""
    c = load(spark, sf_dir, "customer")
    seg = F.when(F.col("c_custkey") % 7 == 0, F.lit(None)).otherwise(
        F.when(
            F.col("c_custkey") % 5 == 0,
            F.concat(F.col("c_mktsegment"), F.lit(" or EXTRA")),
        ).otherwise(F.col("c_mktsegment"))
    )
    return c.select(
        F.col("c_custkey").cast("string").alias("C CustKey!"),
        F.concat(F.lit("  "), F.col("c_name"), F.lit("  ")).alias(" Name "),
        seg.alias("Segment"),
        F.col("c_nationkey").cast("string").alias("nation key"),
    )


def q24_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Raw->Staging clean chain (Raw_To_Staging.py:100-140):
    normalize names -> trim -> multivalue split (one-pass probe) ->
    null->'None' sentinel -> schema cast -> full-row dedup."""
    from synthea_etl_spark.operators.clean import clean_pipeline
    from synthea_etl_spark.sources.schema_registry import schema_from_fields

    schema = schema_from_fields(
        [
            {"name": "c_custkey", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "nation_key", "type": "int"},
            {"name": "segment_part1", "type": "string"},
            {"name": "segment_part2", "type": "string"},
        ]
    )
    return clean_pipeline(_dirty_customer(spark, sf_dir), schema=schema)


ORACLE_Q24 = """
SELECT DISTINCT
  CAST(c_custkey AS BIGINT) AS c_custkey,
  c_name AS name,
  CAST(c_nationkey AS INTEGER) AS nation_key,
  CASE WHEN c_custkey % 7 = 0 THEN 'None' ELSE c_mktsegment END AS segment_part1,
  CASE WHEN c_custkey % 7 = 0 THEN 'None'
       WHEN c_custkey % 5 = 0 THEN 'EXTRA'
       ELSE 'None' END AS segment_part2
FROM customer
"""


def q25_scd2_two_loads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic SCD2 merge (Patient_datamart.py:45-115 semantics,
    corrected — see operators/scd2.py): initial load of a customer
    snapshot, then a second snapshot where every custkey%10==0 row has
    a changed attribute. Final dim state: changed keys carry an
    expired v1 + active v2; all other keys one active v1."""
    from synthea_etl_spark.operators.scd2 import scd2_merge

    c = load(spark, sf_dir, "customer")
    snap1 = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("segment"),
    )
    snap2 = snap1.withColumn(
        "name",
        F.when(F.col("k") % 10 == 0, F.concat(F.col("name"), F.lit("-v2"))).otherwise(
            F.col("name")
        ),
    )
    # localCheckpoint (r15, guide §1.2): the second merge consumes
    # `existing` four times (active x3 + history), so the chained
    # in-memory dim state re-planned the whole first load each time
    # (the executed plan scanned customer 8x). Production persists
    # between loads (write_swap) — this barrier is that same
    # boundary for the in-query chain.
    dim1 = scd2_merge(
        None, snap1, ["k"], ["name", "segment"], TS1
    ).localCheckpoint()
    return scd2_merge(dim1, snap2, ["k"], ["name", "segment"], TS2)


ORACLE_Q25 = """
WITH base AS (
  SELECT c_custkey AS k, c_name AS name, c_mktsegment AS segment FROM customer
)
SELECT k, name, segment,
       sha256(concat_ws('|', k, '2024-01-01 00:00:00')) AS sk,
       sha256(concat_ws('|', name, segment)) AS row_hash,
       TIMESTAMP '2024-01-01' AS created_at,
       CASE WHEN k % 10 = 0 THEN TIMESTAMP '2024-02-01'
            ELSE TIMESTAMP '2024-01-01' END AS modified_at,
       (k % 10 <> 0) AS is_active
FROM base
UNION ALL
SELECT k, name || '-v2', segment,
       sha256(concat_ws('|', k, '2024-02-01 00:00:00')),
       sha256(concat_ws('|', name || '-v2', segment)),
       TIMESTAMP '2024-02-01', TIMESTAMP '2024-02-01', TRUE
FROM base WHERE k % 10 = 0
"""


def q26_csv_repair_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/S6 CSV scan+sink and the dirty-CSV repair reader
    (Source_Raw_Dynamic.py:59-123 replacement): write documents
    metadata as CSV, repair-read it back all-string. Exercises header
    handling (the reference's header-leak bug is fixed: no header row
    in the output) and quoted-comma parsing."""
    import tempfile

    from synthea_etl_spark.sources.csv_repair import repair_csv

    d = load(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    out = tempfile.gettempdir() + "/sparkgraft_csv_roundtrip"
    d.write.mode("overwrite").option("header", True).csv(out)
    return repair_csv(spark, out)


ORACLE_Q26 = """
SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source FROM documents
"""


def q27_star_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema mart assembly (Patient_datamart.py:189-230 shape)
    over TPC-H: SCD2 dim_nation initial load, then fact_customer =
    customer grain with the dim surrogate key resolved by a broadcast
    lookup (J4), pre-aggregated order count + exact decimal spend
    joined in (A1 + J5 chained left joins), and per-column null fill
    (F7). The dim is broadcast — the fact side never shuffles for
    enrichment; counts aggregate BEFORE the join so the join input is
    one row per key."""
    from synthea_etl_spark.operators.scd2 import scd2_merge

    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")

    dim_nation = scd2_merge(
        None,
        n.select(
            F.col("n_nationkey").alias("nation_key"),
            F.col("n_name").alias("nation_name"),
            F.col("n_regionkey").alias("region_key"),
        ),
        ["nation_key"],
        ["nation_name", "region_key"],
        TS1,
    )
    ord_stats = o.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count(F.lit(1)).alias("total_orders"),
        dsum("o_totalprice", "total_spend"),
    )
    lookup = dim_nation.filter(F.col("is_active")).select(
        "nation_key", F.col("sk").alias("nation_sk")
    )
    return (
        c.select(
            F.col("c_custkey").alias("customer_id"),
            F.col("c_nationkey").alias("nation_key"),
        )
        .join(F.broadcast(lookup), on="nation_key", how="left")
        .join(ord_stats, on="customer_id", how="left")
        .fillna({"total_orders": 0, "total_spend": 0.0})
        .select("customer_id", "nation_sk", "total_orders", "total_spend")
    )


ORACLE_Q27 = f"""
WITH dimn AS (
  SELECT n_nationkey AS nation_key,
         sha256(concat_ws('|', n_nationkey, '2024-01-01 00:00:00')) AS nation_sk
  FROM nation
),
os AS (
  SELECT o_custkey AS customer_id, COUNT(*) AS total_orders,
         {sql_dsum('o_totalprice', 'total_spend')}
  FROM orders GROUP BY 1
)
SELECT c_custkey AS customer_id, nation_sk,
       COALESCE(total_orders, 0) AS total_orders,
       COALESCE(total_spend, 0.0) AS total_spend
FROM customer
LEFT JOIN dimn ON c_nationkey = nation_key
LEFT JOIN os ON customer_id = c_custkey
"""


def q81_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC journal apply (MERGE-style upsert/delete collapse): a
    synthetic change log over customers — seq 1 insert for every key,
    seq 2 update for custkey%4==0, seq 3 delete for custkey%10==0 —
    collapsed to final state by keeping each key's highest-seq op and
    dropping deletes. One window shuffle on the key; the idiom that
    turns an append-only log into a snapshot without a transactional
    table format."""
    from synthea_etl_spark.operators.clean import dedup_by_key

    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    ins = c.select(
        "c_custkey", F.lit(1).alias("seq"), F.lit("I").alias("op"), F.col("c_name").alias("name")
    )
    upd = (
        c.filter(F.col("c_custkey") % 4 == 0)
        .select(
            "c_custkey",
            F.lit(2).alias("seq"),
            F.lit("U").alias("op"),
            F.concat(F.col("c_name"), F.lit("-updated")).alias("name"),
        )
    )
    dele = c.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey", F.lit(3).alias("seq"), F.lit("D").alias("op"), F.lit(None).cast("string").alias("name")
    )
    log = ins.unionByName(upd).unionByName(dele)
    latest = dedup_by_key(log, keys=["c_custkey"], order_by=[F.desc("seq")])
    return latest.filter(F.col("op") != "D").select("c_custkey", "name")


ORACLE_Q81 = """
SELECT c_custkey,
       CASE WHEN c_custkey % 4 = 0 THEN c_name || '-updated' ELSE c_name END AS name
FROM customer
WHERE c_custkey % 10 <> 0
"""


def q82_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-travel read over an SCD2 dimension: the version of every
    key that was active at 2024-01-15 (after load 1, before load 2) —
    rows whose validity interval covers the timestamp. Pure filter
    over the q25 dimension state; at scale this is a partition-pruned
    scan, no reconstruction."""
    dim = q25_scd2_two_loads(spark, sf_dir)
    asof = F.lit("2024-01-15 00:00:00").cast("timestamp_ntz")
    return dim.filter(
        (F.col("created_at") <= asof)
        & (F.col("is_active") | (F.col("modified_at") > asof))
    ).select("k", "name", "segment", "is_active")


ORACLE_Q82 = """
SELECT k, c_name AS name, c_mktsegment AS segment, (k % 10 <> 0) AS is_active
FROM (SELECT c_custkey AS k, c_name, c_mktsegment FROM customer) base
"""


QUERIES: dict[str, QuerySpec] = {
    "q24_clean_pipeline": QuerySpec(
        q24_clean_pipeline, ORACLE_Q24, "full Raw->Staging clean chain", ("etl",)
    ),
    "q25_scd2_two_loads": QuerySpec(
        q25_scd2_two_loads, ORACLE_Q25, "SCD2 merge across two snapshot loads", ("etl",)
    ),
    "q26_csv_repair_roundtrip": QuerySpec(
        q26_csv_repair_roundtrip, ORACLE_Q26, "dirty-CSV repair round trip", ("etl",)
    ),
    "q27_star_mart": QuerySpec(
        q27_star_mart,
        ORACLE_Q27,
        "star-mart fact assembly: SCD2 dim lookup + pre-agg measures",
        ("etl", "mart"),
    ),
    "q81_cdc_apply": QuerySpec(
        q81_cdc_apply, ORACLE_Q81, "CDC journal collapse to snapshot", ("etl",)
    ),
    "q82_scd2_asof": QuerySpec(
        q82_scd2_asof, ORACLE_Q82, "SCD2 time-travel (as-of) read", ("etl", "mart")
    ),
}
