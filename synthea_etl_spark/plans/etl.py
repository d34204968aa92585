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

from synthea_etl_spark.plans.common import QuerySpec, load

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
    dim1 = scd2_merge(None, snap1, ["k"], ["name", "segment"], TS1)
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
}
