"""Golden end-to-end: the reference's complete unit of work — an
18-table Synthea load date (Automation/Lambda:102 barrier) — through
landing -> repair -> registry clean -> partitioned staging -> SCD2
patient mart, with the staged schemas checked against the bundled
registry and the fact recomputed independently by DuckDB.
"""

from __future__ import annotations

import json
import os

import duckdb
import pytest
from pyspark.sql import functions as F

from synthea_etl_spark.operators.marts import PATIENT_MART_DIMS
from synthea_etl_spark.pipeline import run_batch_pipeline
from synthea_etl_spark.sources.schema_registry import (
    SYNTHEA_TABLES,
    bundled_registry_dir,
)
from synthea_etl_spark.streaming.ingest import completeness_barrier
from tests.synthea_fixtures import write_landing

LOAD_DATE = "2024-03-01"

# registry type -> expected staged Spark dtype. Timestamps stage as
# ISO strings — the reference's documented quirk
# (Raw_To_Staging.py:133-135, clean.cast_to_schema).
STAGED_TYPE = {
    "string": "string",
    "int": "int",
    "long": "bigint",
    "double": "double",
    "date": "date",
    "timestamp": "string",
}


@pytest.fixture(scope="module")
def mart_run(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("synthea18")
    landing = str(root / "landing")
    write_landing(landing, LOAD_DATE)
    staging = str(root / "staging")
    mart_dir = str(root / "mart")
    os.makedirs(mart_dir)
    mart = run_batch_pipeline(
        spark,
        landing,
        bundled_registry_dir(),
        staging,
        mart_dir,
        LOAD_DATE,
        list(SYNTHEA_TABLES),
    )
    return {"landing": landing, "staging": staging, "mart": mart}


def test_barrier_fires_only_at_18(spark, tmp_path):
    landing = str(tmp_path / "landing")
    write_landing(landing, LOAD_DATE)
    tables = list(SYNTHEA_TABLES)
    assert completeness_barrier(landing, LOAD_DATE, tables)
    # 17/18 present -> hold the workflow (Lambda:88-107)
    held = os.path.join(landing, LOAD_DATE, "supplies")
    os.rename(held, held + ".pending")
    try:
        assert not completeness_barrier(landing, LOAD_DATE, tables)
    finally:
        os.rename(held + ".pending", held)
    assert completeness_barrier(landing, LOAD_DATE, tables)
    assert not completeness_barrier(landing, "2024-03-02", tables)


def test_all_18_staged_schemas_match_registry(spark, mart_run):
    reg = bundled_registry_dir()
    for table in SYNTHEA_TABLES:
        staged = spark.read.parquet(os.path.join(mart_run["staging"], table))
        with open(os.path.join(reg, f"{table}.json")) as fh:
            fields = json.load(fh)
        got = dict(staged.dtypes)
        assert set(got) == {f["name"] for f in fields} | {"load_date"}, table
        for f in fields:
            assert got[f["name"]] == STAGED_TYPE[f["type"]], (table, f)
        assert staged.count() > 0, table


def test_cleaning_semantics_survive_to_staging(spark, mart_run):
    st = mart_run["staging"]
    pats = {r.id: r for r in spark.read.parquet(f"{st}/patients").collect()}
    assert set(pats) == {"p1", "p2", "p3"}
    assert pats["p1"].first == "First0"                    # trimmed
    assert pats["p1"].address == "1 Elm St, Apt 1"         # quoted comma kept
    assert pats["p1"].zip == 2100                          # int cast
    assert pats["p3"].zip is None                          # ragged pad -> null
    orgs = spark.read.parquet(f"{st}/organizations").collect()
    assert all("-" not in r.phone for r in orgs)           # phone fix
    obs = spark.read.parquet(f"{st}/observations").collect()
    split = [r for r in obs if r.description == "Body Height"]
    assert len(split) == 1 and split[0].value == "180.1"   # ' or ' part1
    alg = spark.read.parquet(f"{st}/allergies")
    assert alg.filter(F.col("stop").isNotNull()).count() == 0  # all-null kept
    assert alg.count() == 3
    # exact-duplicate condition row deduped: 4 landed, 3 staged
    assert spark.read.parquet(f"{st}/conditions").count() == 3
    enc = {r.id: r for r in spark.read.parquet(f"{st}/encounters").collect()}
    assert enc["e4"].reasoncode is None                    # '' -> null cast
    assert enc["e4"].reasondescription == "None"           # string sentinel
    assert enc["e1"].start == "2020-01-01T10:00:00"        # ISO string quirk


def test_scd2_dims_one_active_row_per_key(mart_run):
    mart = mart_run["mart"]
    for spec in PATIENT_MART_DIMS:
        dim = mart[spec.name]
        active = dim.filter(F.col("is_active"))
        assert active.count() == active.select(*spec.keys).distinct().count(), (
            spec.name
        )


def test_fact_matches_duckdb_recompute(mart_run):
    st = mart_run["staging"]
    con = duckdb.connect()
    expected = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(
            f"""
            SELECT p.id,
                   COALESCE(e.cnt, 0) AS total_encounters,
                   COALESCE(c.cnt, 0) AS total_conditions,
                   t.payer AS payer_id
            FROM '{st}/patients/*/*.parquet' p
            LEFT JOIN (SELECT patient, COUNT(*) AS cnt
                       FROM '{st}/encounters/*/*.parquet' GROUP BY patient) e
              ON e.patient = p.id
            LEFT JOIN (SELECT patient, COUNT(*) AS cnt
                       FROM '{st}/conditions/*/*.parquet' GROUP BY patient) c
              ON c.patient = p.id
            LEFT JOIN (SELECT patient, payer
                       FROM (SELECT patient, payer, ROW_NUMBER() OVER (
                                 PARTITION BY patient
                                 ORDER BY start_date DESC, payer ASC) AS rn
                             FROM '{st}/payer_transitions/*/*.parquet') WHERE rn = 1) t
              ON t.patient = p.id
            """
        ).fetchall()
    }
    got = {
        r.patient_id: (r.total_encounters, r.total_conditions, r.payer_id)
        for r in mart_run["mart"]["fact_patient"].collect()
    }
    assert got == expected
    assert got["p1"] == (2, 1, "pay2")  # latest payer wins deterministically
