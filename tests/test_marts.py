"""Golden end-to-end test of the patient mart (SURVEY §5 item 3):
Synthea-shaped fixture rows -> build_patient_mart -> star invariants.

Reference semantics: Glue_Scripts/Patient_datamart.py:117-230 (6 SCD2
dims + fact_patient with counts, payer, location surrogate key), with
the documented corrections (deterministic latest-payer pick, preserved
history, explicit load_ts).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from synthea_etl_spark.operators.marts import (
    PATIENT_MART_DIMS,
    build_patient_mart,
)

TS1 = datetime(2024, 1, 1)
TS2 = datetime(2024, 2, 1)


def _staged(spark):
    patients = spark.createDataFrame(
        [
            ("p1", "1980-01-01", "Ann", "Smith", "M", "white", "nonhispanic",
             "F", "1 Elm St", "Boston", "MA", "02118"),
            ("p2", "1990-05-05", "Bob", "Jones", "S", "black", "hispanic",
             "M", "2 Oak Av", "Salem", "MA", "01970"),
            ("p3", "2000-09-09", "Cai", "Wu", "S", "asian", "nonhispanic",
             "M", "1 Elm St", "Boston", "MA", "02118"),
        ],
        "id string, birthdate string, first string, last string, "
        "marital string, race string, ethnicity string, gender string, "
        "address string, city string, state string, zip string",
    )
    payers = spark.createDataFrame(
        [("pay1", "Acme Health", "PRIVATE"), ("pay2", "Medicare", "GOVERNMENT")],
        "id string, name string, ownership string",
    )
    allergies = spark.createDataFrame(
        [("p1", "c1", "Peanut", "allergy", "food")],
        "patient string, code string, description string, type string, category string",
    )
    medications = spark.createDataFrame(
        [("p1", "m1", "Aspirin"), ("p2", "m2", "Ibuprofen")],
        "patient string, code string, description string",
    )
    observations = spark.createDataFrame(
        [("p1", "o1", "Heart rate", "bpm")],
        "patient string, code string, description string, units string",
    )
    encounters = spark.createDataFrame(
        [("e1", "p1"), ("e2", "p1"), ("e3", "p2")],
        "id string, patient string",
    )
    conditions = spark.createDataFrame(
        [("p1", "x1"), ("p1", "x2"), ("p1", "x3")],
        "patient string, code string",
    )
    transitions = spark.createDataFrame(
        [
            ("p1", "pay1", "2020-01-01"),
            ("p1", "pay2", "2022-01-01"),  # later -> the kept payer for p1
            ("p2", "pay1", "2021-01-01"),
        ],
        "patient string, payer string, start_date string",
    )
    return {
        "patients": patients,
        "payers": payers,
        "allergies": allergies,
        "medications": medications,
        "observations": observations,
        "encounters": encounters,
        "conditions": conditions,
        "payer_transitions": transitions,
    }


@pytest.fixture(scope="module")
def mart(spark):
    return build_patient_mart(_staged(spark), None, TS1)


def test_all_tables_built(mart):
    assert set(mart) == {s.name for s in PATIENT_MART_DIMS} | {"fact_patient"}


def test_one_active_row_per_business_key(mart):
    for spec in PATIENT_MART_DIMS:
        dim = mart[spec.name]
        active = dim.filter(F.col("is_active"))
        total, distinct = active.count(), active.select(spec.keys).distinct().count()
        assert total == distinct > 0, spec.name


def test_surrogate_key_is_sha2_of_keys_and_load_ts(mart, spark):
    dim = mart["dim_payer"]
    row = dim.filter(F.col("payer_id") == "pay1").collect()[0]
    expected = spark.sql(
        f"SELECT sha2(concat_ws('|', 'pay1', '{TS1}'), 256) AS sk"
    ).collect()[0].sk
    assert row.sk == expected


def test_fact_counts_and_payer_and_location(mart):
    fact = {r.patient_id: r for r in mart["fact_patient"].collect()}
    assert set(fact) == {"p1", "p2", "p3"}
    assert (fact["p1"].total_encounters, fact["p1"].total_conditions) == (2, 3)
    assert (fact["p2"].total_encounters, fact["p2"].total_conditions) == (1, 0)
    # F7 null-fill: p3 has no encounters/conditions -> 0, not null
    assert (fact["p3"].total_encounters, fact["p3"].total_conditions) == (0, 0)
    # deterministic latest payer (window, not arbitrary dropDuplicates)
    assert fact["p1"].payer_id == "pay2"
    assert fact["p2"].payer_id == "pay1"
    assert fact["p3"].payer_id is None
    # J4 compound surrogate lookup: same address 4-tuple -> same sk
    assert fact["p1"].location_sk == fact["p3"].location_sk is not None
    assert fact["p2"].location_sk != fact["p1"].location_sk


def test_location_sk_resolves_to_active_dim_row(mart):
    loc = {
        r.sk: r
        for r in mart["dim_location"].filter(F.col("is_active")).collect()
    }
    for r in mart["fact_patient"].collect():
        assert r.location_sk in loc


def test_second_load_versions_changed_patient(spark, mart):
    staged2 = _staged(spark)
    staged2["patients"] = staged2["patients"].withColumn(
        "marital",
        F.when(F.col("id") == "p1", F.lit("S")).otherwise(F.col("marital")),
    )
    existing = {s.name: mart[s.name] for s in PATIENT_MART_DIMS}
    mart2 = build_patient_mart(staged2, existing, TS2)

    dp = mart2["dim_patient"]
    p1 = dp.filter(F.col("patient_id") == "p1").orderBy("created_at").collect()
    assert [(r.marital, r.is_active) for r in p1] == [("M", False), ("S", True)]
    # unchanged keys keep exactly their v1 active row
    others = dp.filter(F.col("patient_id") != "p1").collect()
    assert all(r.is_active for r in others) and len(others) == 2


def test_rerun_same_snapshot_is_idempotent(spark, mart):
    existing = {s.name: mart[s.name] for s in PATIENT_MART_DIMS}
    mart2 = build_patient_mart(_staged(spark), existing, TS2)
    for spec in PATIENT_MART_DIMS:
        a = sorted(map(tuple, mart[spec.name].collect()))
        b = sorted(map(tuple, mart2[spec.name].collect()))
        assert a == b, spec.name
