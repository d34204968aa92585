"""Star-schema patient mart (reference: Glue_Scripts/Patient_datamart.py:117-230).

The reference builds 6 dimensions + 1 fact with copy-pasted per-dim
code; here each dim is a declarative ``DimSpec`` (source table,
projection, business keys) fed through the generic SCD2 merge, and the
fact assembly is the reference's chained-left-join shape (J5) with the
aggregation counts computed as partial-agg group-bys.

Scale notes: dims are orders-of-magnitude smaller than facts, so every
fact-side enrichment join broadcasts the dim (the reference relies on
Catalyst defaults; we mark it explicitly). Count subqueries aggregate
BEFORE joining (small per-key result), never after.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from synthea_etl_spark.operators.scd2 import scd2_merge


@dataclass(frozen=True)
class DimSpec:
    """One SCD2 dimension: source staged table -> projected attrs."""

    name: str
    source: str  # staged table name
    select: dict[str, str]  # out_col -> source_col
    keys: list[str]  # business key columns (post-rename)

    def project(self, df: DataFrame) -> DataFrame:
        # P1 select+alias, F5 dropna, A4 distinct — the reference's
        # per-dim prep (Patient_datamart.py:119-121 et al.)
        cols = [F.col(src).alias(dst) for dst, src in self.select.items()]
        return df.select(*cols).dropna().dropDuplicates()


# The reference's dimensions (Patient_datamart.py:117-201; README.md:107-111)
PATIENT_MART_DIMS: tuple[DimSpec, ...] = (
    DimSpec(
        "dim_patient",
        "patients",
        {
            "patient_id": "id",
            "birthdate": "birthdate",
            "full_name": "full_name",  # concat_ws(' ', first, last) upstream
            "marital": "marital",
            "race": "race",
            "ethnicity": "ethnicity",
            "gender": "gender",
        },
        ["patient_id"],
    ),
    DimSpec(
        "dim_location",
        "patients",
        {
            "address": "address",
            "city": "city",
            "state": "state",
            "zip_code": "zip",
        },
        ["address", "city", "state", "zip_code"],
    ),
    DimSpec(
        "dim_payer",
        "payers",
        {
            "payer_id": "id",
            "payer_name": "name",
            "ownership": "ownership",
        },
        ["payer_id"],
    ),
    DimSpec(
        "dim_allergies",
        "allergies",
        {
            "patient_id": "patient",
            "code": "code",
            "description": "description",
            "type": "type",
            "category": "category",
        },
        ["patient_id", "code"],
    ),
    DimSpec(
        "dim_medication",
        "medications",
        {
            "patient_id": "patient",
            "code": "code",
            "description": "description",
        },
        ["patient_id", "code"],
    ),
    DimSpec(
        "dim_observation",
        "observations",
        {
            "patient_id": "patient",
            "code": "code",
            "description": "description",
            "units": "units",
        },
        ["patient_id", "code"],
    ),
)


def prepare_patients(patients: DataFrame) -> DataFrame:
    """Derived columns the reference adds before dim builds: full name
    via concat_ws (X5, Patient_datamart.py:154)."""
    return patients.withColumn(
        "full_name", F.concat_ws(" ", F.col("first"), F.col("last"))
    )


def build_dim(
    spec: DimSpec,
    staged: dict[str, DataFrame],
    existing: DataFrame | None,
    load_ts: datetime,
) -> DataFrame:
    src = staged[spec.source]
    if spec.source == "patients":
        src = prepare_patients(src)
    snap = spec.project(src)
    attrs = [c for c in snap.columns if c not in spec.keys]
    return scd2_merge(existing, snap, spec.keys, attrs, load_ts)


def build_fact_patient(
    staged: dict[str, DataFrame], dim_location: DataFrame
) -> DataFrame:
    """fact_patient (reference: Patient_datamart.py:189-230): one row
    per patient with encounter/condition counts, payer and location
    surrogate keys."""
    patients = prepare_patients(staged["patients"])
    encounters = staged["encounters"]
    conditions = staged["conditions"]
    transitions = staged.get("payer_transitions")

    # A1 group-by counts, aggregated BEFORE the join (small output)
    enc_counts = encounters.groupBy("patient").agg(
        F.count(F.lit(1)).alias("total_encounters")
    )
    cond_counts = conditions.groupBy("patient").agg(
        F.count(F.lit(1)).alias("total_conditions")
    )

    base = patients.select(
        F.col("id").alias("patient_id"),
        "address",
        "city",
        "state",
        F.col("zip").alias("zip_code"),
    )

    # J4: 4-column compound surrogate-key lookup into dim_location
    # (Patient_datamart.py:203-210); dim broadcast, fact not shuffled.
    loc = dim_location.filter(F.col("is_active")).select(
        "address", "city", "state", "zip_code", F.col("sk").alias("location_sk")
    )
    fact = base.join(
        F.broadcast(loc), on=["address", "city", "state", "zip_code"], how="left"
    ).select("patient_id", "location_sk")

    # J5 chained left joins (Patient_datamart.py:212-215)
    fact = (
        fact.join(
            enc_counts.withColumnRenamed("patient", "patient_id"),
            on="patient_id",
            how="left",
        )
        .join(
            cond_counts.withColumnRenamed("patient", "patient_id"),
            on="patient_id",
            how="left",
        )
    )
    if transitions is not None:
        # latest payer per patient, deterministically (window, not
        # dropDuplicates-arbitrary as at Patient_datamart.py:196)
        from synthea_etl_spark.operators.clean import dedup_by_key

        latest = dedup_by_key(
            transitions.select("patient", "payer", "start_date"),
            keys=["patient"],
            order_by=[F.desc("start_date"), F.asc("payer")],
        ).select(F.col("patient").alias("patient_id"), F.col("payer").alias("payer_id"))
        fact = fact.join(latest, on="patient_id", how="left")

    # F7 per-column null fill (Patient_datamart.py:222)
    return fact.fillna({"total_encounters": 0, "total_conditions": 0})


def build_patient_mart(
    staged: dict[str, DataFrame],
    existing_dims: dict[str, DataFrame] | None,
    load_ts: datetime,
) -> dict[str, DataFrame]:
    """Full mart refresh: all SCD2 dims + fact. Returns name->DataFrame."""
    existing_dims = existing_dims or {}
    out: dict[str, DataFrame] = {}
    for spec in PATIENT_MART_DIMS:
        if spec.source not in staged:
            continue
        out[spec.name] = build_dim(spec, staged, existing_dims.get(spec.name), load_ts)
    if "dim_location" in out and "encounters" in staged and "conditions" in staged:
        out["fact_patient"] = build_fact_patient(staged, out["dim_location"])
    return out
