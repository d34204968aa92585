"""External JSON schema registry -> StructType
(reference: Glue_Scripts/Raw_To_Staging.py:72-98).

The reference stores per-table schemas as ``schemas/<table>.json``
lists of ``{"name": ..., "type": ...}`` on S3 and maps type strings to
Spark types with a string fallback. Same contract here, filesystem- or
dict-backed, with the identical type mapping (`:79-94`) including the
everything-nullable rule (`:95`).
"""

from __future__ import annotations

import json
import os

from pyspark.sql.types import (
    DateType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Reference mapping Raw_To_Staging.py:79-94; unknown -> string fallback.
_TYPE_MAP = {
    "string": StringType(),
    "int": IntegerType(),
    "integer": IntegerType(),
    "date": DateType(),
    "long": LongType(),
    "bigint": LongType(),
    "double": DoubleType(),
    "timestamp": TimestampType(),
}


def schema_from_fields(fields: list[dict]) -> StructType:
    """[{name, type}] -> StructType; all fields nullable (`:95`)."""
    return StructType(
        [
            StructField(f["name"], _TYPE_MAP.get(str(f["type"]).lower(), StringType()), True)
            for f in fields
        ]
    )


def load_schema(registry_dir: str, table: str) -> StructType:
    """Read ``<registry_dir>/<table>.json`` (the S3 GET analog)."""
    with open(os.path.join(registry_dir, f"{table}.json")) as fh:
        return schema_from_fields(json.load(fh))


#: The reference's complete load unit: 18 CSV tables per load date
#: (Automation/Lambda:102 counts to 18 before triggering the workflow).
SYNTHEA_TABLES = (
    "patients",
    "encounters",
    "conditions",
    "allergies",
    "medications",
    "observations",
    "payers",
    "payer_transitions",
    "careplans",
    "claims",
    "claims_transactions",
    "devices",
    "imaging_studies",
    "immunizations",
    "organizations",
    "procedures",
    "providers",
    "supplies",
)


def bundled_registry_dir() -> str:
    """Directory of the bundled 18-table Synthea schema registry
    (resources/schemas/<table>.json, one file per SYNTHEA_TABLES entry;
    types per FIXTURES.md / the reference's Tables_Description.xlsx
    sheet1)."""
    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "resources", "schemas"
    )


def save_schema(registry_dir: str, table: str, schema: StructType) -> None:
    os.makedirs(registry_dir, exist_ok=True)
    fields = [{"name": f.name, "type": f.dataType.simpleString()} for f in schema.fields]
    with open(os.path.join(registry_dir, f"{table}.json"), "w") as fh:
        json.dump(fields, fh, indent=2)
