"""Deterministic dirty-CSV fixtures for the full 18-table Synthea load.

Generates one landing CSV per SYNTHEA_TABLES entry for a load date,
column set driven by the bundled schema registry
(synthea_etl_spark/resources/schemas), with the dirt features the
cleaning spec targets (FIXTURES.md §1 "Dirt features"):

- ragged rows (short row padded, long row truncated)  -> patients
- unnamed trailing header column (dropped)            -> patients
- quoted comma that must not split                    -> patients
- mixed-case / punctuated header names                -> patients
- whitespace padding                                  -> patients
- phone dashes stripped                               -> organizations
- ' or ' multi-value cells                            -> observations
- exact duplicate rows                                -> conditions
- multiple rows per patient (latest-payer dedup)      -> payer_transitions
- an all-null column preserved through the pipeline   -> allergies.stop
- empty fields -> 'None' sentinel -> null after cast  -> throughout

FK spine: every clinical table's patient -> patients.id, encounter ->
encounters.id, payer -> payers.id (reference: FIXTURES.md §1 intro).
"""

from __future__ import annotations

import json
import os

from synthea_etl_spark.sources.schema_registry import (
    SYNTHEA_TABLES,
    bundled_registry_dir,
)

PATIENT_IDS = ["p1", "p2", "p3"]
ENCOUNTER_IDS = ["e1", "e2", "e3", "e4"]
# e1,e2 -> p1; e3 -> p2; e4 -> p3 (fact_patient count assertions)
ENCOUNTER_PATIENT = {"e1": "p1", "e2": "p1", "e3": "p2", "e4": "p3"}
PAYER_IDS = ["pay1", "pay2"]


def _csv_cell(v: str) -> str:
    if "," in v or '"' in v:
        return '"' + v.replace('"', '""') + '"'
    return v


def _generic_value(table: str, col: str, typ: str, i: int) -> str:
    """Deterministic typed value with FK-aware overrides."""
    if col in ("patient", "patientid"):
        return PATIENT_IDS[i % len(PATIENT_IDS)]
    if col in ("encounter", "encounters"):
        return ENCOUNTER_IDS[i % len(ENCOUNTER_IDS)]
    if col == "payer":
        return PAYER_IDS[i % len(PAYER_IDS)]
    if col == "id":
        return f"{table}_{i + 1}"
    if typ in ("int", "long", "bigint"):
        return str(100 + 7 * i)
    if typ == "double":
        return f"{i + 1}.25"
    if typ == "date":
        return f"1980-0{(i % 8) + 1}-1{i % 9}"
    if typ == "timestamp":
        return f"2020-01-0{(i % 8) + 1}T10:0{i % 6}:00Z"
    return f"{col}_{i}"


def _generic_rows(table: str, fields: list[dict], n: int = 3) -> tuple[str, list[list[str]]]:
    header = ",".join(f["name"] for f in fields)
    rows = [
        [_generic_value(table, f["name"], f["type"], i) for f in fields]
        for i in range(n)
    ]
    return header, rows


def write_landing(landing_dir: str, load_date: str) -> None:
    """Write all 18 tables' dirty CSVs under <landing>/<date>/<table>/."""
    reg = bundled_registry_dir()
    base = os.path.join(landing_dir, load_date)
    for table in SYNTHEA_TABLES:
        with open(os.path.join(reg, f"{table}.json")) as fh:
            fields = json.load(fh)
        tdir = os.path.join(base, table)
        os.makedirs(tdir, exist_ok=True)
        header, rows = _generic_rows(table, fields)
        by_name = {f["name"]: idx for idx, f in enumerate(fields)}

        if table == "patients":
            # mixed-case/punctuated headers + unnamed trailing column;
            # quoted comma; whitespace padding; ragged short + long rows
            cols = [f["name"] for f in fields]
            ugly = [c.upper() if i % 2 == 0 else c.title() for i, c in enumerate(cols)]
            header = ",".join(ugly) + ","  # trailing unnamed column
            for i, r in enumerate(rows):
                r[by_name["id"]] = PATIENT_IDS[i]
                r[by_name["first"]] = f"  First{i} "
                r[by_name["address"]] = f"{i + 1} Elm St, Apt {i + 1}"
                r[by_name["zip"]] = str(2100 + i)
            rows[0] = rows[0] + ["junk"]          # long row: truncated
            rows[2] = rows[2][: by_name["zip"]]   # short row: padded ->
            #   zip/lat/lon/... become '' -> 'None' -> null after cast
        elif table == "encounters":
            for i, r in enumerate(rows):
                r[by_name["id"]] = ENCOUNTER_IDS[i]
                r[by_name["patient"]] = ENCOUNTER_PATIENT[ENCOUNTER_IDS[i]]
            r4 = [
                _generic_value(table, f["name"], f["type"], 3) for f in fields
            ]
            r4[by_name["id"]] = "e4"
            r4[by_name["patient"]] = "p3"
            r4[by_name["reasoncode"]] = ""       # null after cast
            r4[by_name["reasondescription"]] = ""  # 'None' sentinel kept
            rows.append(r4)
        elif table == "conditions":
            for i, r in enumerate(rows):
                r[by_name["patient"]] = ["p1", "p2", "p2"][i]
                r[by_name["encounter"]] = ["e1", "e3", "e3"][i]
            rows.append(list(rows[0]))           # exact duplicate row
        elif table == "observations":
            for i, r in enumerate(rows):
                r[by_name["patient"]] = PATIENT_IDS[i]
            rows[0][by_name["description"]] = "Body Height or Body Weight"
            rows[0][by_name["value"]] = "180.1 or 82.5"
        elif table == "payers":
            for i, r in enumerate(rows[:2]):
                r[by_name["id"]] = PAYER_IDS[i]
            rows = rows[:2]
        elif table == "payer_transitions":
            # two transitions for p1 (latest-payer dedup target)
            rows = rows[:3]
            rows[0][by_name["patient"]] = "p1"
            rows[0][by_name["payer"]] = "pay1"
            rows[0][by_name["start_date"]] = "2019-01-01T00:00:00Z"
            rows[1][by_name["patient"]] = "p1"
            rows[1][by_name["payer"]] = "pay2"
            rows[1][by_name["start_date"]] = "2021-06-01T00:00:00Z"
            rows[2][by_name["patient"]] = "p2"
            rows[2][by_name["payer"]] = "pay1"
            rows[2][by_name["start_date"]] = "2020-01-01T00:00:00Z"
        elif table == "allergies":
            for r in rows:
                r[by_name["stop"]] = ""          # all-null column: preserve
        elif table == "organizations":
            for i, r in enumerate(rows):
                r[by_name["phone"]] = f"555-000-{1000 + i}"

        lines = [header] + [",".join(_csv_cell(v) for v in r) for r in rows]
        with open(os.path.join(tdir, f"{table}.csv"), "w") as fh:
            fh.write("\n".join(lines) + "\n")
