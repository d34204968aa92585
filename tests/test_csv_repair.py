"""Dirty-CSV repair reader tests (SURVEY §5.2 P7/P8): ragged rows,
quoted commas, unnamed columns, header-row drop (the reference bug at
Source_Raw_Dynamic.py:102-110 that we deliberately fix)."""

from __future__ import annotations

import os

import pytest

from synthea_etl_spark.sources.csv_repair import repair_csv, repair_csv_python

DIRTY = """id,name,,city
1,Alice,x,Springfield
2,"Bob, Jr.",y
3,Carol,z,Shelbyville,EXTRA,JUNK

4,Dan
"""


@pytest.fixture()
def dirty_csv(tmp_path):
    p = tmp_path / "dirty.csv"
    p.write_text(DIRTY)
    return str(p)


def test_repair_aligns_and_drops_header(spark, dirty_csv):
    out = repair_csv(spark, dirty_csv)
    rows = {r.id: r for r in out.collect()}
    # header removed (reference leaks it as a data row — fixed here)
    assert "id" not in rows
    assert len(rows) == 4
    # quoted comma honored
    assert rows["2"].name == "Bob, Jr."
    # short row padded with ''
    assert rows["2"].city == ""
    assert rows["4"].name == "Dan" and rows["4"].city == ""
    # long row truncated to header width
    assert rows["3"].city == "Shelbyville"
    # unnamed column dropped
    assert out.columns == ["id", "name", "city"]


def test_repair_keep_unnamed(spark, dirty_csv):
    out = repair_csv(spark, dirty_csv, drop_unnamed=False)
    assert out.columns == ["id", "name", "unnamed_2", "city"]
    assert {r.unnamed_2 for r in out.collect()} == {"x", "y", "z", ""}


def test_python_fallback_matches(spark, dirty_csv):
    a = repair_csv(spark, dirty_csv, drop_unnamed=False)
    b = repair_csv_python(spark, dirty_csv)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_data_row_equal_to_header_survives(spark, tmp_path):
    """Only ONE header occurrence is dropped: a legitimate data row
    that textually equals the header line must survive repair (both
    readers)."""
    p = tmp_path / "selfref.csv"
    p.write_text("id,name\n1,Alice\nid,name\n2,Bob\nid,name\n")
    for reader in (repair_csv, repair_csv_python):
        out = reader(spark, str(p))
        rows = sorted(map(tuple, out.collect()))
        assert rows == [("1", "Alice"), ("2", "Bob"), ("id", "name"), ("id", "name")]


def test_empty_file_raises(spark, tmp_path):
    p = tmp_path / "empty.csv"
    p.write_text("")
    with pytest.raises(Exception):
        repair_csv(spark, str(p))
