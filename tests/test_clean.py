"""Unit tests for the cleaning operators (SURVEY §5.2): tiny inline
frames pinning the reference's exact semantics, including the
null->'None'->cast interplay quirk."""

from __future__ import annotations

from pyspark.sql import functions as F

from synthea_etl_spark.operators import clean
from synthea_etl_spark.sources.schema_registry import schema_from_fields


def test_normalize_column_names(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["First Name!", " ZIP-code ", "ok"])
    out = clean.normalize_column_names(df)
    assert out.columns == ["first_name", "zip_code", "ok"]


def test_drop_unnamed(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["a", "unnamed_1", "b"])
    assert clean.drop_unnamed_columns(df).columns == ["a", "b"]


def test_trim_only_strings(spark):
    df = spark.createDataFrame([("  x  ", 5)], ["s", "n"])
    row = clean.trim_strings(df).collect()[0]
    assert row.s == "x" and row.n == 5


def test_fix_phone_columns(spark):
    df = spark.createDataFrame([("555-123-4567", "a-b")], ["phone", "other"])
    row = clean.fix_phone_columns(df).collect()[0]
    assert row.phone == "5551234567" and row.other == "a-b"


def test_multivalue_probe_and_split(spark):
    df = spark.createDataFrame(
        [("apple or banana", "x"), ("plain", "y"), (None, "z")], ["fruit", "tag"]
    )
    assert clean.find_multivalue_columns(df) == ["fruit"]
    out = clean.split_multivalue(df)
    rows = {r.tag: r for r in out.collect()}
    assert "fruit" not in out.columns
    assert rows["x"].fruit_part1 == "apple" and rows["x"].fruit_part2 == "banana"
    assert rows["y"].fruit_part1 == "plain" and rows["y"].fruit_part2 is None
    assert rows["z"].fruit_part1 is None

    # accented variant from the reference's locale regex
    df2 = spark.createDataFrame([("uno óR dos",)], ["v"])
    assert clean.find_multivalue_columns(df2) == ["v"]


def test_multivalue_schema_declared_column_kept(spark):
    """Reference fidelity (Raw_To_Staging.py:123-125): a multi-value
    column that IS in the declared schema keeps its original column,
    value replaced with part1, alongside _part1/_part2; a schema-absent
    column is dropped."""
    df = spark.createDataFrame(
        [("apple or banana", "red or blue")], ["fruit", "extra"]
    )
    out = clean.split_multivalue(df, schema_columns={"fruit"})
    assert set(out.columns) == {
        "fruit",
        "fruit_part1",
        "fruit_part2",
        "extra_part1",
        "extra_part2",
    }
    row = out.collect()[0]
    assert row.fruit == "apple" and row.fruit_part1 == "apple"
    assert row.fruit_part2 == "banana"
    assert row.extra_part1 == "red" and row.extra_part2 == "blue"


def test_null_sentinel_then_cast_reference_quirk(spark):
    """Reference semantics (Raw_To_Staging.py:128-137): fillna('None')
    touches only string cols; casting 'None' to a numeric/date type
    yields null again — sentinel survives only in string columns."""
    df = spark.createDataFrame([("a", None, None), (None, "5", "x")], ["s1", "num", "s2"])
    schema = schema_from_fields(
        [{"name": "s1", "type": "string"}, {"name": "num", "type": "int"},
         {"name": "s2", "type": "string"}]
    )
    out = clean.cast_to_schema(clean.null_sentinel(df), schema)
    rows = out.collect()
    assert rows[0].s1 == "a" and rows[0].num is None and rows[0].s2 == "None"
    assert rows[1].s1 == "None" and rows[1].num == 5 and rows[1].s2 == "x"


def test_cast_timestamp_as_iso_string(spark):
    """Timestamps become yyyy-MM-dd'T'H:mm:ss STRINGS, millis dropped
    (Raw_To_Staging.py:133-135)."""
    df = spark.createDataFrame([("2020-03-04 05:06:07.890",)], ["ts"])
    schema = schema_from_fields([{"name": "ts", "type": "timestamp"}])
    out = clean.cast_to_schema(df, schema)
    assert out.collect()[0].ts == "2020-03-04T5:06:07"
    assert dict(out.dtypes)["ts"] == "string"
    # and the knowingly-fixed variant keeps real timestamps
    out2 = clean.cast_to_schema(df, schema, timestamps_as_iso_strings=False)
    assert dict(out2.dtypes)["ts"] == "timestamp"


def test_dedup_by_key_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b", 2), (1, "a", 1), (2, "c", 9)], ["k", "v", "ord"]
    )
    out = clean.dedup_by_key(df, ["k"], ["ord"])
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: "a", 2: "c"}


def test_clean_pipeline_end_to_end(spark):
    df = spark.createDataFrame(
        [(" 1 ", " Bob ", "cat or dog", "x"), (" 1 ", " Bob ", "cat or dog", "x")],
        ["ID!", "Name", "Pets", "unnamed_3"],
    )
    schema = schema_from_fields(
        [{"name": "id", "type": "int"}, {"name": "name", "type": "string"},
         {"name": "pets_part1", "type": "string"}, {"name": "pets_part2", "type": "string"}]
    )
    out = clean.clean_pipeline(df, schema=schema)
    rows = out.collect()
    assert len(rows) == 1  # dup dropped
    r = rows[0]
    assert r.id == 1 and r.name == "Bob"
    assert r.pets_part1 == "cat" and r.pets_part2 == "dog"
    assert "unnamed_3" not in out.columns
