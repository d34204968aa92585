"""Dirty-CSV repair reader (reference: Glue_Scripts/Source_Raw_Dynamic.py:59-123).

The reference repairs ragged CSVs by dropping to an RDD of Python
``csv.reader`` calls, padding/truncating each row to header width, and
rebuilding a DataFrame. That is a row-at-a-time Python path — the slow
lane at any scale. Here the whole repair is DataFrame-native:

    spark.read.text -> from_csv(header-width all-string schema)

``from_csv`` runs JVM-side (univocity parser, whole-stage codegen),
honors quoted commas and leading whitespace like ``csv.reader(...,
skipinitialspace=True)``, pads short rows (null -> '' to match the
reference's pad value), and truncates long rows — the reference's exact
align semantics (`Source_Raw_Dynamic.py:67-69`) at ~100x the speed.

Divergences (deliberate, documented):
- the header row is REMOVED from the data. The reference forgets to
  drop it before createDataFrame (`Source_Raw_Dynamic.py:102-110`) and
  emits the header as a data row — a bug we do not reproduce.
- unnamed header cells get positional ``unnamed_<i>`` names before the
  drop-unnamed step, instead of colliding as empty strings.

For pathological quoting that univocity and Python's csv disagree on,
``repair_csv_python`` keeps a mapPartitions fallback with the
reference's exact csv.reader semantics.
"""

from __future__ import annotations

import csv
import io

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _read_header(spark: SparkSession, path: str) -> list[str]:
    """First text line = header (reference: Source_Raw_Dynamic.py:93).
    One tiny job; does not scan the file."""
    first = spark.read.text(path).limit(1).collect()
    if not first:
        raise ValueError(f"empty CSV at {path}")
    header = next(csv.reader(io.StringIO(first[0].value), skipinitialspace=True))
    return [h if h and h.strip() else f"unnamed_{i}" for i, h in enumerate(header)]


def _drop_one_header(lines: DataFrame, header_line: str) -> DataFrame:
    """Remove exactly ONE occurrence of the header line.

    A plain ``value != header`` filter silently deletes every DATA row
    that textually equals the header, not just the physical first line.
    Rows equal to the header are byte-identical, so removing "the
    first" and removing "any one" are the same multiset — filter them
    all out, then union back all-but-one via offset(1). The offset
    branch only ever sees the handful of header-equal rows (the filter
    pushes to the scan), so its single-task coalesce is free at any
    scale."""
    matches = lines.filter(F.col("value") == F.lit(header_line))
    return lines.filter(F.col("value") != F.lit(header_line)).unionByName(
        matches.offset(1)
    )


def repair_csv(spark: SparkSession, path: str, drop_unnamed: bool = True) -> DataFrame:
    """Read a possibly-ragged CSV, aligned to header width, all-string.

    Column set = header of the first line; every data row is padded
    (with '') or truncated to that width.
    """
    header = _read_header(spark, path)
    schema = ", ".join(f"`{c}` string" for c in header)
    lines = spark.read.text(path)
    header_line = lines.limit(1).collect()[0].value
    parsed = (
        _drop_one_header(lines, header_line)
        .filter(F.length(F.trim(F.col("value"))) > 0)  # and blank lines
        .select(
            F.from_csv(
                "value", schema, {"ignoreLeadingWhiteSpace": "true"}
            ).alias("r")
        )
        .select([F.coalesce(F.col(f"r.`{c}`"), F.lit("")).alias(c) for c in header])
    )
    if drop_unnamed:
        keep = [c for c in header if not c.startswith("unnamed_")]
        parsed = parsed.select(*keep)
    return parsed


def repair_csv_python(spark: SparkSession, path: str) -> DataFrame:
    """Fallback with the reference's exact Python csv semantics
    (`Source_Raw_Dynamic.py:60-69`), as mapPartitions (batch-per-task,
    not the reference's row lambdas). Use only when univocity's quote
    handling materially differs."""
    header = _read_header(spark, path)
    n = len(header)
    lines = spark.read.text(path)
    header_line = lines.limit(1).collect()[0].value

    def fix_partition(rows):
        for row in rows:
            line = row.value
            if not line.strip():
                continue
            fields = next(csv.reader(io.StringIO(line), skipinitialspace=True), [])
            yield fields[:n] + [""] * (n - len(fields))

    rdd = _drop_one_header(lines, header_line).rdd.mapPartitions(fix_partition)
    return spark.createDataFrame(rdd, header)
