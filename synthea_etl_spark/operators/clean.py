"""Raw->Staging cleaning transforms (reference: Glue_Scripts/Raw_To_Staging.py:100-140).

The reference's "major cleaning" is a fixed 7-step pipeline applied to
every inbound table. Here each step is a composable DataFrame->DataFrame
function, all expressed with built-in (JVM/codegen) expressions — no
Python UDFs anywhere on the data path. Divergences from the reference
are deliberate and documented per function:

- the multi-value probe runs as ONE aggregate job over all string
  columns instead of a count() action per column
  (`Raw_To_Staging.py:118` — N full scans at 100 TB is a non-starter);
- everything else preserves reference semantics exactly, including the
  null->'None' sentinel + cast interplay (sentinel survives only in
  string-typed columns; 'None' cast to int/double/date yields null).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructType

# The reference's multi-value cell marker: ' or ' with optional accents
# (`Raw_To_Staging.py:106` — locale regex preserved exactly).
MULTIVALUE_PATTERN = r"\s+[oOóÓ][rR]\s+"


def normalize_column_names(df: DataFrame) -> DataFrame:
    """P2: lowercase, collapse non-word runs to '_', strip edges
    (reference: Raw_To_Staging.py:103-104). Pure metadata — no job."""
    names = [re.sub(r"\W+", "_", c.strip().lower()).strip("_") for c in df.columns]
    return df.toDF(*names)


def drop_unnamed_columns(df: DataFrame) -> DataFrame:
    """P4: drop columns with empty/placeholder names
    (reference: Source_Raw_Dynamic.py:72-73)."""
    keep = [c for c in df.columns if c and not c.lower().startswith("unnamed")]
    return df.select(*keep)


def trim_strings(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X1: trim every string column (reference: Raw_To_Staging.py:111).
    One projection; whole-stage codegen handles all columns in a pass."""
    targets = set(
        columns
        if columns is not None
        else [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    )
    return df.select(
        *[
            F.trim(F.col(c)).alias(c) if c in targets else F.col(c)
            for c in df.columns
        ]
    )


def fix_phone_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """X2: strip '-' from phone-like columns
    (reference: Raw_To_Staging.py:114-115)."""
    targets = (
        columns
        if columns is not None
        else [c for c in df.columns if "phone" in c.lower() or "mobile" in c.lower()]
    )
    out = df
    for c in targets:
        out = out.withColumn(c, F.regexp_replace(F.col(c), "-", ""))
    return out


def find_multivalue_columns(df: DataFrame, columns: list[str] | None = None) -> list[str]:
    """F1/F2 one-pass probe: which string columns contain ' or '-joined
    multi-values? The reference answers this with a filter+limit+count
    job PER COLUMN (`Raw_To_Staging.py:118`); at scale that is N full
    scans. We compute max(rlike) for every candidate in a single
    aggregate — one scan, one reduce, same answer."""
    cands = (
        columns
        if columns is not None
        else [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]
    )
    if not cands:
        return []
    probes = [
        F.max(F.coalesce(F.col(c).rlike(MULTIVALUE_PATTERN), F.lit(False)).cast("int")).alias(c)
        for c in cands
    ]
    row = df.agg(*probes).collect()[0]
    return [c for c in cands if row[c] == 1]


def split_multivalue(
    df: DataFrame,
    columns: list[str] | None = None,
    schema_columns: set[str] | None = None,
) -> DataFrame:
    """X3/P3: split ' or '-separated cells into <col>_part1/_part2
    (reference: Raw_To_Staging.py:119-125). Columns autodetected with
    the one-pass probe when not given.

    The reference's disposition of the ORIGINAL column depends on the
    declared schema (Raw_To_Staging.py:123-125): a schema-declared
    column is KEPT, its value replaced with part1; a schema-absent
    column is dropped. Pass ``schema_columns`` (the declared field
    names) to reproduce that branch; with the default ``None`` every
    original is dropped — the right call when no schema registry is in
    play and downstream reads *_part1/_part2."""
    targets = columns if columns is not None else find_multivalue_columns(df)
    declared = schema_columns or set()
    out = df
    for c in targets:
        parts = F.split(F.trim(F.col(c)), MULTIVALUE_PATTERN)
        # F.get (not getItem): missing part -> NULL under ANSI mode
        out = out.withColumn(f"{c}_part1", F.trim(F.get(parts, 0))).withColumn(
            f"{c}_part2", F.trim(F.get(parts, 1))
        )
        if c in declared:
            out = out.withColumn(c, F.col(f"{c}_part1"))
        else:
            out = out.drop(c)
    return out


def empty_to_null(df: DataFrame) -> DataFrame:
    """Standard CSV semantics: an empty string field IS a null. The
    reference gets this implicitly (its repair stage writes '' to CSV,
    and the next stage's CSV read parses '' as null,
    Source_Raw_Dynamic.py:122 -> Raw_To_Staging.py:166); a single-pass
    pipeline must apply it explicitly before the null sentinel."""
    return df.select(
        *[
            F.when(F.col(c) == "", None).otherwise(F.col(c)).alias(c)
            if t == "string"
            else F.col(c)
            for c, t in df.dtypes
        ]
    )


def null_sentinel(df: DataFrame, sentinel: str = "None") -> DataFrame:
    """F6: replace nulls in string columns with the literal 'None'
    (reference: Raw_To_Staging.py:128). fillna(str) only touches
    string-typed columns — same as the reference."""
    return df.fillna(sentinel)


def cast_to_schema(df: DataFrame, schema: StructType, timestamps_as_iso_strings: bool = True) -> DataFrame:
    """P6/X4/X10: cast each column to its registry type
    (reference: Raw_To_Staging.py:131-137). Reference quirk preserved
    behind a flag: timestamp fields are NOT cast to timestamp but
    formatted to `yyyy-MM-dd'T'H:mm:ss` STRINGS (`:133-135`,
    milliseconds dropped). A 'None' sentinel cast to a non-string type
    yields null (Spark cast semantics) — exactly the reference's
    behavior."""
    from pyspark.sql.types import TimestampType

    cols = []
    for f_ in schema.fields:
        if f_.name not in df.columns:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
        elif isinstance(f_.dataType, TimestampType) and timestamps_as_iso_strings:
            cols.append(
                F.date_format(
                    F.col(f_.name).cast("timestamp"), "yyyy-MM-dd'T'H:mm:ss"
                ).alias(f_.name)
            )
        else:
            # try_cast, not cast: under ANSI mode (Spark 4 default) a
            # plain cast of the 'None' sentinel to int/double/date
            # throws; the reference ran non-ANSI where it yields null.
            # try_cast reproduces that null-on-malformed semantics.
            cols.append(F.col(f_.name).try_cast(f_.dataType).alias(f_.name))
    return df.select(*cols)


def dedup_full(df: DataFrame) -> DataFrame:
    """A2: full-row distinct (reference: Raw_To_Staging.py:140).
    Catalyst plans partial hash-agg before the exchange, so the shuffle
    carries only per-partition-unique rows."""
    return df.dropDuplicates()


def dedup_by_key(df: DataFrame, keys: list[str], order_by: list[str]) -> DataFrame:
    """A3, deterministic: one row per key, chosen by an explicit total
    order. The reference's dropDuplicates(subset)
    (`Patient_datamart.py:196`) keeps an arbitrary row — non-reproducible
    across runs/parallelism, so we require an ordering."""
    from pyspark.sql import Window

    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def clean_pipeline(
    df: DataFrame,
    schema: StructType | None = None,
    sentinel: str = "None",
    multivalue_columns: list[str] | None = None,
) -> DataFrame:
    """The reference's full Raw->Staging transform chain
    (`Raw_To_Staging.py:100-140`): normalize names -> trim -> phone fix
    -> multi-value split -> null sentinel -> schema cast -> full dedup."""
    out = normalize_column_names(df)
    out = drop_unnamed_columns(out)
    out = trim_strings(out)
    out = fix_phone_columns(out)
    out = split_multivalue(
        out,
        multivalue_columns,
        schema_columns={f.name for f in schema.fields} if schema is not None else None,
    )
    out = empty_to_null(out)
    out = null_sentinel(out, sentinel)
    if schema is not None:
        out = cast_to_schema(out, schema)
    return dedup_full(out)
