"""Declarative data-quality expectations, evaluated in ONE pass.

The reference documents per-table data problems and handling rules in
``Documentation/Tables_Description.xlsx`` (sheet1, Problem/Handling
columns) but checks nothing mechanically — quality control is manual
dashboard inspection (SURVEY.md §5). This operator is that spec made
executable: a list of named row-level constraints compiled into a
SINGLE aggregate job (one scan, conditional sums), never the
reference's per-column ``count()``-per-probe pattern
(``Raw_To_Staging.py:118``) that costs one full job per check.

At 100 TB: N expectations over M rows is one scan + one tiny shuffle
regardless of N; violation counts are map-side partial sums. FK checks
are the one exception — they need the parent key set, expressed as a
broadcast left-anti join (parent side is dim-sized by definition;
a fact-fact FK check would instead bucket both sides).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One named row-level constraint: ``predicate`` is True for rows
    that SATISFY the expectation."""

    name: str
    predicate: Column


def not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", F.col(col).isNotNull())


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(f"accepted_values_{col}", F.col(col).isin(values))


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(f"in_range_{col}", F.col(col).between(lo, hi))


def check(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate all expectations in one aggregate pass.

    Returns one row per expectation: (expectation, violations,
    n_checked). Null predicate results count as violations (SQL
    three-valued logic would silently pass them)."""
    if not expectations:
        return df.sparkSession.createDataFrame(
            [], "expectation string, violations bigint, n_checked bigint"
        )
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(e.predicate.isNull() | ~e.predicate, 1).otherwise(0)
            ).alias(f"_v{i}")
            for i, e in enumerate(expectations)
        ],
    )
    # unpivot the single wide row into (expectation, violations) — the
    # stack() is over one row, so this is driver-trivial at any scale.
    # Names go in as typed literals, never string-interpolated SQL (a
    # quote in a column-derived name must not break the plan).
    label_value: list[Column] = []
    for i, e in enumerate(expectations):
        label_value += [F.lit(e.name), F.col(f"_v{i}")]
    return agg.select(
        F.stack(F.lit(len(expectations)), *label_value).alias(
            "expectation", "violations"
        ),
        F.col("_n").alias("n_checked"),
    )


def fk_check(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Referential-integrity check: count child rows whose non-null key
    has no match in parent. Parent key set broadcasts; the child is
    scanned once with no shuffle."""
    orphans = (
        child.filter(F.col(child_key).isNotNull())
        .join(
            F.broadcast(parent.select(parent_key).distinct()),
            F.col(child_key) == F.col(parent_key),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("violations"))
    )
    total = child.agg(F.count(F.lit(1)).alias("n_checked"))
    return (
        orphans.crossJoin(F.broadcast(total))
        .select(
            F.lit(f"fk_{child_key}_references_{parent_key}").alias("expectation"),
            "violations",
            "n_checked",
        )
    )
