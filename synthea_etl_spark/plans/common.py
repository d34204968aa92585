"""Shared helpers for the declared query inventory (plans/*).

Every query exists twice: a Spark DataFrame builder (a ``queries()``
entry) and an equivalent ANSI-SQL oracle string run by DuckDB (an
``oracle_sql()`` entry). The helpers here keep the two halves
numerically and schema-wise comparable:

**Exact double aggregation** (``dsum`` / ``sql_dsum``): floating-point
addition is not associative, so a double SUM depends on partial-
aggregation order and differs between engines (and between runs at
different parallelism). Casting each addend to DECIMAL makes the sum
exact and order-independent; casting the result back to DOUBLE is then
deterministic. This is a scale design decision, not a test hack: at
100 TB partial-aggregation order is never reproducible, so any pipeline
needing stable money sums must aggregate in decimal. Averages are
``exact_sum / count`` computed in double (one deterministic division).

**Type alignment**: DuckDB SUM(INTEGER) returns HUGEINT and year()
returns BIGINT; oracles cast explicitly so schemas line up with Spark
(long<->BIGINT, int<->INTEGER, double<->DOUBLE, string<->VARCHAR,
timestamp_ntz<->TIMESTAMP).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    """One declared query: Spark builder + DuckDB oracle.

    ``oracle`` is None for genuinely non-SQL-expressible operators
    (approximate/stateful ops); the driver then records a weaker
    rows-only check.
    """

    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    description: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one TESTDATA parquet table (column-pruned/pushed-down by
    Catalyst based on downstream use)."""
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as parquet TIMESTAMP(NANOS), which
    Spark's vectorized reader rejects. Read nanos as long (legacy conf,
    runtime-settable) and convert to timestamp_ntz at microsecond
    precision — same truncation DuckDB applies when it reads NANOS."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # integer div: ns values exceed 2^53, double division would round
    micros = F.expr("ts div 1000")
    ts = F.timestamp_micros(micros).cast("timestamp_ntz")
    return df.select(
        "event_id", ts.alias("ts"), "user_id", "event_type", "value", "props"
    )


# ---------------------------------------------------------------------------
# Exact (order-independent) double aggregation
# ---------------------------------------------------------------------------

DEC = "decimal(25,6)"


def dsum(col: Column | str, alias: str) -> Column:
    """Order-independent SUM of a double expression via decimal."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double").alias(alias)


def davg(col: Column | str, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in
    double (single deterministic fp division)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DEC)).cast("double") / F.count(c).cast("double")
    ).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(25,6))) AS DOUBLE)"
        f" / CAST(COUNT({expr}) AS DOUBLE) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Registry aggregation
# ---------------------------------------------------------------------------


def all_queries() -> dict[str, QuerySpec]:
    """Aggregate every plans module's QUERIES dict, keeping insertion
    order (module order = SURVEY §2 order)."""
    from synthea_etl_spark.plans import (
        relational,
        etl,
        llm,
        streaming_batch,
        extended,
        tpch,
    )

    out: dict[str, QuerySpec] = {}
    for mod in (relational, etl, llm, streaming_batch, extended, tpch):
        for name, spec in mod.QUERIES.items():
            if name in out:
                raise ValueError(f"duplicate query name: {name}")
            out[name] = spec
    return out
