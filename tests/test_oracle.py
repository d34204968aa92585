"""Differential tests: every declared query vs its DuckDB oracle at
sf0.001 (fast) — the same row-count / column / order-insensitive
value-hash comparison the driver's correctness gate applies at sf0.01.
"""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_SMALL, TABLES
from tools.selfcheck import table_hash

import __spark_entry__ as ent


@pytest.fixture(scope="module")
def duck_small():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'")
    yield con
    con.close()


def all_names():
    return list(ent.queries())


@pytest.mark.parametrize("name", all_names())
def test_query_matches_oracle(name, spark, duck_small):
    qs, oracles = ent.queries(), ent.oracle_sql()
    sdf = qs[name](spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in oracles:
        assert srows is not None  # rows-only check: must at least run
        return
    rel = duck_small.sql(oracles[name])
    drows = rel.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} vs {len(drows)}"
    assert sorted(sdf.columns) == sorted(rel.columns)
    assert table_hash(sdf.columns, srows) == table_hash(rel.columns, drows)


def test_entry_smoke(spark):
    df = ent.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and df.columns
