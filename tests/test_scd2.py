"""SCD2 merge golden tests (SURVEY §5.2/§5.4): new key, changed row,
unchanged row, idempotent re-run, history preservation across three
loads (the reference loses history — Patient_datamart.py:82-83 — ours
must not)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from synthea_etl_spark.operators.scd2 import scd2_merge

T1, T2, T3 = datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)
KEYS, ATTRS = ["k"], ["v"]


def snap(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def state(df):
    return {
        (r.k, r.v, r.is_active): (r.created_at, r.modified_at) for r in df.collect()
    }


def test_initial_load(spark):
    dim = scd2_merge(None, snap(spark, [(1, "a"), (2, "b")]), KEYS, ATTRS, T1)
    rows = dim.collect()
    assert len(rows) == 2 and all(r.is_active for r in rows)
    assert all(r.created_at == T1 and r.modified_at == T1 for r in rows)
    assert len({r.sk for r in rows}) == 2


def test_changed_new_unchanged(spark):
    d1 = scd2_merge(None, snap(spark, [(1, "a"), (2, "b")]), KEYS, ATTRS, T1)
    d2 = scd2_merge(d1, snap(spark, [(1, "a2"), (2, "b"), (3, "c")]), KEYS, ATTRS, T2)
    s = state(d2)
    # changed key 1: expired v1 + active v2
    assert s[(1, "a", False)] == (T1, T2)
    assert s[(1, "a2", True)] == (T2, T2)
    # unchanged key 2 untouched
    assert s[(2, "b", True)] == (T1, T1)
    # new key 3 active
    assert s[(3, "c", True)] == (T2, T2)


def test_idempotent_rerun(spark):
    s1 = snap(spark, [(1, "a"), (2, "b")])
    d1 = scd2_merge(None, s1, KEYS, ATTRS, T1)
    d2 = scd2_merge(d1, s1, KEYS, ATTRS, T2)
    assert state(d2) == state(d1)


def test_history_preserved_across_three_loads(spark):
    """Key changes twice -> three versions all retained; the inactive
    v1 row must survive load 3 even though key 1 changes again."""
    d1 = scd2_merge(None, snap(spark, [(1, "a")]), KEYS, ATTRS, T1)
    d2 = scd2_merge(d1, snap(spark, [(1, "b")]), KEYS, ATTRS, T2)
    d3 = scd2_merge(d2, snap(spark, [(1, "c")]), KEYS, ATTRS, T3)
    s = state(d3)
    assert set(s) == {(1, "a", False), (1, "b", False), (1, "c", True)}
    assert s[(1, "a", False)] == (T1, T2)
    assert s[(1, "b", False)] == (T2, T3)
    assert s[(1, "c", True)] == (T3, T3)


def test_one_active_row_per_key_invariant(spark):
    d1 = scd2_merge(None, snap(spark, [(1, "a"), (2, "b")]), KEYS, ATTRS, T1)
    d2 = scd2_merge(d1, snap(spark, [(1, "x"), (2, "b")]), KEYS, ATTRS, T2)
    active = d2.filter(F.col("is_active")).groupBy("k").count().collect()
    assert all(r["count"] == 1 for r in active)
