"""transformWithStateInPandas running totals: state carries across
micro-batches, update-mode emits refreshed aggregates per key.

The TWS state protocol speaks protobuf between the JVM and its
dedicated Python driver worker; environments without the protobuf
wheel can't run the operator at all, so the whole module skips there
(the operator itself is real and runs wherever pyspark's own TWS
prerequisites are met)."""

from __future__ import annotations

import pytest

pytest.importorskip(
    "google.protobuf.descriptor",
    reason="transformWithStateInPandas needs protobuf (pyspark TWS dependency)",
)

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from synthea_etl_spark.streaming.tws import running_totals

EVENT_SCHEMA = StructType(
    [
        StructField("user_id", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _write_batch(path, rows):
    lines = ["user_id,value"] + [f"{u},{v}" for u, v in rows]
    path.write_text("\n".join(lines) + "\n")


def test_running_totals_across_batches(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    ckpt = tmp_path / "ckpt"
    _write_batch(src / "b1.csv", [("u1", 1.0), ("u1", 2.0), ("u2", 10.0)])

    stream = spark.readStream.schema(EVENT_SCHEMA).csv(str(src))
    out = running_totals(stream)

    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    first = {
        r.user_id: (r.n_events, r.total)
        for r in spark.sql("SELECT * FROM tws_totals").collect()
    }
    assert first == {"u1": (2, 3.0), "u2": (1, 10.0)}

    # second micro-batch: state folds the delta in (u1 grows, u3 new)
    _write_batch(src / "b2.csv", [("u1", 4.0), ("u3", 7.0)])
    q = (
        out.writeStream.format("memory")
        .queryName("tws_totals2")
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    second = {
        r.user_id: (r.n_events, r.total)
        for r in spark.sql("SELECT * FROM tws_totals2").collect()
    }
    assert second["u1"] == (3, 7.0)  # carried state + delta
    assert second["u3"] == (1, 7.0)
    assert "u2" not in second  # update mode: untouched keys don't re-emit
