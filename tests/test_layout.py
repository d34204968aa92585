"""Layout operator tests: Z-order clustering quality measured on real
parquet footers, and small-file compaction."""

from __future__ import annotations

import glob

import duckdb
import pytest
from pyspark.sql import functions as F

from synthea_etl_spark.operators.layout import compact_small_files, zorder_write


def _file_spans(path_glob: str, col: str) -> list[tuple[int, int]]:
    """Per-file (min, max) of ``col`` straight from parquet footers."""
    spans = []
    for f in sorted(glob.glob(path_glob)):
        lo, hi = duckdb.sql(
            f"SELECT min({col}), max({col}) FROM '{f}'"
        ).fetchone()
        spans.append((lo, hi))
    return spans


@pytest.fixture(scope="module")
def zordered(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    o = spark.read.parquet("/root/testdata/sf0.01/orders.parquet").select(
        "o_orderkey",
        F.col("o_custkey").cast("long").alias("custkey"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp_ntz")
        ).cast("long").alias("day_num"),
    )
    naive = str(base / "naive")
    zord = str(base / "zord")
    o.repartition(8).write.mode("overwrite").parquet(naive)
    zorder_write(o, ["custkey", "day_num"], zord, n_files=8)
    return naive, zord


def test_zorder_tightens_footer_spans_in_both_dims(zordered):
    """Z-ordered files must have materially tighter per-file min/max
    spans than a hash-shuffled write in BOTH clustered dimensions —
    that's the entire point (footer-based file skipping)."""
    naive, zord = zordered
    for col in ("custkey", "day_num"):
        naive_spans = _file_spans(f"{naive}/part-*.parquet", col)
        z_spans = _file_spans(f"{zord}/part-*.parquet", col)
        glob_lo = min(s[0] for s in naive_spans)
        glob_hi = max(s[1] for s in naive_spans)
        width = glob_hi - glob_lo
        avg_naive = sum(s[1] - s[0] for s in naive_spans) / len(naive_spans)
        avg_z = sum(s[1] - s[0] for s in z_spans) / len(z_spans)
        # hash-shuffled files each span ~the whole domain
        assert avg_naive > 0.9 * width
        # z-ordered files must average well under the domain
        assert avg_z < 0.6 * width, f"{col}: avg z span {avg_z} vs {width}"


def test_zorder_preserves_rows(spark, zordered):
    naive, zord = zordered
    a = spark.read.parquet(naive).orderBy("o_orderkey").collect()
    b = spark.read.parquet(zord).orderBy("o_orderkey").collect()
    assert a == b


def test_compaction_reduces_file_count(spark, tmp_path):
    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    spark.read.parquet("/root/testdata/sf0.01/orders.parquet").repartition(
        64
    ).write.mode("overwrite").parquet(src)
    n_in = len(glob.glob(f"{src}/part-*.parquet"))
    n_out = compact_small_files(spark, src, dst, target_mb=128)
    assert n_in == 64 and n_out <= 2
    assert (
        spark.read.parquet(dst).count()
        == spark.read.parquet(src).count()
    )
