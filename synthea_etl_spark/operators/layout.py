"""Data-layout operators: Z-order clustering and small-file compaction.

At 100 TB the dominant cost of most queries is the scan, and the
dominant scan saver is file/row-group skipping on parquet min/max
footers. Skipping works only if values are CLUSTERED: a file whose
custkey span covers the whole domain prunes nothing. Z-ordering
interleaves the bits of several columns into one sort key so that
files end up tight in EVERY dimension at once — the standard
multi-dimensional clustering trick (Delta/Iceberg OPTIMIZE ZORDER) —
and it composes with plain range partitioning.

Small-file compaction is the other half of layout hygiene:
streaming/micro-batch sinks produce files far below the scan split
size, and at scale the per-file open/footer cost dwarfs the data read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zvalue(cols: list[Column | str], bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one Z-curve key: out bit (i*n + j) = bit i of col j.
    Pure JVM bit arithmetic — stays in whole-stage codegen, and simple
    enough to reproduce in any engine's SQL (see q103's oracle).

    Callers map raw values into [0, 2^bits) first — rank, epoch-day,
    or (x - min) / width bucketing — because Z-order quality depends
    on the mapped domain being dense."""
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    n = len(cs)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, c in enumerate(cs):
            z = z + (
                F.shiftleft(
                    F.shiftright(c.cast("long"), i).bitwiseAND(F.lit(1)),
                    i * n + j,
                )
            )
    return z


def zorder_write(
    df: DataFrame,
    zcols: list[Column | str],
    path: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-curve of ``zcols``: range-partition by z-value (contiguous curve
    segments per file), sort within each file (tight row-group stats),
    drop the helper column. One shuffle (plus a tiny min/max stats
    job); reads then prune on footer min/max in every Z dimension. On
    a real lake this is the OPTIMIZE ZORDER job run after ingest;
    n_files derives from total bytes / target file size (128-1024 MB).

    Each column is first normalized to the FULL [0, 2^bits) range from
    its observed min/max: raw values with unequal magnitudes (an
    11-bit key against a 12-bit day) would leave the top interleaved
    bits constant and let one dimension dominate every range split —
    balanced clustering needs equal effective bit-widths."""
    cs = [F.col(c) if isinstance(c, str) else c for c in zcols]
    stats = df.agg(
        *[f(c).cast("double").alias(f"{a}{i}") for i, c in enumerate(cs)
          for a, f in (("lo", F.min), ("hi", F.max))]
    ).first()
    top = float(2**bits - 1)
    scaled = [
        F.floor(
            (c.cast("double") - F.lit(stats[f"lo{i}"]))
            * F.lit(top / max(stats[f"hi{i}"] - stats[f"lo{i}"], 1e-12))
        ).cast("long")
        for i, c in enumerate(cs)
    ]
    (
        df.withColumn("_z", zvalue(scaled, bits))
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    spark,
    src_path: str,
    dst_path: str,
    target_mb: int = 128,
) -> int:
    """Rewrite a fragmented parquet directory into ceil(bytes/target)
    files. Returns the output file count. The repartition count comes
    from actual input bytes (filesystem listing via the JVM Hadoop FS,
    no driver-side per-row work); AQE's coalescing handles the
    last-partition skew. The sink-side twin is
    ``spark.sql.files.maxRecordsPerFile`` — compaction exists for data
    ALREADY written small (streaming sinks, per-trigger output)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total = fs.getContentSummary(jpath).getLength()
    n = max(1, int(total / (target_mb * 1024 * 1024)) + (1 if total % (target_mb * 1024 * 1024) else 0))
    spark.read.parquet(src_path).repartition(n).write.mode("overwrite").parquet(
        dst_path
    )
    out = fs.globStatus(jvm.org.apache.hadoop.fs.Path(dst_path + "/part-*"))
    return len(out)
