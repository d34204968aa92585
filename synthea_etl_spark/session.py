"""SparkSession factory with scale-oriented defaults.

The reference creates a bare GlueContext per job
(``Glue_Scripts/Raw_To_Staging.py:41-45``) and inherits whatever Glue
configures. Here we own the session and turn on everything that matters
at scale: AQE (runtime coalescing, skew-join splitting), Arrow for any
pandas exchange, and UTC session time so results are reproducible
across engines and clusters.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster the
# caller overrides master/shuffle partitions (rule of thumb: 2-3x total
# cores, or rely on AQE coalescing from a high initial count).
_DEFAULTS: dict[str, str] = {
    # Adaptive execution: runtime shuffle-partition coalescing, skew-join
    # splitting, and plan re-optimization from runtime stats. This is the
    # main defense against skew at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow makes any pandas_udf / toPandas exchange columnar + batched.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic time semantics: parquet timestamps are naive; pin UTC
    # so collect()/comparisons don't depend on machine timezone.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: dims (region/nation/supplier/...) broadcast
    # instead of shuffling the fact side.
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    # Don't let tiny files fragment scans; at 100 TB this also bounds
    # task count on huge files.
    "spark.sql.files.maxPartitionBytes": "128MB",
    "spark.sql.parquet.compression.codec": "snappy",
    # The driver's events.parquet carries TIMESTAMP(NANOS), which the
    # vectorized reader rejects; read nanos as long session-wide
    # (plans.common.load_events converts to timestamp_ntz). Kept here
    # so loaders never have to mutate engine sessions at call time.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # local-mode niceties; harmless on a cluster.
    "spark.ui.enabled": "false",
    # Single-JVM local mode puts ALL 32 task slots in the driver heap.
    # 8g was enough through sf1 but thrashes at sf10 (measured: q110's
    # sort-merge spilled 13.4 GB and q16/q61 ran 10-15% GC,
    # bench_artifacts/stage_profile_sf10_r06_8g.json); on this 128 GiB
    # box 32g gives each of the 32 slots ~0.5 GB of execution memory,
    # the same per-slot budget a real cluster executor would get.
    # Cluster deployments size spark.executor.memory instead and this
    # knob is inert.
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"),
}


def get_session(
    app_name: str = "synthea_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default
    ``local[*]``) so the same entry point serves tests, bench, and a
    real cluster (where master comes from spark-submit and this arg
    stays None-but-ignored).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    else:
        conf.setdefault("spark.sql.shuffle.partitions", "32")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def load_table(spark: SparkSession, sf_dir: str, name: str):
    """Read one TESTDATA parquet table (see TESTDATA.md)."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
