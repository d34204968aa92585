"""A custom Spark DATA SOURCE for WARC.gz archives — the Spark 4
Python Data Source API (`pyspark.sql.datasource`), so crawl shards
read as first-class tables: ``spark.read.format("warc").load(dir)``.

Beyond-reference surface (the reference's only sources are CSV and
parquet readers on Glue; builder's-brief LLM-pipeline scope). Public
knowledge only: the documented pyspark DataSource/DataSourceReader/
InputPartition protocol and the ISO 28500 WARC format (parsing
delegated to operators/warc.parse_warc_gz — the same strict,
bomb-capped record splitter the q143 gate certifies).

Scale design: one InputPartition PER FILE (the natural split for
gzip-member archives — members aren't seekable mid-stream, files
are), so a directory of shards reads with file-level parallelism and
executor-side parsing; the driver only lists paths. Schema is fixed
and matches operators/warc.warc_records minus the per-doc id:
(path, record_idx, n_records, warc_type, target_uri, content_length,
payload_text).
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

WARC_SCHEMA = StructType(
    [
        StructField("path", StringType()),
        StructField("record_idx", IntegerType()),
        StructField("n_records", IntegerType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("content_length", IntegerType()),
        StructField("payload_text", StringType()),
    ]
)


class _WarcPartition(InputPartition):
    def __init__(self, path: str) -> None:
        self.path = path


class WarcDataSourceReader(DataSourceReader):
    def __init__(self, options: dict) -> None:
        self.path = options.get("path")
        if not self.path:
            raise ValueError("warc source needs a path")

    def partitions(self):
        import os

        if os.path.isdir(self.path):
            files = sorted(
                os.path.join(self.path, f)
                for f in os.listdir(self.path)
                if f.endswith((".warc.gz", ".warc"))
            )
        else:
            files = [self.path]
        if not files:
            raise ValueError(f"no WARC files under {self.path}")
        return [_WarcPartition(p) for p in files]

    def read(self, partition: _WarcPartition):
        # runs on executors: parse one archive, yield one row per
        # record (malformed archives yield a single null-record row —
        # the same degradation contract as warc_records)
        from synthea_etl_spark.operators.warc import parse_warc_gz

        with open(partition.path, "rb") as fh:
            blob = fh.read()
        recs = parse_warc_gz(blob)
        if recs is None:
            yield (partition.path, None, None, None, None, None, None)
            return
        for i, rec in enumerate(recs):
            try:
                text = rec["payload"].decode("utf-8")
            except UnicodeDecodeError:
                text = None
            yield (
                partition.path,
                i,
                len(recs),
                rec["type"],
                rec["uri"],
                rec["content_length"],
                text,
            )


class WarcDataSource(DataSource):
    """``spark.dataSource.register(WarcDataSource)`` then
    ``spark.read.format("warc").load(path)``."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> StructType:
        return WARC_SCHEMA

    def reader(self, schema: StructType) -> WarcDataSourceReader:
        return WarcDataSourceReader(self.options)
