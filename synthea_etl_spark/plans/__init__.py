"""Declared query inventory.

Each module contributes ``QUERIES: dict[str, QuerySpec]``; the driver
contract (``__spark_entry__.py``) aggregates them. See plans.common for
the QuerySpec shape and the Spark/DuckDB comparability rules.
"""

from synthea_etl_spark.plans.common import QuerySpec, all_queries

__all__ = ["QuerySpec", "all_queries"]
