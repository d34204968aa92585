"""synthea_etl_spark — a PySpark-native ETL & analytics engine.

Re-implements, Spark-first, the capabilities of the reference
Synthea-ETL pipeline (an AWS Glue/Lambda/Athena ETL; see SURVEY.md):
dirty-CSV repair ingestion, schema-registry-driven cleaning and type
casting, CSV->Parquet conversion with catalog registration, a generic
SCD Type 2 merge powering a star-schema patient mart, event-driven
batch orchestration, and a Spark SQL serving surface — plus the
LLM-data-pipeline operators (exact/near dedup, embedding similarity
search, text analysis, multimodal plumbing) the reference lacks,
each designed for 100 TB scale.
"""

from synthea_etl_spark.session import get_session

__all__ = ["get_session"]
__version__ = "0.1.0"
