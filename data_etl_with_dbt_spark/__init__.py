"""PySpark-native analytics engine with the query and data-processing
capabilities of the ``yashahhhax/Data-ETL-with-DBT`` reference pipeline.

Built Spark-first (DataFrame / Spark SQL / Catalyst / Structured Streaming),
not a port: the reference delegates all relational execution to PostgreSQL via
dbt-compiled SQL, so what this package re-implements is the *semantics* of that
SQL and pipeline surface (see SURVEY.md), extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
designed for 100 TB scale.
"""

__version__ = "0.1.0"

from data_etl_with_dbt_spark.session import get_spark  # noqa: F401
