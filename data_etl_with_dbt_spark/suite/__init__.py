"""The engine's query suite: every operator from SURVEY.md §2 plus the
LLM-data-pipeline extensions, each as a (Spark callable, DuckDB oracle SQL)
pair. ``__spark_entry__`` exposes this to the driver."""

from data_etl_with_dbt_spark.suite.registry import QUERIES, Query, query  # noqa: F401

# Importing the modules registers their queries.
from data_etl_with_dbt_spark.suite import reference  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import relational  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import relational2  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import relational3  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import relational4  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import featurize  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import analytics  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import llm_ops  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import corpus  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import windows  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import labelops  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import search  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import timeline  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import mixing  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import audit  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import privacy  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import experiment  # noqa: E402,F401
from data_etl_with_dbt_spark.suite import crawl  # noqa: E402,F401
