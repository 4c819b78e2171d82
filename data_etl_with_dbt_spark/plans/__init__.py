from data_etl_with_dbt_spark.plans.dag import ModelRegistry, model  # noqa: F401
from data_etl_with_dbt_spark.plans.dq import (  # noqa: F401
    TestResult,
    not_null,
    positive,
    speed_limit,
    unique,
)
