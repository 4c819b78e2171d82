from data_etl_with_dbt_spark.functions.pg_compat import (  # noqa: F401
    epoch_seconds,
    pg_concat_sep,
    pg_text,
    surrogate_key,
)
