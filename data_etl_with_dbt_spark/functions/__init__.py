from data_etl_with_dbt_spark.functions.pg_compat import (  # noqa: F401
    epoch_seconds,
    pg_concat_sep,
    pg_text,
    surrogate_key,
)
from data_etl_with_dbt_spark.functions.web import (  # noqa: F401
    canonicalize_url,
    url_features,
    url_host,
    url_registered_domain,
)
