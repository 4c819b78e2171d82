from data_etl_with_dbt_spark.streaming.intake import (  # noqa: F401
    minhash_intake_sink,
)
from data_etl_with_dbt_spark.streaming.pipeline import (  # noqa: F401
    enrich_stream_with_dimension,
    error_click_attribution_stream,
    read_event_stream,
    running_user_totals,
    session_window_stream,
    sliding_window_stream,
    streaming_dedup,
    tumbling_window_stream,
)
