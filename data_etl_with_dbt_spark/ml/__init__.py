from data_etl_with_dbt_spark.ml.pipeline import (  # noqa: F401
    FEATURE_COLUMNS,
    extract_training_frame,
    predict_batch,
    train_fare_model,
)
from data_etl_with_dbt_spark.ml.parse import parse_json_params, parse_nl_trip  # noqa: F401
from data_etl_with_dbt_spark.ml.quality import (  # noqa: F401
    filter_by_quality,
    score_quality,
    train_quality_classifier,
)
