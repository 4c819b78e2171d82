from data_etl_with_dbt_spark.sources.io import (  # noqa: F401
    load_testdata,
    read_csv,
    read_parquet,
    write_table,
)
from data_etl_with_dbt_spark.sources.ingest import ingest_csv  # noqa: F401
from data_etl_with_dbt_spark.sources.bucketed import (  # noqa: F401
    aligned_for_join,
    bucket_spec,
    write_bucketed,
)
from data_etl_with_dbt_spark.sources.pyds import (  # noqa: F401
    SyntheticCorpusDataSource,
    register_synthetic_source,
)
from data_etl_with_dbt_spark.sources.versioned import (  # noqa: F401
    commit as versioned_commit,
    list_versions,
    merge_commit,
    read_version,
    rollback,
    vacuum,
)
