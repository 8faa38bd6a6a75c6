from clv_data_pipeline_spark.sources.io import (  # noqa: F401
    load_table,
    load_tables,
    read_transactions_csv,
    register_views,
    write_append,
    write_overwrite,
)
