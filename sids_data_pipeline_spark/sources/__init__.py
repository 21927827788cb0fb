from sids_data_pipeline_spark.sources.tables import load_table, load_tables  # noqa: F401
