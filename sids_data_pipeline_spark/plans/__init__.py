from sids_data_pipeline_spark.plans.registry import QUERIES, Query  # noqa: F401
