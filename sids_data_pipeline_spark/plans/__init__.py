from sids_data_pipeline_spark.plans.base import Query  # noqa: F401
