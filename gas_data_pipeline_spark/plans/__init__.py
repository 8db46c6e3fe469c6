from gas_data_pipeline_spark.plans.flagship import data_query

__all__ = ["data_query"]
