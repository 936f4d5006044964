"""cust_sagemaker_feature_store_spark — a PySpark-native feature-store
and analytics engine with the query/data-processing capabilities of the
reference client (spandanr/cust_sagemaker_feature_store), rebuilt
Spark-first (SURVEY.md)."""

from .session import get_spark

__all__ = ["get_spark"]
