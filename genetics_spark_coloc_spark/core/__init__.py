from genetics_spark_coloc_spark.core.dataset import Dataset, SchemaValidationError
from genetics_spark_coloc_spark.core.schema_registry import get_schema

__all__ = ["Dataset", "SchemaValidationError", "get_schema"]
