from genetics_spark_coloc_spark.functions import arrays, effect, pvalue, reshape

__all__ = ["arrays", "effect", "pvalue", "reshape"]
