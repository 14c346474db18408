# NB: functions.udfs is imported lazily (decorating with @pandas_udf parses
# the return-type DDL, which requires an active SparkSession)
from flink_playground_spark.functions import dedupe, multimodal, similarity, text  # noqa: F401
