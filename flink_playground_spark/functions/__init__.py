from flink_playground_spark.functions import text, dedupe, similarity, multimodal  # noqa: F401
