from flink_playground_spark.plans.spec import QuerySpec, compile_plan, explain_str  # noqa: F401
