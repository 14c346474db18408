from flink_playground_spark.operators.dedup import dedup_latest, pk_upsert_view  # noqa: F401
from flink_playground_spark.operators.temporal import as_of_join, as_of_snapshot  # noqa: F401
from flink_playground_spark.operators.unnest import unnest_outer  # noqa: F401
from flink_playground_spark.operators.windows import tumble, top_k_per_group  # noqa: F401
