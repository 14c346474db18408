from flink_playground_spark.sources.tables import load_table, load_tables, TABLES  # noqa: F401
from flink_playground_spark.sources.memory import from_rows  # noqa: F401
from flink_playground_spark.sources.datagen import datagen_batch, datagen_stream, TableDescriptor  # noqa: F401
