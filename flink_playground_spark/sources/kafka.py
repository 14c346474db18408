"""Kafka source/sink descriptor (stubbed behind a capability check).

The reference carries Kafka only as a commented-out pom example
(``pom.xml:101-108``); this image likewise has no spark-sql-kafka
connector jar. The descriptor builds the real ``format("kafka")`` reader
when the connector is on the classpath and raises a clear, actionable
error when it isn't — the plumbing (options, schema projection,
startingOffsets) is the production shape either way.

For the Kafka *semantics* without the jar, ``sources/kafkalike.py``
implements a registered Python DataSource with the same row schema and
the full per-partition-offset replay/commit contract over local
append-only logs — downstream code is source-agnostic between the two.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "latest",
    value_schema: str | None = None,
) -> DataFrame:
    """Unbounded Kafka source; value parsed from JSON when
    ``value_schema`` (a DDL string) is given, else raw string.
    """
    if not kafka_available(spark):
        raise ModuleNotFoundError(
            "spark-sql-kafka connector not on the classpath; add the "
            "org.apache.spark:spark-sql-kafka-0-10 package to use Kafka "
            "sources (stubbed in this environment)"
        )
    raw = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
    )
    value = F.col("value").cast("string")
    if value_schema is None:
        return raw.select(F.col("key").cast("string").alias("key"), value.alias("value"), "timestamp")
    return raw.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(value, value_schema).alias("v"),
        "timestamp",
    ).select("key", "v.*", "timestamp")
