"""Parquet corpus source (SURVEY §2.1 S8) — the engine's primary batch source.

The reference has no file connector (Kafka appears only as a commented-out
pom example); parquet is our batch backbone: columnar scan with predicate
pushdown and column pruning, both verified in tests via ``explain``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# events.ts may arrive as parquet TIMESTAMP(NANOS,false): Spark has no
# nanosecond timestamp type, so the scan reads it as long (nanosAsLong)
# and this expression converts ns -> microsecond TIMESTAMP_NTZ with pure
# integer math (no double rounding; exactly DuckDB's CAST(ts AS
# TIMESTAMP)). When the file carries µs timestamps instead, the scan
# already yields a timestamp type and only an NTZ normalization applies.
_NS_TO_TS_NTZ = (
    "cast('1970-01-01 00:00:00' as timestamp_ntz)"
    " + make_dt_interval(0, 0, 0, cast({col} div 1000 as decimal(20,0)) / 1000000)"
)


def _ensure_nanos_conf(spark: SparkSession) -> None:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:  # pragma: no cover
        pass


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one corpus table; normalizes nanosecond timestamps to NTZ µs."""
    _ensure_nanos_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to TIMESTAMP_NTZ µs whatever the file
    carried: long nanos (TIMESTAMP(NANOS) under nanosAsLong), µs NTZ
    (identity), or an LTZ/other timestamp (plain cast)."""
    ts_type = df.schema["ts"].dataType.simpleString()
    if ts_type == "bigint":
        return df.withColumn("ts", F.expr(_NS_TO_TS_NTZ.format(col="ts")))
    if ts_type != "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register corpus tables as temp views for the SQL entry point (E1)."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
