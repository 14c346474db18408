"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship dedup-join (SURVEY §2 J5 = W1+J4, the shape of
``WithDeduplicateJoinJob.java:88-104``) at sf0.001; ``queries`` /
``oracle_sql`` expose the engine's full named-query catalog
(flink_playground_spark.queries) for the DuckDB differential gate.
"""

from __future__ import annotations

import pathlib
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from flink_playground_spark import queries as _catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _catalog.REGISTRY["flagship_dedup_join"].spark_fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _catalog.queries()


def oracle_sql() -> dict[str, str]:
    return _catalog.oracle_sql()
