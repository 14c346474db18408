"""Bucketed tables: shuffle-free co-located joins and aggregations.

At 100 TB the dominant cost of a repeated fact⋈fact join is the shuffle.
Writing both sides bucketed on the join key (same bucket count) lets
Spark's scan report the hash distribution, so the sort-merge join needs
NO Exchange on either side — verified by plan assertion in
tests/test_bucketing.py. The write itself pays one shuffle once;
every downstream join on the key is then shuffle-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: str | Sequence[str],
    buckets: int,
    sort_by: Sequence[str] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) parquet table in the
    session catalog. Joins/aggs on ``keys`` against tables with the same
    bucket count skip their Exchange. ``path`` makes it an external table
    (warehouse.dir is a static conf — not settable per test/session)."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
