"""Sinks (SURVEY §2.1 S5/S6/S7).

Reference: the ``print`` connector (``WithDeduplicateJoinJob.java:70-77``),
``.print("tag")`` taps (``DataStreamJob.java:122-123``) and ``INSERT INTO``
DML (``WithDeduplicateJoinJob.java:88-104``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def print_sink(df: DataFrame, tag: str = "", n: int = 20) -> None:
    """Batch print (S5/S6). Streaming DataFrames go to the console sink."""
    if df.isStreaming:
        console_sink(df, query_name=tag or "print").awaitTermination()
        return
    if tag:
        print(f"== {tag} ==")
    df.show(n, truncate=False)


def console_sink(df: DataFrame, query_name: str = "console", output_mode: str = "append") -> StreamingQuery:
    """Streaming print connector (S5) — update/append changelog view (T6)."""
    return (
        df.writeStream.format("console")
        .outputMode(output_mode)
        .queryName(query_name)
        .option("truncate", "false")
        .start()
    )


def memory_sink(df: DataFrame, query_name: str, output_mode: str = "append") -> StreamingQuery:
    """Test sink: accumulate streaming output into an in-memory table
    readable as ``spark.table(query_name)``."""
    return df.writeStream.format("memory").outputMode(output_mode).queryName(query_name).start()


def insert_into(df: DataFrame, table: str, output_mode: str = "append"):
    """``INSERT INTO <sink>`` (S7): continuous insert for streams,
    ``insertInto``/``saveAsTable`` append for batch."""
    if df.isStreaming:
        return df.writeStream.outputMode(output_mode).toTable(table)
    df.write.mode("append").saveAsTable(table)
    return None
