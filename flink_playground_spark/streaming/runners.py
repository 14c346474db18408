"""Streaming runners (SURVEY §2.7 T2/T6, §5.3).

The reference's jobs run unbounded queries against throttled datagen and
print changelogs. Our test-friendly equivalent replays the bounded
``events`` parquet as a file-source stream and drains it with an
``availableNow`` trigger into a memory sink — the Structured Streaming
micro-batch path (state store, watermarks, incremental aggregation) runs
for real, then terminates deterministically.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.sources.tables import _ensure_nanos_conf, normalize_events_ts


def replay_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``events`` table as an unbounded stream (same columns/types as
    the batch loader, ts normalized to TIMESTAMP_NTZ µs)."""
    _ensure_nanos_conf(spark)
    # The stream source needs an explicit schema; take the file's actual
    # footer schema (ts has been long-nanos or µs-timestamp across
    # corpus generations) from a zero-cost batch read, then normalize ts
    # exactly like the batch loader.
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    # the file source requires a directory; filter to the events file
    raw = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(raw)


def replay_events_waves(spark: SparkSession, sf_dir: str, waves: int = 2) -> DataFrame:
    """The ``events`` table as a stream of ``waves`` deterministic
    micro-batches: wave i carries the rows with ``event_id % waves == i``
    (one file per wave, ``maxFilesPerTrigger=1``). The parity split is
    what lets an oracle reconstruct each batch's contents in SQL."""
    import glob
    import os
    import shutil
    import tempfile

    from flink_playground_spark.sources.tables import load_table

    work = tempfile.mkdtemp(prefix="fps_evsrc_")
    events = load_table(spark, sf_dir, "events")
    src = f"{work}/src"
    os.makedirs(src)
    for i in range(waves):
        part = f"{work}/w{i}"
        events.filter(F.col("event_id") % waves == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        dst = f"{src}/wave{i}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        # strictly increasing mtimes pin the file-source batch order
        os.utime(dst, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
    return (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )


def run_to_memory(df: DataFrame, output_mode: str, query_name: str | None = None) -> DataFrame:
    """Drain a streaming DataFrame with trigger(availableNow) into a memory
    sink; returns the sink table as a batch DataFrame once the stream
    terminates. ``output_mode``: append | update | complete."""
    name = query_name or f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
