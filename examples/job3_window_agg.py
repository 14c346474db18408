"""Reference: WindowsProctimeAggJob.java — tumbling-window aggregation.

The Flink job buckets a 1-row/s datagen stream into 1-minute tumbling
windows via the TUMBLE window TVF and counts per (iso, capital, window)
(:65-81), printing the changelog. Here the same query runs on the real
Structured Streaming engine: a deterministic datagen stream with event
times (proctime stand-in, SURVEY §7.4), tumbling `F.window`, update-mode
changelog drained to console via availableNow-style bounded run.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.operators.windows import tumble_agg
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.datagen import datagen_batch, datagen_stream


def main() -> None:
    spark = get_spark("job3-window-agg")
    fields = {
        "iso": {"kind": "string", "length": 1},
        "capital": {"kind": "string", "length": 1},
        "ts": {"kind": "timestamp", "start": "2024-01-01 00:00:00", "step_seconds": 7},
    }
    # batch flavor — the deterministic oracle for the stream below
    batch = datagen_batch(spark, 60, fields)
    agg = tumble_agg(batch, "ts", "1 minute", ["iso", "capital"], [F.count(F.lit(1)).alias("cnt")])
    print_sink(agg.orderBy("window_start", "iso", "capital").select(
        "iso", "capital", "window_start", "cnt"), "tumbling 1-minute counts (batch oracle)")

    # streaming flavor: same synthesis through the rate source, update mode
    stream = datagen_stream(spark, rows_per_second=30, fields=fields)
    sagg = tumble_agg(stream, "ts", "1 minute", ["iso", "capital"], [F.count(F.lit(1)).alias("cnt")])
    q = (
        sagg.select("iso", "capital", "window_start", "cnt")
        .writeStream.format("console")
        .outputMode("update")  # the changelog view (toChangelogStream parity)
        .option("truncate", "false")
        .start()
    )
    q.awaitTermination(timeout=6)  # a few micro-batches, then stop
    q.stop()
    spark.stop()


if __name__ == "__main__":
    main()
