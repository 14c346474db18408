"""Beyond the reference: CEP pattern matching, batch and streaming.

Flink's third pillar (after SQL and stateful streaming) is CEP /
MATCH_RECOGNIZE; the reference playground never reaches it, so this
capstone shows the engine's equivalents on a deterministic purchase
funnel:

1. batch funnel — chained forward as-of joins (operators/cep.py), the
   skip-till-next-match semantics of ``PATTERN (V C P)`` with
   ``WITHIN INTERVAL``;
2. strict contiguity — the lead-chain matcher (``A B C`` with no gaps);
3. streaming funnel — the same chains detected incrementally with
   NFA-style keyed state (streaming/cep.py), replayed over three
   event-time-ordered micro-batches and checked equal to the batch
   answer.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.operators.cep import funnel, match_contiguous
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.memory import from_rows
from flink_playground_spark.streaming.cep import funnel_stream

ROWS = [
    # user 1 completes V->C->P twice; the second chain shares its C
    (1, "2024-01-01 09:00:00", "view", 1),
    (1, "2024-01-01 09:05:00", "click", 2),
    (1, "2024-01-01 09:20:00", "purchase", 3),
    (1, "2024-01-01 10:00:00", "view", 4),
    (1, "2024-01-01 10:30:00", "click", 5),
    (1, "2024-01-01 11:00:00", "purchase", 6),
    # user 2 clicks before viewing — no funnel
    (2, "2024-01-01 09:00:00", "click", 7),
    (2, "2024-01-01 09:30:00", "view", 8),
    # user 3 views and clicks but the purchase lands past the deadline
    (3, "2024-01-01 09:00:00", "view", 9),
    (3, "2024-01-01 09:10:00", "click", 10),
    (3, "2024-01-02 13:00:00", "purchase", 11),
]


def events_df(spark):
    df = from_rows(spark, ROWS, ["user_id", "ts", "event_type", "event_id"], [int, str, str, int])
    return df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def main() -> None:
    spark = get_spark("pipeline-cep")
    ev = events_df(spark)
    et = F.col("event_type")

    got = funnel(
        ev, "user_id", "ts", [et == "view", et == "click", et == "purchase"],
        "INTERVAL 4 HOURS", start_cols=[F.col("event_id").alias("start_id")],
    )
    print_sink(got, "funnel view->click->purchase WITHIN 4h (users 1x2)")

    strict = match_contiguous(
        ev, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        tiebreakers=["event_id"],
    ).select("user_id", "event_id", "ts", "ts2", "ts3")
    print_sink(strict, "strict contiguity V C P (consecutive rows only)")

    # streaming replay: one micro-batch per hour-bucket of the same rows
    import os
    import tempfile

    src = tempfile.mkdtemp(prefix="cep_example_")
    for i, (lo, hi) in enumerate([(9, 9), (10, 11), (12, 23)]):
        part = f"{src}/p{i}"
        ev.filter(F.hour("ts").between(lo, hi)).coalesce(1).write.mode(
            "overwrite"
        ).parquet(part)
        import glob
        import shutil

        f = glob.glob(f"{part}/*.parquet")[0]
        dst = f"{src}/wave{i}.parquet"
        shutil.copy(f, dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    out = funnel_stream(
        stream, "user_id", "ts", "event_type", ["view", "click", "purchase"],
        within_ms=4 * 3600 * 1000, id_col="event_id",
    )
    q = (
        out.writeStream.format("memory").queryName("cep_stream").outputMode("append")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    streamed = spark.table("cep_stream")
    print_sink(streamed, "streaming funnel (3 micro-batches) — equals batch")
    batch = {tuple(r) for r in got.select(streamed.columns).collect()}
    assert {tuple(r) for r in streamed.collect()} == batch
    print("stream == batch:", True)
    spark.stop()


if __name__ == "__main__":
    main()
