"""Streaming state recovery: a stateful keep-latest query stopped and
restarted from its checkpoint must resume exactly — process only new
files, keep prior state (the reference's plan-pinning/upgrade story,
SURVEY §3 E3: 'streaming state compatibility is pinned by the
checkpoint location')."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.sources.tables import load_table
from flink_playground_spark.streaming.stateful import dedup_latest_stream


def _drain(stream_df, checkpoint, out_dir):
    # file sink: the only exactly-once sink that supports checkpoint
    # recovery (memory sinks refuse to restart)
    q = (
        stream_df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_keep_latest_survives_restart(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id", "value")
    # split the corpus into two "arrival waves" landing in a source dir
    src = tmp_path / "src"
    wave1 = events.filter(F.col("event_id") % 2 == 0)
    wave2 = events.filter(F.col("event_id") % 2 == 1)
    wave1.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "w1"))
    wave2.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "w2"))
    src.mkdir()
    for f in (tmp_path / "w1").glob("*.parquet"):
        shutil.copy(f, src / "wave1.parquet")

    checkpoint = str(tmp_path / "ckpt")
    out_dir = str(tmp_path / "out")
    stream = spark.readStream.schema(events.schema).parquet(str(src))
    latest = dedup_latest_stream(stream, "user_id", "ts", tiebreakers=("event_id",), output_mode="append")

    _drain(latest, checkpoint, out_dir)
    n_after_wave1 = spark.read.parquet(out_dir).count()
    assert n_after_wave1 > 0

    # second wave lands; restart the SAME query from the checkpoint
    for f in (tmp_path / "w2").glob("*.parquet"):
        shutil.copy(f, src / "wave2.parquet")
    stream2 = spark.readStream.schema(events.schema).parquet(str(src))
    latest2 = dedup_latest_stream(stream2, "user_id", "ts", tiebreakers=("event_id",), output_mode="append")
    _drain(latest2, checkpoint, out_dir)

    # changelog emissions across both runs, compacted = batch dedup over ALL
    emissions = spark.read.parquet(out_dir)
    got = dedup_latest(emissions, "user_id", "ts", tiebreakers=("event_id",))
    want = dedup_latest(events, "user_id", "ts", tiebreakers=("event_id",))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))

    # recovery resumed from state rather than reprocessing wave 1: the
    # second run emitted at most one row per key, and the wave-1 output
    # was not rewritten
    assert emissions.count() <= n_after_wave1 + want.count()
