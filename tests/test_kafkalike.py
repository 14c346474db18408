"""Kafka-shaped Python DataSource: per-partition offsets, bounded reads
with Kafka-style offset ranges, checkpointed resume (exactly-once)."""

from pyspark.sql import functions as F

from flink_playground_spark.sources.kafkalike import (
    kafkalike_batch,
    kafkalike_stream,
    produce,
)


def _seed(log_dir, topic):
    # two partitions, interleaved appends
    produce(log_dir, topic, 0, "a", "v0-p0")
    produce(log_dir, topic, 0, "b", "v1-p0")
    produce(log_dir, topic, 1, "a", "v0-p1")
    produce(log_dir, topic, 0, None, "v2-p0")
    produce(log_dir, topic, 1, "c", "v1-p1")


def test_batch_read_all_offsets(spark, tmp_path):
    log = str(tmp_path)
    _seed(log, "t")
    rows = kafkalike_batch(spark, log, "t").collect()
    got = {(r["partition"], r["offset"], bytes(r["value"]).decode()) for r in rows}
    assert got == {
        (0, 0, "v0-p0"),
        (0, 1, "v1-p0"),
        (0, 2, "v2-p0"),
        (1, 0, "v0-p1"),
        (1, 1, "v1-p1"),
    }
    null_key = [r for r in rows if r["key"] is None]
    assert len(null_key) == 1 and bytes(null_key[0]["value"]) == b"v2-p0"


def test_batch_read_offset_range(spark, tmp_path):
    """Kafka-style startingOffsets/endingOffsets bounds per partition."""
    log = str(tmp_path)
    _seed(log, "t")
    rows = kafkalike_batch(
        spark,
        log,
        "t",
        starting_offsets={"t": {"0": 1}},
        ending_offsets={"t": {"0": 2, "1": 1}},
    ).collect()
    got = {(r["partition"], r["offset"]) for r in rows}
    assert got == {(0, 1), (1, 0)}


def test_stream_checkpoint_resume_exactly_once(spark, tmp_path):
    """A checkpointed query consumes the log once; a relaunch after new
    appends reads ONLY the new offsets — Kafka's committed-offset
    resume, via the DataSource offset protocol."""
    log = str(tmp_path / "log")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    _seed(log, "t")

    def run_once():
        q = (
            kafkalike_stream(spark, log, "t")
            .selectExpr("partition", "offset", "CAST(value AS STRING) AS value")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out)

    first = {(r["partition"], r["offset"]) for r in run_once().collect()}
    assert first == {(0, 0), (0, 1), (0, 2), (1, 0), (1, 1)}

    produce(log, "t", 1, "d", "v2-p1")
    produce(log, "t", 0, "e", "v3-p0")
    accumulated = {
        (r["partition"], r["offset"], r["value"]) for r in run_once().collect()
    }
    # exactly-once: the relaunch appended ONLY the two new offsets
    assert len(accumulated) == 7
    assert {(1, 2, "v2-p1"), (0, 3, "v3-p0")} <= accumulated


def test_stream_feeds_keyed_dedup(spark, tmp_path):
    """Downstream shape check: the kafkalike stream drives the keep-latest
    operator exactly as a real Kafka topic would (key bytes → string key,
    offset as the order column)."""
    log = str(tmp_path)
    for i, (k, v) in enumerate([("a", "1"), ("b", "2"), ("a", "3"), ("a", "4"), ("b", "5")]):
        produce(log, "t", 0, k, v)
    df = kafkalike_batch(spark, log, "t").select(
        F.col("key").cast("string").alias("k"),
        F.col("value").cast("string").alias("v"),
        "offset",
    )
    from flink_playground_spark.operators.dedup import dedup_latest

    latest = {(r["k"], r["v"]) for r in dedup_latest(df, "k", "offset").collect()}
    assert latest == {("a", "4"), ("b", "5")}
