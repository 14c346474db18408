"""Python DataSource datagen (Spark 4 custom-source API): batch/stream
parity with the range-based datagen, partition planning, offset replay."""

import time
import uuid

from pyspark.sql import functions as F

from flink_playground_spark.sources.datagen import datagen_batch
from flink_playground_spark.sources.pydatasource import (
    pydatagen_batch,
    pydatagen_stream,
)


def _drain(df, expected_rows: int, timeout_s: float = 60.0):
    """Python stream sources don't support Trigger.AvailableNow (Spark
    falls back to one batch) — run continuously and poll the memory sink
    until the capped source is exhausted."""
    name = f"pysrc_{uuid.uuid4().hex[:8]}"
    q = df.writeStream.format("memory").queryName(name).outputMode("append").start()
    spark = df.sparkSession
    deadline = time.monotonic() + timeout_s
    try:
        while time.monotonic() < deadline:
            if spark.table(name).count() >= expected_rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination()
    return spark.table(name)

FIELDS = {
    "iso": {"kind": "string", "length": 1},
    "capital": {"kind": "string", "length": 2},
    "score": {"kind": "int", "min": 0, "max": 99},
}


def test_python_source_batch_matches_range_datagen(spark):
    """Same ordinal → bit-identical row as the spark.range flavor."""
    want = sorted(map(tuple, datagen_batch(spark, 20, FIELDS).collect()))
    got = sorted(map(tuple, pydatagen_batch(spark, 20, FIELDS, num_partitions=3).collect()))
    assert got == want
    assert len(got) == 20


def test_python_source_plans_requested_partitions(spark):
    df = pydatagen_batch(spark, 100, FIELDS, num_partitions=7)
    assert df.rdd.getNumPartitions() == 7
    assert df.count() == 100


def test_python_source_stream_drains_to_batch_answer(spark):
    """The stream reader's offset walk (rows-per-batch admission, capped
    at max-rows) must reproduce the bounded answer exactly."""
    stream = pydatagen_stream(spark, FIELDS, rows_per_batch=5, max_rows=17)
    got = _drain(stream, expected_rows=17)
    want = datagen_batch(spark, 17, FIELDS)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_python_source_stream_dedup_integration(spark):
    """Reference shape (WithStateTtlJob.java:55-60 datagen + PK view):
    1-char iso keys from the custom source, keep-latest per key — the
    upsert view collapses to ≤26 rows whatever the stream volume."""
    stream = pydatagen_stream(
        spark, {"iso": {"kind": "string", "length": 1}}, rows_per_batch=8, max_rows=64
    )
    batch = datagen_batch(spark, 64, {"iso": {"kind": "string", "length": 1}})
    want = {r["iso"] for r in batch.distinct().collect()}
    got = {r["iso"] for r in _drain(stream.select("iso"), expected_rows=64).distinct().collect()}
    assert got == want  # the PK-upsert view would collapse to these keys
    assert len(got) <= 26


def test_python_source_wall_clock_rate_mode(spark):
    """rows-per-second admission (the reference's literal throttle):
    a high rate drains the capped stream to the same bounded answer."""
    stream = pydatagen_stream(
        spark, FIELDS, max_rows=12, rows_per_second=1000.0
    )
    got = _drain(stream, expected_rows=12)
    want = datagen_batch(spark, 12, FIELDS)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_python_datasource_writer_two_phase_commit(spark, sf_dir, tmp_path):
    """The writer half of the DataSource contract: tasks stage files, the
    driver commits them and stamps _SUCCESS; the data round-trips
    value-identical (timestamps to the microsecond) and no staging
    residue survives a successful commit."""
    import glob
    import os

    from flink_playground_spark.sources.pydatasource import register_sink
    from flink_playground_spark.sources.tables import load_table

    register_sink(spark)
    events = load_table(spark, sf_dir, "events").limit(500)
    out = str(tmp_path / "jsonl_sink")
    events.repartition(4).write.format("pyjsonl").option("path", out).mode(
        "append"
    ).save()

    assert os.path.exists(f"{out}/_SUCCESS")
    assert len(glob.glob(f"{out}/part-*.jsonl")) == 4
    assert not glob.glob(f"{out}/_staging/*")  # staging fully drained

    got = (
        spark.read.schema(events.schema)
        .option("timestampNTZFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
        .json(f"{out}/part-*.jsonl")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, events.collect()))


def test_jsonl_sink_append_accumulates_overwrite_replaces(spark, sf_dir, tmp_path):
    """Regression (r2 ADVICE): a second append must ACCUMULATE part files
    (per-commit unique prefix), and mode('overwrite') must replace the
    previous commit's parts rather than being ignored."""
    import glob

    from flink_playground_spark.sources.pydatasource import register_sink
    from flink_playground_spark.sources.tables import load_table

    register_sink(spark)
    events = load_table(spark, sf_dir, "events").limit(100)
    out = str(tmp_path / "jsonl_sink_modes")
    w = lambda mode: (
        events.repartition(2).write.format("pyjsonl").option("path", out).mode(mode).save()
    )
    w("append")
    w("append")
    assert len(glob.glob(f"{out}/part-*.jsonl")) == 4
    assert spark.read.json(f"{out}/part-*.jsonl").count() == 200
    w("overwrite")
    assert len(glob.glob(f"{out}/part-*.jsonl")) == 2
    assert spark.read.json(f"{out}/part-*.jsonl").count() == 100
