"""Kafka-shaped log source as a Python DataSource ("kafkalike").

``sources/kafka.py`` builds the real ``format("kafka")`` reader and
raises when the connector jar is absent (as in this image). This module
closes the semantic gap the stub leaves: a source with Kafka's exact
contract — named topics, numbered partitions, per-partition
monotonically increasing offsets, earliest/committed starting positions,
replayable ranges — backed by append-only local JSONL logs instead of
brokers. The emitted schema matches Spark's Kafka source row
(key/value binary, topic, partition, offset, timestamp), so downstream
code written against ``kafka_stream`` runs unchanged against either.

Offsets are the real thing, not a simulation: the stream reader's
``initialOffset``/``latestOffset``/``partitions``/``commit`` walk Spark's
exactly-once replay protocol, a checkpointed query resumes from its
committed per-partition positions, and a batch read accepts Kafka-style
``{"<topic>": {"<partition>": offset}}`` bounds.

Log layout: ``{log_dir}/{topic}/p{partition}.jsonl``; line N = offset N;
each line ``{"key": ..., "value": ..., "ts": iso-µs}``. Offset seeks
scan lines from the file head — fine for the local stand-in; a real
deployment keeps a byte-offset index per segment (what Kafka brokers
do), which slots in at ``_read_range`` without touching the protocol.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator, Sequence
from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = (
    "key binary, value binary, topic string, partition int, "
    "offset bigint, timestamp timestamp_ntz"
)


def _partition_files(log_dir: str, topic: str) -> dict[int, str]:
    tdir = os.path.join(log_dir, topic)
    if not os.path.isdir(tdir):
        return {}
    out = {}
    for f in os.listdir(tdir):
        if f.startswith("p") and f.endswith(".jsonl"):
            out[int(f[1:-6])] = os.path.join(tdir, f)
    return out


def _end_offsets(log_dir: str, topic: str) -> dict[int, int]:
    ends = {}
    for p, path in _partition_files(log_dir, topic).items():
        with open(path, "rb") as fh:
            ends[p] = sum(1 for _ in fh)
    return ends


def produce(log_dir: str, topic: str, partition: int, key: str | None, value: str) -> int:
    """Append one record; returns its offset. (The test-side 'broker'.)"""
    tdir = os.path.join(log_dir, topic)
    os.makedirs(tdir, exist_ok=True)
    path = os.path.join(tdir, f"p{partition}.jsonl")
    offset = 0
    if os.path.exists(path):
        with open(path, "rb") as fh:
            offset = sum(1 for _ in fh)
    rec = {"key": key, "value": value, "ts": datetime(2024, 1, 1).isoformat() + f".{offset:06d}"}
    with open(path, "a") as fh:
        fh.write(json.dumps(rec) + "\n")
    return offset


class _Range(InputPartition):
    def __init__(self, topic: str, path: str, partition: int, start: int, end: int):
        self.topic = topic
        self.path = path
        self.partition = partition
        self.start = start
        self.end = end


def _read_range(rng: _Range) -> Iterator[tuple]:
    with open(rng.path) as fh:
        for off, line in enumerate(fh):
            if off < rng.start:
                continue
            if off >= rng.end:
                break
            rec = json.loads(line)
            key = rec["key"].encode() if rec["key"] is not None else None
            yield (
                key,
                rec["value"].encode(),
                rng.topic,
                rng.partition,
                off,
                datetime.fromisoformat(rec["ts"]),
            )


class _KafkaLikeBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.log_dir = options["log-dir"]
        self.topic = options["topic"]
        self.starting = json.loads(options.get("startingoffsets", "{}"))
        self.ending = json.loads(options.get("endingoffsets", "{}"))

    def partitions(self) -> Sequence[InputPartition]:
        files = _partition_files(self.log_dir, self.topic)
        ends = _end_offsets(self.log_dir, self.topic)
        t_start = self.starting.get(self.topic, {})
        t_end = self.ending.get(self.topic, {})
        return [
            _Range(
                self.topic,
                files[p],
                p,
                int(t_start.get(str(p), 0)),
                int(t_end.get(str(p), ends[p])),
            )
            for p in sorted(files)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        return _read_range(partition)


class _KafkaLikeStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.log_dir = options["log-dir"]
        self.topic = options["topic"]

    def initialOffset(self) -> dict:
        return {str(p): 0 for p in _partition_files(self.log_dir, self.topic)}

    def latestOffset(self) -> dict:
        return {str(p): e for p, e in _end_offsets(self.log_dir, self.topic).items()}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        files = _partition_files(self.log_dir, self.topic)
        out = []
        for p_str, e in end.items():
            p = int(p_str)
            s = int(start.get(p_str, 0))
            if e > s:
                out.append(_Range(self.topic, files[p], p, s, int(e)))
        return out

    def read(self, partition: _Range) -> Iterator[tuple]:
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class KafkaLikeSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kafkalike"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> _KafkaLikeBatchReader:
        return _KafkaLikeBatchReader(self.options)

    def streamReader(self, schema) -> _KafkaLikeStreamReader:
        return _KafkaLikeStreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(KafkaLikeSource)


def kafkalike_batch(
    spark: SparkSession,
    log_dir: str,
    topic: str,
    starting_offsets: dict | None = None,
    ending_offsets: dict | None = None,
) -> DataFrame:
    register(spark)
    r = spark.read.format("kafkalike").option("log-dir", log_dir).option("topic", topic)
    if starting_offsets:
        r = r.option("startingOffsets", json.dumps(starting_offsets))
    if ending_offsets:
        r = r.option("endingOffsets", json.dumps(ending_offsets))
    return r.load()


def kafkalike_stream(spark: SparkSession, log_dir: str, topic: str) -> DataFrame:
    register(spark)
    return (
        spark.readStream.format("kafkalike")
        .option("log-dir", log_dir)
        .option("topic", topic)
        .load()
    )
