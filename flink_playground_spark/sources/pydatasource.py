"""Custom Python DataSource datagen (Spark 4 ``pyspark.sql.datasource``).

The reference's datagen is a *connector* registered in the table
environment (``'connector' = 'datagen'``, ``WithStateTtlJob.java:55-60``).
``sources/datagen.py`` maps it onto ``spark.range``/rate-source plus
column synthesis; this module implements the same contract as a real
registered source through Spark 4's Python DataSource API — the engine's
demonstration that new connectors (Kafka-shaped, queue-shaped, …) can be
authored in pure Python against public API:

- ``FlinkDatagenSource`` registers as ``spark.read.format("flink_datagen")``.
- The batch reader plans ``num-partitions`` ordinal-range splits — the
  partition-planning hook a 1000-executor scan needs.
- The stream reader tracks a monotonically increasing ordinal offset
  (``initialOffset``/``latestOffset``/``partitions``/``commit`` — the
  exactly-once replay contract), advancing ``rows-per-batch`` per
  micro-batch up to ``max-rows``.

The source emits ONLY row ordinals; field synthesis stays the shared
JVM-side expressions (``datagen._synth_column``), so a Python-source row
is bit-identical to the ``spark.range`` flavor for the same ordinal and
the Python layer stays O(rows) trivial work — generation is not the
bottleneck, and parity is testable.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

from flink_playground_spark.sources.datagen import _synth_column


class _OrdinalRange(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _OrdinalBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("number-of-rows", 4))
        self.parts = max(1, int(options.get("num-partitions", 4)))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n // self.parts)  # ceil
        return [
            _OrdinalRange(i, min(i + step, self.n)) for i in range(0, self.n, step)
        ]

    def read(self, partition: _OrdinalRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i,)


class _OrdinalStreamReader(DataSourceStreamReader):
    """Two admission modes:

    - ``rows-per-batch`` (default): advance a fixed row count per
      micro-batch — deterministic, what tests and oracles want.
    - ``rows-per-second``: the reference datagen's literal wall-clock
      throttle (``'rows-per-second' = '4'``,
      ``WithDeduplicateJoinJob.java:64-68``) — admit elapsed × rate rows.
    Both cap at ``max-rows`` so drains terminate.
    """

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rows-per-batch", 4))
        self.rows_per_second = (
            float(options["rows-per-second"]) if "rows-per-second" in options else None
        )
        self.max_rows = int(options.get("max-rows", 2**31))
        self._current = 0
        self._t0: float | None = None

    def initialOffset(self) -> dict:
        return {"ordinal": 0}

    def latestOffset(self) -> dict:
        if self.rows_per_second is not None:
            import time

            now = time.monotonic()
            if self._t0 is None:
                self._t0 = now
            admitted = int((now - self._t0) * self.rows_per_second)
            self._current = min(max(admitted, self._current), self.max_rows)
        else:
            self._current = min(self._current + self.rows_per_batch, self.max_rows)
        return {"ordinal": self._current}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [_OrdinalRange(int(start["ordinal"]), int(end["ordinal"]))]

    def read(self, partition: _OrdinalRange) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield (i,)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class FlinkDatagenSource(DataSource):
    """``spark.read.format("flink_datagen")`` / ``spark.readStream...``."""

    @classmethod
    def name(cls) -> str:
        return "flink_datagen"

    def schema(self) -> str:
        return "__ordinal bigint"

    def reader(self, schema) -> _OrdinalBatchReader:
        return _OrdinalBatchReader(self.options)

    def streamReader(self, schema) -> _OrdinalStreamReader:
        return _OrdinalStreamReader(self.options)


def register(spark: SparkSession) -> None:
    spark.dataSource.register(FlinkDatagenSource)


def _apply_fields(df: DataFrame, fields: dict[str, dict]) -> DataFrame:
    for name, spec in fields.items():
        df = df.withColumn(name, _synth_column(F.col("__ordinal"), name, spec))
    return df.drop("__ordinal")


def pydatagen_batch(
    spark: SparkSession,
    number_of_rows: int,
    fields: dict[str, dict],
    num_partitions: int = 4,
) -> DataFrame:
    """Bounded datagen through the registered Python DataSource; field
    values are bit-identical to ``datagen.datagen_batch`` per ordinal."""
    register(spark)
    df = (
        spark.read.format("flink_datagen")
        .option("number-of-rows", number_of_rows)
        .option("num-partitions", num_partitions)
        .load()
    )
    return _apply_fields(df, fields)


def pydatagen_stream(
    spark: SparkSession,
    fields: dict[str, dict],
    rows_per_batch: int = 4,
    max_rows: int = 16,
    rows_per_second: float | None = None,
) -> DataFrame:
    """Unbounded datagen stream through the Python DataSource stream
    reader (ordinal offsets, ``rows-per-batch`` admission per micro-batch,
    capped at ``max-rows`` so drains terminate). NB: Spark's Python
    stream sources don't support Trigger.AvailableNow (it falls back to
    a single batch) — drain with a continuous trigger and stop once the
    cap is reached (see tests/test_pydatasource.py)."""
    register(spark)
    r = (
        spark.readStream.format("flink_datagen")
        .option("rows-per-batch", rows_per_batch)
        .option("max-rows", max_rows)
    )
    if rows_per_second is not None:
        r = r.option("rows-per-second", rows_per_second)
    return _apply_fields(r.load(), fields)


# ---------------------------------------------------------------------------
# Writer side: the OTHER half of the Python DataSource contract — a JSONL
# sink with the two-phase commit every distributed writer needs: tasks
# stage their partition's file and return a commit message; the DRIVER
# moves staged files into place and stamps _SUCCESS only if every task
# succeeded. A reader that requires _SUCCESS can never observe a torn
# write — the same data-then-commit-point discipline as
# operators/snapshots.py and streaming/txn_state.py, here at the
# task/driver protocol level Spark exposes through the DataSource API.
# ---------------------------------------------------------------------------

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage  # noqa: E402

_TS_FMT = "%Y-%m-%dT%H:%M:%S.%f"


class _StagedFile(WriterCommitMessage):
    def __init__(self, staged: str):
        self.staged = staged


class _JsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, overwrite: bool = False):
        self.path = options["path"]
        self.overwrite = overwrite

    def write(self, iterator):
        import datetime
        import json
        import os
        import uuid

        staging = f"{self.path}/_staging"
        os.makedirs(staging, exist_ok=True)
        staged = f"{staging}/{uuid.uuid4().hex}.jsonl"

        def enc(v):
            if isinstance(v, datetime.datetime):
                return v.strftime(_TS_FMT)
            raise TypeError(type(v).__name__)

        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=enc) + "\n")
        return _StagedFile(staged)

    def commit(self, messages):
        import glob
        import os
        import uuid

        # Per-commit unique prefix: a second append to the same path must
        # ACCUMULATE files, never clobber an earlier commit's part-00000
        # (r2 ADVICE — os.replace silently destroyed the previous save).
        commit_id = uuid.uuid4().hex[:12]
        old_parts = (
            [
                p
                for p in glob.glob(f"{self.path}/part-*.jsonl")
                if f"part-{commit_id}-" not in p
            ]
            if self.overwrite
            else []
        )
        # crash-safe overwrite order: drop the commit point FIRST (so a
        # _SUCCESS-gated reader never observes the old+new mix as
        # committed), then land the new parts, then retire the old ones,
        # then re-stamp _SUCCESS. At every instant a complete copy exists
        # on disk (old data is deleted only after the new parts landed);
        # a crash mid-commit leaves the directory ungated, never torn-
        # but-stamped.
        if self.overwrite:
            success = f"{self.path}/_SUCCESS"
            if os.path.exists(success):
                os.remove(success)
        for i, m in enumerate(messages):
            os.replace(m.staged, f"{self.path}/part-{commit_id}-{i:05d}.jsonl")
        if self.overwrite:
            for old in old_parts:
                os.remove(old)
        with open(f"{self.path}/_SUCCESS", "w"):
            pass

    def abort(self, messages):
        import os

        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class JsonlSinkSource(DataSource):
    """``df.write.format("pyjsonl").option("path", p).mode("append").save()``"""

    @classmethod
    def name(cls) -> str:
        return "pyjsonl"

    def writer(self, schema, overwrite: bool) -> _JsonlWriter:
        return _JsonlWriter(self.options, overwrite)


def register_sink(spark: SparkSession) -> None:
    spark.dataSource.register(JsonlSinkSource)
