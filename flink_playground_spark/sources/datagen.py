"""Datagen connector (SURVEY §2.1 S2/S3/S4).

Reference: Flink's ``datagen`` connector — bounded
(``'number-of-rows'='4'``, ``DataStreamJob.java:83-86``) and unbounded
rate-limited (``'rows-per-second'='4'``, ``'fields.iso.length'='1'``,
``WithDeduplicateJoinJob.java:64-68``), plus the programmatic
``TableDescriptor.forConnector`` form (``TableAPIJob.java:73-82``).

Spark-first mapping:
- bounded  -> ``spark.range(n)`` + JVM-side column synthesis expressions
- unbounded -> ``spark.readStream.format("rate")`` + the same synthesis

Field values are synthesized *deterministically* from the row ordinal via
``xxhash64`` so tests and oracles are reproducible (Flink's datagen is
random; determinism is a capability superset that keeps CI stable).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_ALPHABET = "abcdefghijklmnopqrstuvwxyz"


def _synth_string(ordinal: Column, name: str, length: int) -> Column:
    """Deterministic lowercase string of ``length`` chars from the ordinal."""
    chars = [
        F.substring(
            F.lit(_ALPHABET),
            (F.pmod(F.xxhash64(ordinal, F.lit(name), F.lit(i)), F.lit(26)) + 1).cast("int"),
            1,
        )
        for i in range(length)
    ]
    return F.concat(*chars) if len(chars) > 1 else chars[0]


def _synth_column(ordinal: Column, name: str, spec: dict) -> Column:
    kind = spec.get("kind", "string")
    if kind == "string":
        return _synth_string(ordinal, name, int(spec.get("length", 8)))
    if kind == "int":
        lo, hi = int(spec.get("min", 0)), int(spec.get("max", 2**31 - 1))
        return (F.pmod(F.xxhash64(ordinal, F.lit(name)), F.lit(hi - lo + 1)) + lo).cast("int")
    if kind == "long":
        return F.xxhash64(ordinal, F.lit(name))
    if kind == "double":
        return (F.pmod(F.xxhash64(ordinal, F.lit(name)), F.lit(10**9)) / 10**9).cast("double")
    if kind == "timestamp":
        # monotonically increasing event time, one row per `step` seconds
        start = spec.get("start", "2024-01-01 00:00:00")
        step = float(spec.get("step_seconds", 1.0))
        return F.expr(
            f"cast('{start}' as timestamp_ntz)"
            f" + make_dt_interval(0, 0, 0, cast(__ordinal as decimal(20,6)) * {step})"
        )
    raise ValueError(f"unsupported datagen kind: {kind}")


def datagen_batch(spark: SparkSession, number_of_rows: int, fields: dict[str, dict]) -> DataFrame:
    """Bounded datagen (S2): ``spark.range`` + deterministic synthesis."""
    df = spark.range(number_of_rows).withColumnRenamed("id", "__ordinal")
    for name, spec in fields.items():
        df = df.withColumn(name, _synth_column(F.col("__ordinal"), name, spec))
    return df.drop("__ordinal")


def datagen_stream(spark: SparkSession, rows_per_second: int, fields: dict[str, dict]) -> DataFrame:
    """Unbounded rate-limited datagen (S3): rate source + synthesis.

    The rate source's ``value`` column is the ordinal, so the stream
    produces the same field values as the batch flavor for a given row
    number — streaming results are checkable against batch oracles.
    """
    df = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
        .withColumnRenamed("value", "__ordinal")
    )
    for name, spec in fields.items():
        df = df.withColumn(name, _synth_column(F.col("__ordinal"), name, spec))
    return df.drop("__ordinal", "timestamp")


@dataclass
class TableDescriptor:
    """Programmatic source descriptor (S4), mirroring
    ``TableDescriptor.forConnector("datagen").option(...).schema(...)``
    (``TableAPIJob.java:73-82``) as a thin fluent builder."""

    connector: str
    options: dict = field(default_factory=dict)
    fields: dict = field(default_factory=dict)

    @classmethod
    def for_connector(cls, connector: str) -> "TableDescriptor":
        return cls(connector=connector)

    def option(self, key: str, value) -> "TableDescriptor":
        self.options[key] = value
        return self

    def with_field(self, name: str, **spec) -> "TableDescriptor":
        self.fields[name] = spec
        return self

    def build(self, spark: SparkSession) -> DataFrame:
        if self.connector != "datagen":
            raise ValueError(f"unknown connector: {self.connector}")
        if "number-of-rows" in self.options:
            return datagen_batch(spark, int(self.options["number-of-rows"]), self.fields)
        rps = int(self.options.get("rows-per-second", 1))
        return datagen_stream(spark, rps, self.fields)
