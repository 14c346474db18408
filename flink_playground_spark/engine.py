"""EngineSession — the engine's `StreamTableEnvironment` analogue.

The reference's jobs all revolve around a ``StreamTableEnvironment``:
register views (``createTemporaryView``, DataStreamJob.java:93-96),
register temporal table functions (``createTemporarySystemFunction``,
:91), issue SQL (``sqlQuery``), and convert between streams and tables.
This façade binds those verbs to one object over a SparkSession, giving
users of the reference a familiar session surface (SURVEY §2.8 U2:
"a registry of named table-valued helpers in our session object").
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from flink_playground_spark.operators.relational import Table
from flink_playground_spark.operators.temporal import as_of_join, as_of_snapshot, temporal_join
from flink_playground_spark.session import get_spark, tune
from flink_playground_spark.sources.datagen import TableDescriptor
from flink_playground_spark.sources.memory import from_rows


@dataclass
class _Ttf:
    dim: DataFrame
    time_col: str
    keys: list[str]
    tiebreakers: tuple[str, ...]


class EngineSession:
    """``StreamTableEnvironment``-shaped façade over a SparkSession."""

    def __init__(self, spark: SparkSession | None = None):
        self.spark = tune(spark) if spark is not None else get_spark()
        self._ttfs: dict[str, _Ttf] = {}

    # -- sources / catalog -------------------------------------------------
    def from_collection(self, rows, names, types=None) -> DataFrame:
        return from_rows(self.spark, rows, names, types)

    def from_descriptor(self, descriptor: TableDescriptor) -> DataFrame:
        return descriptor.build(self.spark)

    def create_temporary_view(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)

    def from_(self, view: str) -> Table:
        return Table.from_(self.spark, view)

    def sql_query(self, sql: str) -> DataFrame:
        """E1: the SQL string entry point (tableEnv.sqlQuery)."""
        return self.spark.sql(sql)

    # -- temporal table functions (U1/U2) -----------------------------------
    def create_temporal_table_function(
        self,
        name: str,
        dim: DataFrame,
        time_col: str,
        keys: str | Sequence[str],
        tiebreakers: Sequence[str] = (),
    ) -> None:
        """``table.createTemporalTableFunction($("ts"), $("iso"))`` +
        ``createTemporarySystemFunction(name, ttf)``."""
        keys = [keys] if isinstance(keys, str) else list(keys)
        self._ttfs[name] = _Ttf(dim, time_col, keys, tuple(tiebreakers))

    def temporal_join(self, left: DataFrame, ttf_name: str, on, how: str = "inner") -> DataFrame:
        """``LATERAL TABLE(ttf(proctime))`` probe against the registered
        function's *current* version per key (J1/J2)."""
        ttf = self._ttfs[ttf_name]
        return temporal_join(left, ttf.dim, on, ttf.time_col, how, ttf.tiebreakers)

    def as_of_join(self, left: DataFrame, ttf_name: str, on, left_time: str, how: str = "left") -> DataFrame:
        """Event-time probe against the registered function (J1 general)."""
        ttf = self._ttfs[ttf_name]
        return as_of_join(left, ttf.dim, on, left_time, ttf.time_col, how, ttf.tiebreakers)

    def snapshot(self, ttf_name: str) -> DataFrame:
        ttf = self._ttfs[ttf_name]
        return as_of_snapshot(ttf.dim, ttf.keys, ttf.time_col, ttf.tiebreakers)
