"""Keep-latest dedup on the arbitrary-state v2 API
(``transformWithStateInPandas``, Spark 4).

Same semantics as :func:`flink_playground_spark.streaming.stateful.
dedup_latest_stream` but built on ``StatefulProcessor`` + typed
``ValueState`` — the API Spark is converging on for custom stateful
operators (state schema evolution, multiple state variables, timers).
Requires the RocksDB state store provider (built into Spark) AND the
``protobuf`` Python runtime (the v2 state-server protocol). The image
has no installed protobuf, but :mod:`streaming.protobuf_compat` aliases
the pure-Python copy the on-machine Google Cloud SDK vendors — installed
at this module's import time so BOTH the driver and the python workers
(which import this module when unpickling the StatefulProcessor, before
PySpark's lazy ``StateMessage_pb2`` import) can speak the protocol. If
no runtime is obtainable the operator stays gated behind
:func:`stateful_v2_available` with the v1 ``applyInPandasWithState``
path as the default engine operator (streaming/stateful.py).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd

from flink_playground_spark.streaming.protobuf_compat import ensure_protobuf

_PROTOBUF_OK = ensure_protobuf()  # before any pyspark.sql.streaming import

from pyspark.sql import DataFrame  # noqa: E402
from pyspark.sql import types as T  # noqa: E402
from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)

ROCKSDB_PROVIDER = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def stateful_v2_available() -> bool:
    """transformWithStateInPandas needs the protobuf Python runtime —
    real, or the vendored cloud-sdk copy protobuf_compat aliases in."""
    return _PROTOBUF_OK or ensure_protobuf()


class KeepLatestProcessor(StatefulProcessor):
    """Per-key ValueState holding the current winning row."""

    def __init__(self, cols: list[str], order_idx: list[int], state_schema: T.StructType):
        self._cols = cols
        self._order_idx = order_idx
        self._state_schema = state_schema

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._latest = handle.getValueState("latest", self._state_schema)

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        best = tuple(self._latest.get()) if self._latest.exists() else None
        for pdf in rows:
            if pdf.empty:
                continue
            local = pdf.sort_values([self._cols[i] for i in self._order_idx], ascending=False).iloc[0]
            cand = tuple(local[c] for c in self._cols)
            if best is None or tuple(cand[i] for i in self._order_idx) > tuple(
                best[i] for i in self._order_idx
            ):
                best = cand
        if best is not None:
            self._latest.update(best)
            yield pd.DataFrame([dict(zip(self._cols, best))])

    def close(self) -> None:
        pass


def dedup_latest_stream_v2(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
    output_mode: str = "Update",
) -> DataFrame:
    """Streaming keep-latest via transformWithStateInPandas. The caller's
    session must use the RocksDB state store provider::

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
                       ROCKSDB_PROVIDER)
    """
    if not stateful_v2_available():
        raise ModuleNotFoundError(
            "transformWithStateInPandas requires the 'protobuf' Python "
            "package (state-server protocol); use "
            "streaming.stateful.dedup_latest_stream (applyInPandasWithState) "
            "in this environment"
        )
    keys = [keys] if isinstance(keys, str) else list(keys)
    cols = list(df.columns)
    order_idx = [cols.index(c) for c in (order_col, *tiebreakers)]
    state_schema = T.StructType([df.schema[c] for c in cols])
    processor = KeepLatestProcessor(cols, order_idx, state_schema)
    return df.groupBy(*keys).transformWithStateInPandas(
        statefulProcessor=processor,
        outputStructType=df.schema,
        outputMode=output_mode,
        timeMode="None",
    )
