"""Stateful streaming keep-latest deduplication (SURVEY §2.4 W1 streaming,
§7.4 hard part #2).

Flink rewrites ``ROW_NUMBER ... DESC = 1`` on a stream into a stateful
Deduplicate operator (``WithDeduplicateJoinJob.java:89-97``). Spark's
``dropDuplicates`` keeps the *first* row per key; the reference keeps the
*latest*. This operator implements keep-latest with
``applyInPandasWithState``: per-key state holds the current winner (order
value + payload); each micro-batch emits the key's new latest row in
update mode.

State size is O(distinct keys) — the same bound as Flink's Deduplicate
operator; at 1000-executor scale the state store shards by the groupBy
hash partitioning. State TTL (T4/T5) maps to ``GroupStateTimeout``
processing-time timeouts via ``ttl_ms``.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_latest_stream(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
    ttl_ms: int | None = None,
    output_mode: str = "update",
) -> DataFrame:
    """Streaming keep-latest dedup: emits, per micro-batch, the latest row
    for every key that received data (update semantics, mirroring Flink's
    changelog emission of the Deduplicate operator).

    ``ttl_ms`` approximates the reference's ``table.exec.state.ttl``
    (``WithStateTtlJob.java:43-45``): idle keys are evicted after the
    timeout; a later row for the key starts fresh.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_col, *tiebreakers]
    out_schema = df.schema
    # state = the winning row, stored column-wise in field order
    state_schema = T.StructType([out_schema[c] for c in df.columns])
    cols = list(df.columns)
    order_idx = [cols.index(c) for c in order_cols]
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def keep_latest(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        best: tuple[Any, ...] | None = state.get if state.exists else None
        for pdf in pdfs:
            if pdf.empty:
                continue
            # batch-local winner first (vectorized), then compare to state
            local = pdf.sort_values([cols[i] for i in order_idx], ascending=False).iloc[0]
            cand = tuple(local[c] for c in cols)
            if best is None or tuple(cand[i] for i in order_idx) > tuple(best[i] for i in order_idx):
                best = cand
        if best is not None:
            state.update(best)
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
            yield pd.DataFrame([dict(zip(cols, best))])

    # output_mode "append" emits the same changelog rows but is accepted by
    # file sinks (which support checkpoint recovery; memory sinks do not)
    return df.groupBy(*keys).applyInPandasWithState(
        keep_latest, out_schema, state_schema, output_mode, timeout
    )
