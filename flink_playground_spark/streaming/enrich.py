"""foreachBatch enrichment join (SURVEY §2.3 J4/J5 streaming, §7.4 #1).

The reference's stream-stream LEFT OUTER join with asymmetric state TTL
(probe 1ms / build 90d, ``WithStateTtlJob.java:79-88``,
``WithDeduplicateJoinJob.java:98``) is *semantically* an enrichment join:
don't buffer the probe side, keep only the latest dim row per key. Spark's
faithful-and-simpler mapping (SURVEY §7.4) is ``foreachBatch``: per
micro-batch, fold the batch into a compacted keep-latest dim state, then
join the probe side against the refreshed snapshot.

State lives in a parquet directory compacted per batch (MERGE INTO with
Delta/Iceberg when available; plain parquet rewrite here — the state is
O(distinct keys), not O(stream)).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame

from flink_playground_spark.operators.dedup import dedup_latest


def enrichment_join_stream(
    probe: DataFrame,
    dim_stream: DataFrame,
    on: Sequence[tuple[str, str]],
    dim_keys: Sequence[str],
    dim_order_col: str,
    dim_tiebreakers: Sequence[str] = (),
    select_cols: Sequence | None = None,
    state_dir: str | None = None,
) -> DataFrame:
    """Run the enrichment pattern to completion (availableNow) and return
    the final joined snapshot: ``probe ⟕ latest(dim)``.

    ``probe`` is a static (bounded) DataFrame — the reference's 1ms-TTL
    probe side retains nothing either; ``dim_stream`` is unbounded.
    """
    spark = probe.sparkSession
    state_dir = state_dir or tempfile.mkdtemp(prefix="fps_dim_state_")
    state_path = f"{state_dir}/latest"
    marker = {"has_state": False}

    def fold_batch(batch: DataFrame, epoch_id: int) -> None:
        if marker["has_state"]:
            old = batch.sparkSession.read.parquet(state_path)
            merged = old.unionByName(batch.select(*old.columns))
        else:
            merged = batch
        latest = dedup_latest(merged, list(dim_keys), dim_order_col, dim_tiebreakers)
        tmp = f"{state_dir}/tmp_{epoch_id}_{uuid.uuid4().hex[:6]}"
        latest.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(state_path, ignore_errors=True)
        shutil.move(tmp, state_path)
        marker["has_state"] = True

    q = dim_stream.writeStream.foreachBatch(fold_batch).trigger(availableNow=True).start()
    q.awaitTermination()

    snapshot = spark.read.parquet(state_path) if marker["has_state"] else None
    if snapshot is None:
        raise RuntimeError("dim stream produced no data")
    cond = None
    for l, r in on:
        c = probe[l] == snapshot[r]
        cond = c if cond is None else (cond & c)
    out = probe.join(snapshot, cond, "left_outer")
    return out.select(*select_cols) if select_cols else out
