"""Incremental Window Top-N: Flink SQL's windowed ranking pattern.

Flink's Window Top-N (the window TVF feeding ``ROW_NUMBER() OVER
(PARTITION BY window_start ORDER BY cnt DESC) <= N`` — the documented
companion of the window aggregations the reference's
WindowsProctimeAggJob.java:65-81 runs) keeps, per tumbling window, the
N hottest keys as events arrive. Spark's streaming engine cannot chain
a stateful window aggregate into a rank in one query, so the operator
splits exactly along the Flink runtime's own seam:

- **ingestion** maintains the window aggregate incrementally: each
  micro-batch is pre-aggregated to per-``(window_start, key)`` partial
  counts (map-side combine inside the wave — state merge traffic is
  ∝ distinct keys touched, not wave rows) and folded into
  ``TransactionalKeyState`` with SUM. Counts are mergeable aggregates,
  which double-count under foreachBatch's at-least-once delivery, so
  the transactional store's (writer, batch) replay skip is load-bearing
  here, exactly as in streaming/search_index.py.
- **ranking** is evaluated on read, over state alone (never re-touching
  events): a per-window row_number with a deterministic tie-break.
  Rank is NOT distributive — a key outside every wave's local top-N can
  win globally — so ranking partial top-Ns would be wrong; ranking the
  merged counts is exact.

State size is ∝ distinct (window, key), the same bound Flink's own
window rank operator carries until retention fires; ``expire`` drops
windows past a horizon as a transactional predicate delete
(``TransactionalKeyState.prune``), so steady-state size is
∝ live-horizon windows × keys.

Scale shape: per-batch IO ∝ touched buckets; the read-side rank
shuffles only the state relation (one Exchange on window_start), and
Catalyst's window-group-limit pushes N below the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.operators.windows import tumble_agg
from flink_playground_spark.streaming.txn_state import TransactionalKeyState


class StreamingWindowTopN:
    """Maintain per-window key counts over waves; rank any time."""

    def __init__(
        self,
        path: str,
        key_col: str,
        time_col: str = "ts",
        size: str = "1 hour",
        n_buckets: int = 8,
        writer_id: str = "window-topn",
    ):
        self.key_col = key_col
        self.time_col = time_col
        self.size = size
        self.writer_id = writer_id
        self.state = TransactionalKeyState(path, ["window_start", key_col], n_buckets)

    def ingest(self, batch: DataFrame, batch_id: int) -> bool:
        """Fold one wave's per-(window, key) counts into state, exactly
        once per (writer_id, batch_id) — a replayed wave is a no-op.
        Pass the foreachBatch epoch id as ``batch_id``."""
        partials = tumble_agg(
            batch,
            self.time_col,
            self.size,
            [self.key_col],
            [F.count(F.lit(1)).cast("long").alias("cnt")],
        ).select("window_start", self.key_col, "window_end", "cnt")
        return self.state.merge_aggregate(
            self.writer_id,
            batch_id,
            partials,
            # window_end is functionally determined by window_start; MAX
            # is a deterministic way to carry it through the re-aggregate
            [F.max("window_end").alias("window_end"), F.sum("cnt").alias("cnt")],
        )

    def expire(self, spark: SparkSession, older_than) -> int:
        """Window retention: transactionally drop state for windows that
        END before ``older_than`` (a timestamp or ISO string). Returns
        rows removed. IO ∝ buckets holding expired windows; the replay
        ledger survives, so a replayed wave touching expired windows is
        still skipped, never resurrected."""
        return self.state.prune(
            spark, F.col("window_end") < F.lit(older_than).cast("timestamp_ntz")
        )

    def topn(self, spark: SparkSession, n: int = 3) -> DataFrame:
        """Current top-``n`` keys per window from state alone:
        (window_start, window_end, key, cnt, rn) with rn 1..n, ties
        broken by key ascending (deterministic, engine-portable)."""
        state = self.state.read(spark)
        if state is None:
            raise ValueError("window top-n state is empty — ingest first")
        from pyspark.sql import Window

        w = Window.partitionBy("window_start").orderBy(
            F.desc("cnt"), F.asc(self.key_col)
        )
        return (
            state.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= n)
            .select("window_start", "window_end", self.key_col, "cnt", "rn")
        )
