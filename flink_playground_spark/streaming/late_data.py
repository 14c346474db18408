"""Allowed lateness + late-data side output — Flink's
``WindowedStream.allowedLateness(...)`` / ``sideOutputLateData(...)``
contract on the Structured Streaming micro-batch engine.

Spark's native watermarking silently DROPS rows that arrive behind the
watermark; Flink's windowed operators are richer and that richness is
what production pipelines rely on:

- a row behind the watermark but within ``allowed_lateness`` still
  lands in its window, refining the previously emitted aggregate;
- a row whose window is past ``watermark - allowed_lateness`` is routed
  to a SIDE OUTPUT (with the watermark that rejected it) instead of
  vanishing — the audit trail that makes data-loss visible.

Reproduced here with ``foreachBatch`` + exactly-once keyed state:

- **watermark**: max event time over all PRIOR batches minus ``delay``
  (Flink advances watermarks between bundles; availableNow replay makes
  this deterministic — batch k's admission decisions depend only on
  batches < k). Stored as a tiny per-batch high-water ledger, replay
  idempotent.
- **window counts**: admitted rows fold per-(window, key) count
  partials into ``TransactionalKeyState`` keyed by (writer, batch) —
  an at-least-once redelivery is a no-op, so refinement never
  double-counts.
- **side output**: rejected rows append under ``side/b{batch_id}/``
  (overwrite per batch id — replays rewrite the same files, appends
  never duplicate), carrying ``batch_id`` and the rejecting watermark.

Flink drops the window STATE at ``window_end + allowed_lateness``; the
row-routing rule here is the same boundary — a row is sided iff
``window_end + allowed_lateness <= watermark``.
"""

from __future__ import annotations

import datetime as _dt
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.streaming.txn_state import TransactionalKeyState


class LateDataWindowCounts:
    """Tumbling-window counts per key with Flink late-data semantics."""

    def __init__(
        self,
        path: str,
        keys=("event_type",),
        ts_col: str = "ts",
        window: str = "1 hour",
        delay_s: float = 1800.0,
        allowed_lateness_s: float = 0.0,
        n_buckets: int = 8,
        writer_id: str = "late_window_counts",
    ):
        self.path = path
        self.keys = list(keys)
        self.ts_col = ts_col
        self.window = window
        self.delay = _dt.timedelta(seconds=delay_s)
        self.lateness_us = round(allowed_lateness_s * 1_000_000)
        self.writer_id = writer_id
        self.counts = TransactionalKeyState(
            f"{path}/counts", ["window_start", "window_end", *self.keys], n_buckets
        )
        os.makedirs(f"{path}/side", exist_ok=True)
        self._hw_path = f"{path}/high_water.json"

    # -- watermark ledger ---------------------------------------------------
    def _high_water(self) -> dict[str, str]:
        if not os.path.exists(self._hw_path):
            return {}
        with open(self._hw_path) as fh:
            return json.load(fh)

    def _watermark(self, batch_id: int) -> _dt.datetime | None:
        """Max event time over batches strictly before ``batch_id`` minus
        the delay — replays of batch k see exactly what the first run of
        batch k saw."""
        prior = [
            _dt.datetime.fromisoformat(v)
            for k, v in self._high_water().items()
            if int(k) < batch_id
        ]
        return max(prior) - self.delay if prior else None

    def _record_high_water(self, batch: DataFrame, batch_id: int) -> None:
        row = batch.agg(F.max(self.ts_col).alias("m")).collect()[0]  # 1 row, bounded
        if row["m"] is None:
            return
        hw = self._high_water()
        hw[str(batch_id)] = row["m"].isoformat()
        tmp = self._hw_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(hw, fh)
        os.replace(tmp, self._hw_path)

    # -- per-batch fold -----------------------------------------------------
    def apply_batch(self, batch: DataFrame, batch_id: int) -> None:
        win = F.window(F.col(self.ts_col), self.window)
        # four actions consume this frame per batch (side probe, side
        # write, count partials, high-water max) — persist so the wave's
        # input is read once, not per action
        with_win = batch.withColumn("window_start", win.start).withColumn(
            "window_end", win.end
        ).persist()
        wm = self._watermark(batch_id)
        if wm is None:
            admitted, side = with_win, None
        else:
            wm_lit = F.lit(wm.isoformat()).cast(with_win.schema["window_end"].dataType)
            beyond = (
                F.col("window_end") + F.expr(f"INTERVAL '{self.lateness_us}' MICROSECOND")
                <= wm_lit
            )
            admitted = with_win.filter(~beyond)
            side = with_win.filter(beyond).withColumn(
                "batch_id", F.lit(batch_id).cast("long")
            ).withColumn("watermark", wm_lit)
        if side is not None and side.limit(1).count() > 0:
            # per-batch-id dir + overwrite: a replayed batch rewrites its
            # own side files instead of appending duplicates. A batch
            # with no late rows writes nothing — an empty parquet dir
            # has no inferable schema and would break read_side (the
            # decision is deterministic per batch, so replays agree).
            side.write.mode("overwrite").parquet(f"{self.path}/side/b{batch_id}")
        partials = admitted.groupBy("window_start", "window_end", *self.keys).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        self.counts.merge_aggregate(
            self.writer_id, batch_id, partials, [F.sum("cnt").cast("long").alias("cnt")]
        )
        self._record_high_water(with_win, batch_id)
        with_win.unpersist()

    # -- readers ------------------------------------------------------------
    def read_counts(self, spark: SparkSession) -> DataFrame | None:
        return self.counts.read(spark)

    def read_side(self, spark: SparkSession) -> DataFrame | None:
        dirs = [
            f"{self.path}/side/{d}"
            for d in sorted(os.listdir(f"{self.path}/side"))
            if d.startswith("b")
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)


def late_window_counts_stream(
    stream: DataFrame, path: str, **kwargs
) -> LateDataWindowCounts:
    """Drain ``stream`` (availableNow) through a LateDataWindowCounts
    instance; returns the folded aggregator for reading counts + side."""
    agg = LateDataWindowCounts(path, **kwargs)
    q = (
        stream.writeStream.foreachBatch(lambda b, i: agg.apply_batch(b, i))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return agg
