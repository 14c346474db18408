"""Late-data semantics (streaming/late_data.py): Flink's allowedLateness
/ sideOutputLateData contract — admission vs side routing at the
window_end + lateness <= watermark boundary, refinement of already-
emitted windows by late-within-lateness rows, exactly-once counts under
batch redelivery."""

import datetime as dt

from pyspark.sql import functions as F

from flink_playground_spark.streaming.late_data import LateDataWindowCounts

BASE = dt.datetime(2024, 5, 1, 0, 0, 0)


def _batch(spark, rows):
    return spark.createDataFrame(
        [(i, BASE + dt.timedelta(minutes=m), k) for i, m, k in rows],
        "event_id long, ts timestamp_ntz, k string",
    )


def _counts(agg, spark):
    df = agg.read_counts(spark)
    return {
        (r["window_start"].isoformat(), r["k"]): r["cnt"]
        for r in df.collect()
    }


def test_first_batch_admits_everything(spark, tmp_path):
    agg = LateDataWindowCounts(str(tmp_path), keys=("k",), window="1 hour", delay_s=0)
    # rows spanning hours 0 and 1, including a "very old" one — no prior
    # watermark exists, so all are admitted (Flink: watermark starts -inf)
    agg.apply_batch(_batch(spark, [(1, 5, "a"), (2, 65, "a"), (3, -600, "b")]), 0)
    assert agg.read_side(spark) is None
    got = _counts(agg, spark)
    assert got[(BASE.isoformat(), "a")] == 1
    assert got[((BASE + dt.timedelta(hours=1)).isoformat(), "a")] == 1


def test_side_routing_and_lateness_refinement(spark, tmp_path):
    # delay 30min, lateness 30min. Batch 0 reaches minute 150 (02:30):
    # watermark for batch 1 = 02:00.
    agg = LateDataWindowCounts(
        str(tmp_path), keys=("k",), window="1 hour", delay_s=1800, allowed_lateness_s=1800
    )
    agg.apply_batch(_batch(spark, [(1, 150, "a"), (2, 10, "a")]), 0)
    # batch 1: window [00:00,01:00) ends 01:00; 01:00 + 30min lateness
    # <= 02:00 watermark -> SIDED. window [01:00,02:00) ends 02:00;
    # 02:00 + 30min > 02:00 -> late but WITHIN lateness: refines counts.
    agg.apply_batch(_batch(spark, [(3, 20, "a"), (4, 70, "a"), (5, 130, "b")]), 1)
    side = agg.read_side(spark).collect()
    assert [r["event_id"] for r in side] == [3]
    assert side[0]["watermark"] == BASE + dt.timedelta(hours=2)
    assert side[0]["batch_id"] == 1
    got = _counts(agg, spark)
    assert got[(BASE.isoformat(), "a")] == 1  # event 2 only; 3 was sided
    assert got[((BASE + dt.timedelta(hours=1)).isoformat(), "a")] == 1  # refined in by 4
    assert got[((BASE + dt.timedelta(hours=2)).isoformat(), "a")] == 1  # event 1
    assert got[((BASE + dt.timedelta(hours=2)).isoformat(), "b")] == 1  # event 5 on time


def test_redelivered_batch_is_noop(spark, tmp_path):
    agg = LateDataWindowCounts(str(tmp_path), keys=("k",), window="1 hour", delay_s=0)
    # batch 0 reaches minute 70 -> watermark 01:10; batch 1's minute-15
    # row closed its [00:00, 01:00) window behind it -> sided
    b0 = _batch(spark, [(1, 5, "a"), (2, 70, "a")])
    b1 = _batch(spark, [(3, 200, "a"), (4, 15, "a")])
    agg.apply_batch(b0, 0)
    agg.apply_batch(b1, 1)
    before_counts = _counts(agg, spark)
    before_side = sorted(r["event_id"] for r in agg.read_side(spark).collect())
    # at-least-once redelivery of batch 1: counts must not double-fold,
    # side files must be rewritten in place, watermark ledger unchanged
    agg.apply_batch(b1, 1)
    assert _counts(agg, spark) == before_counts
    assert sorted(r["event_id"] for r in agg.read_side(spark).collect()) == before_side


def test_batch_with_no_late_rows_does_not_break_side_reads(spark, tmp_path):
    # batch 1 is entirely on time (no side rows -> no side dir written);
    # batch 2 has a late row. read_side must return exactly that row
    # instead of choking on an empty batch-1 directory.
    agg = LateDataWindowCounts(str(tmp_path), keys=("k",), window="1 hour", delay_s=0)
    agg.apply_batch(_batch(spark, [(1, 60, "a")]), 0)
    agg.apply_batch(_batch(spark, [(2, 70, "a")]), 1)  # on time, wm 01:00
    agg.apply_batch(_batch(spark, [(3, 5, "a")]), 2)  # late, wm 01:10
    assert [r["event_id"] for r in agg.read_side(spark).collect()] == [3]


def test_watermark_uses_only_prior_batches(spark, tmp_path):
    # batch 1's own max ts must not affect batch 1's admission decisions
    agg = LateDataWindowCounts(str(tmp_path), keys=("k",), window="1 hour", delay_s=0)
    agg.apply_batch(_batch(spark, [(1, 60, "a")]), 0)  # watermark -> 01:00
    # event 2 at minute 10 (window ends 01:00 <= wm 01:00): sided.
    # event 3 pushes max ts to 10:00 but only for FUTURE batches.
    agg.apply_batch(_batch(spark, [(2, 10, "a"), (3, 600, "a")]), 1)
    assert [r["event_id"] for r in agg.read_side(spark).collect()] == [2]
    got = _counts(agg, spark)
    assert got[((BASE + dt.timedelta(hours=10)).isoformat(), "a")] == 1
