"""Retractable aggregates (streaming/ivm.py): additions add,
retractions subtract exactly, emptied groups vanish and can resurrect,
replays are no-ops, tombstone pruning is invisible to reads."""

from decimal import Decimal

from pyspark.sql import functions as F

from flink_playground_spark.streaming.ivm import RetractableAggView


def _ops(spark, rows):
    return spark.createDataFrame(rows, "op string, g string, v double")


def _view(agg, spark):
    df = agg.read(spark)
    if df is None:
        return {}
    return {r["g"]: (r["cnt"], r["sum_v"]) for r in df.collect()}


def test_retraction_lifecycle(spark, tmp_path):
    agg = RetractableAggView(str(tmp_path), ["g"], ["v"], scale=2)
    # batch 0: two inserts into a, one into b
    agg.apply_batch(_ops(spark, [("+I", "a", 1.5), ("+I", "a", 2.5), ("+I", "b", 10.0)]), 0)
    assert _view(agg, spark) == {
        "a": (2, Decimal("4.00")),
        "b": (1, Decimal("10.00")),
    }
    # batch 1: a's 2.5-row updates to 7.5 (retract old, add new); b deleted
    agg.apply_batch(_ops(spark, [("-U", "a", 2.5), ("+U", "a", 7.5), ("-D", "b", 10.0)]), 1)
    assert _view(agg, spark) == {"a": (2, Decimal("9.00"))}
    # batch 2: b resurrects through its tombstone
    agg.apply_batch(_ops(spark, [("+I", "b", 3.25)]), 2)
    assert _view(agg, spark) == {"a": (2, Decimal("9.00")), "b": (1, Decimal("3.25"))}


def test_group_migration_via_retract_add(spark, tmp_path):
    # an update that CHANGES the group key: -U under the old group,
    # +U under the new — the Flink planner's retract-mode shape
    agg = RetractableAggView(str(tmp_path), ["g"], ["v"], scale=2)
    agg.apply_batch(_ops(spark, [("+I", "x", 5.0)]), 0)
    agg.apply_batch(_ops(spark, [("-U", "x", 5.0), ("+U", "y", 5.0)]), 1)
    assert _view(agg, spark) == {"y": (1, Decimal("5.00"))}


def test_replay_is_noop_and_prune_invisible(spark, tmp_path):
    agg = RetractableAggView(str(tmp_path), ["g"], ["v"], scale=2)
    b0 = _ops(spark, [("+I", "a", 1.0), ("+I", "b", 2.0)])
    b1 = _ops(spark, [("-D", "b", 2.0)])
    agg.apply_batch(b0, 0)
    agg.apply_batch(b1, 1)
    before = _view(agg, spark)
    # a replayed retraction batch must NOT subtract twice
    assert agg.apply_batch(b1, 1) is False
    assert _view(agg, spark) == before == {"a": (1, Decimal("1.00"))}
    # pruning the b tombstone changes state files, not the view
    assert agg.prune_tombstones(spark) == 1
    assert _view(agg, spark) == before


def test_minmax_retraction_recovers_runner_up(spark, tmp_path):
    """The case signed scalars cannot handle: retracting the current
    minimum must surface the runner-up; duplicates of the extremum
    retract one at a time."""
    from flink_playground_spark.streaming.ivm import RetractableMinMaxView

    agg = RetractableMinMaxView(str(tmp_path), ["g"], "v")
    agg.apply_batch(_ops(spark, [("+I", "a", 1.0), ("+I", "a", 1.0), ("+I", "a", 5.0)]), 0)
    got = {r["g"]: (r["min_v"], r["max_v"]) for r in agg.read(spark).collect()}
    assert got == {"a": (1.0, 5.0)}
    # retract ONE copy of the min: the other copy still holds it
    agg.apply_batch(_ops(spark, [("-D", "a", 1.0)]), 1)
    got = {r["g"]: (r["min_v"], r["max_v"]) for r in agg.read(spark).collect()}
    assert got == {"a": (1.0, 5.0)}
    # retract the last copy: runner-up 5.0 becomes min; replay is a no-op
    b2 = _ops(spark, [("-D", "a", 1.0)])
    agg.apply_batch(b2, 2)
    assert agg.apply_batch(b2, 2) is False
    got = {r["g"]: (r["min_v"], r["max_v"]) for r in agg.read(spark).collect()}
    assert got == {"a": (5.0, 5.0)}
    assert agg.prune_tombstones(spark) == 1  # the emptied 1.0 row


def test_streaming_drift_monitor_replay_and_one_sided_buckets(spark, tmp_path):
    """Reference freezes at batch 0; a redelivered live wave must not
    shift the live histogram; buckets present on only one side get the
    smoothed floor instead of vanishing."""
    from flink_playground_spark.streaming.drift import StreamingDriftMonitor

    mon = StreamingDriftMonitor(str(tmp_path), bucket_width=10.0)
    ref = spark.createDataFrame([(5.0,), (15.0,), (15.0,)], "value double")
    live = spark.createDataFrame([(15.0,), (95.0,)], "value double")
    assert mon.ingest(ref, 0) is True
    assert mon.ingest(live, 1) is True
    assert mon.ingest(live, 1) is False  # replay: no double count
    rows = {r["bucket"]: (r["n_a"], r["n_b"]) for r in mon.psi(spark).collect()}
    assert rows == {0: (1, 0), 1: (2, 1), 9: (0, 1)}
    terms = [r["psi_term"] for r in mon.psi(spark).collect()]
    assert all(t is not None for t in terms)  # smoothing keeps ln finite


def test_drift_monitor_null_values_match_batch_grouping(spark, tmp_path):
    """NULL values bucket to NULL; the null-safe join must merge the two
    sides' NULL buckets into ONE row (as a batch GROUP BY would), not
    split them."""
    from flink_playground_spark.streaming.drift import StreamingDriftMonitor

    mon = StreamingDriftMonitor(str(tmp_path), bucket_width=10.0)
    mon.ingest(spark.createDataFrame([(5.0,), (None,)], "value double"), 0)
    mon.ingest(spark.createDataFrame([(None,), (None,)], "value double"), 1)
    rows = {r["bucket"]: (r["n_a"], r["n_b"]) for r in mon.psi(spark).collect()}
    assert rows == {0: (1, 0), None: (1, 2)}
