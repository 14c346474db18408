"""Exactly-once transactional bucketed state (streaming/txn_state.py)."""

from __future__ import annotations

import json
import shutil

from pyspark.sql import functions as F

from flink_playground_spark.sources.tables import load_table
from flink_playground_spark.streaming.txn_state import TransactionalKeyState


def _waves(events, k=3):
    return [events.filter(F.col("event_id") % k == i) for i in range(k)]


def _agg_partials(df):
    return df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
    )


def _batch_answer(events):
    return {
        (r.user_id, r.n, round(r.sv, 6))
        for r in events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
        .collect()
    }


def _state_answer(st, spark):
    return {(r.user_id, r.n, round(r.sv, 6)) for r in st.read(spark).collect()}


def test_replayed_batch_does_not_double_count(spark, sf_dir, tmp_path):
    """Aggregate merges under at-least-once delivery: replaying a
    committed batch id is skipped, so counts match the batch answer —
    the failure BucketedKeyState.merge_aggregate would double-count."""
    events = load_table(spark, sf_dir, "events")
    st = TransactionalKeyState(str(tmp_path / "txn"), ["user_id"], n_buckets=8)
    w = _waves(events)
    agg = [F.sum("n").alias("n"), F.sum("sv").alias("sv")]
    assert st.merge_aggregate("q1", 0, _agg_partials(w[0]), agg) is True
    assert st.merge_aggregate("q1", 1, _agg_partials(w[1]), agg) is True
    # the crash-replay: batch 1 delivered again
    assert st.merge_aggregate("q1", 1, _agg_partials(w[1]), agg) is False
    assert st.merge_aggregate("q1", 2, _agg_partials(w[2]), agg) is True
    assert _state_answer(st, spark) == _batch_answer(events)


def test_crash_before_commit_replays_cleanly(spark, sf_dir, tmp_path):
    """Simulated crash between the data write and the manifest commit:
    restore the pre-batch manifest (the data files become orphans), then
    replay the batch — the merge reproduces exactly and orphans stay
    invisible; vacuum removes them without disturbing reads."""
    events = load_table(spark, sf_dir, "events")
    st = TransactionalKeyState(str(tmp_path / "txn"), ["user_id"], n_buckets=8)
    w = _waves(events)
    agg = [F.sum("n").alias("n"), F.sum("sv").alias("sv")]
    st.merge_aggregate("q1", 0, _agg_partials(w[0]), agg)
    before = json.load(open(f"{st.path}/manifest.json"))
    st.merge_aggregate("q1", 1, _agg_partials(w[1]), agg)
    # crash: commit never happened — roll the manifest back, t1 files orphaned
    json.dump(before, open(f"{st.path}/manifest.json", "w"))
    # replay writes t1 again and commits this time
    assert st.merge_aggregate("q1", 1, _agg_partials(w[1]), agg) is True
    st.merge_aggregate("q1", 2, _agg_partials(w[2]), agg)
    assert _state_answer(st, spark) == _batch_answer(events)
    # vacuum drops shadowed versions/orphans; state unchanged
    removed = st.vacuum()
    assert removed >= 0
    assert _state_answer(st, spark) == _batch_answer(events)


def test_keep_latest_replay_skipped(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events")
    st = TransactionalKeyState(str(tmp_path / "kl"), ["user_id"], n_buckets=4)
    w = _waves(events, 2)
    sel = lambda d: d.select("user_id", "ts", "event_id", "event_type")
    assert st.merge_keep_latest("q1", 0, sel(w[0]), "ts", ("event_id",)) is True
    assert st.merge_keep_latest("q1", 1, sel(w[1]), "ts", ("event_id",)) is True
    assert st.merge_keep_latest("q1", 1, sel(w[1]), "ts", ("event_id",)) is False
    from flink_playground_spark.operators.dedup import dedup_latest

    want = {
        tuple(r)
        for r in dedup_latest(sel(events), ["user_id"], "ts", ("event_id",)).collect()
    }
    assert {tuple(r) for r in st.read(spark).collect()} == want


def test_distinct_writers_do_not_collide(spark, sf_dir, tmp_path):
    """A NEW logical query restarting batch ids at 0 is new data, not a
    replay — the writer scope keeps the skip from eating it (the bug a
    global batch-id watermark would have)."""
    events = load_table(spark, sf_dir, "events")
    st = TransactionalKeyState(str(tmp_path / "w"), ["user_id"], n_buckets=4)
    agg = [F.sum("n").alias("n"), F.sum("sv").alias("sv")]
    a, b = _waves(events, 2)
    assert st.merge_aggregate("qA", 0, _agg_partials(a), agg) is True
    assert st.merge_aggregate("qB", 0, _agg_partials(b), agg) is True  # not skipped
    assert _state_answer(st, spark) == _batch_answer(events)


def test_concurrent_merge_is_a_loud_error(spark, sf_dir, tmp_path):
    """The single-writer protocol is enforced, not assumed: a merge
    attempted while another holds the writer lock raises
    ConcurrentWriteError instead of silently dropping commits."""
    import fcntl

    import pytest

    from flink_playground_spark.streaming.txn_state import ConcurrentWriteError

    events = load_table(spark, sf_dir, "events")
    st = TransactionalKeyState(str(tmp_path / "cc"), ["user_id"], n_buckets=4)
    agg = [F.sum("n").alias("n"), F.sum("sv").alias("sv")]
    st.merge_aggregate("q", 0, _agg_partials(events), agg)

    holder = open(f"{st.path}/.writer.lock", "w")
    fcntl.flock(holder, fcntl.LOCK_EX)
    try:
        with pytest.raises(ConcurrentWriteError):
            st.merge_aggregate("q", 1, _agg_partials(events), agg)
    finally:
        fcntl.flock(holder, fcntl.LOCK_UN)
        holder.close()
    # released: the merge goes through
    assert st.merge_aggregate("q", 1, _agg_partials(events), agg) is True


def test_retention_bounds_files_over_long_replay(spark, sf_dir, tmp_path):
    """Steady-state retention: 12 committed batches with retain_txns=3
    leave a bounded version-dir count (old shadowed versions pruned at
    commit), replays are still skipped, and the final state equals the
    batch answer. A zero-retention store run side-by-side keeps growing."""
    import os

    events = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 1200)
    n_waves = 12
    waves = _waves(events, k=n_waves)
    agg = [F.sum("n").alias("n"), F.sum("sv").alias("sv")]

    def tdirs(p):
        return sorted(d for d in os.listdir(p) if d.startswith("t") and d[1:].isdigit())

    st = TransactionalKeyState(str(tmp_path / "r"), ["user_id"], n_buckets=4, retain_txns=3)
    un = TransactionalKeyState(str(tmp_path / "u"), ["user_id"], n_buckets=4, retain_txns=0)
    for i, w in enumerate(waves):
        assert st.merge_aggregate("q", i, _agg_partials(w), agg) is True
        assert un.merge_aggregate("q", i, _agg_partials(w), agg) is True
    # unbounded store: one version dir per commit survives
    assert len(tdirs(tmp_path / "u")) == n_waves
    # retained store: current versions + grace window only
    assert len(tdirs(tmp_path / "r")) <= 3 + 1 + 1, tdirs(tmp_path / "r")
    # replay of an old committed batch: skipped, state untouched
    assert st.merge_aggregate("q", 5, _agg_partials(waves[5]), agg) is False
    assert _state_answer(st, spark) == _batch_answer(events)
    # every manifest-referenced bucket path still exists (pruning never
    # touches the live set)
    man = json.load(open(tmp_path / "r" / "manifest.json"))
    for b, v in man["buckets"].items():
        assert os.path.isdir(tmp_path / "r" / f"t{v}" / f"__bucket={b}")
