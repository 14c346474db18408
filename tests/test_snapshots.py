"""Versioned snapshot publish + time-travel reads (operators/snapshots.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_playground_spark.operators.snapshots import (
    read_snapshot,
    snapshot_history,
    snapshot_write,
)
from flink_playground_spark.sources.tables import load_table


def test_snapshot_publish_and_time_travel(spark, sf_dir, tmp_path):
    path = str(tmp_path / "dim_nation")
    nation = load_table(spark, sf_dir, "nation")

    v1 = snapshot_write(nation, path, ts=100.0)
    v2 = snapshot_write(nation.withColumn("n_name", F.upper("n_name")), path, ts=200.0)
    v3 = snapshot_write(nation.limit(3), path, ts=300.0)
    assert (v1, v2, v3) == (1, 2, 3)
    assert [v["version"] for v in snapshot_history(path)] == [1, 2, 3]

    # latest
    assert read_snapshot(spark, path).count() == 3
    # VERSION AS OF
    assert read_snapshot(spark, path, version=1).count() == nation.count()
    got = {r.n_name for r in read_snapshot(spark, path, version=2).collect()}
    assert got == {r.n_name.upper() for r in nation.collect()}
    # TIMESTAMP AS OF: between v2 and v3 resolves to v2; exact ts inclusive
    assert {r.n_name for r in read_snapshot(spark, path, as_of_ts=250.0).collect()} == got
    assert read_snapshot(spark, path, as_of_ts=300.0).count() == 3
    # before history / unknown version / both args -> loud errors
    with pytest.raises(ValueError):
        read_snapshot(spark, path, as_of_ts=50.0)
    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=9)
    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=1, as_of_ts=100.0)
    # append-only history
    with pytest.raises(ValueError):
        snapshot_write(nation, path, ts=299.0)


def test_snapshot_torn_write_invisible(spark, sf_dir, tmp_path):
    """Data written without a manifest entry (simulated crash between the
    two steps) must be invisible to readers."""
    import os

    path = str(tmp_path / "dim")
    nation = load_table(spark, sf_dir, "nation")
    snapshot_write(nation, path, ts=100.0)
    # simulate: snapshot dir appears but the manifest append never ran
    nation.limit(1).write.parquet(f"{path}/_v=99")
    assert [v["version"] for v in snapshot_history(path)] == [1]
    assert read_snapshot(spark, path).count() == nation.count()
    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=99)
    assert os.path.isdir(f"{path}/_v=99")  # garbage, but harmless


def test_snapshot_vacuum_retention(spark, sf_dir, tmp_path):
    """Retention keeps the newest N snapshots; older time-travel reads
    fail loudly; the manifest truncates BEFORE data deletion so a crash
    between the two can never leave a dangling manifest entry."""
    import os

    from flink_playground_spark.operators.snapshots import snapshot_vacuum

    path = str(tmp_path / "dim")
    nation = load_table(spark, sf_dir, "nation")
    for i in range(1, 6):
        snapshot_write(nation.limit(i), path, ts=float(i * 100))
    assert snapshot_vacuum(path, keep_last=2) == 3
    assert [v["version"] for v in snapshot_history(path)] == [4, 5]
    assert read_snapshot(spark, path, version=5).count() == 5
    assert read_snapshot(spark, path, as_of_ts=450.0).count() == 4
    with pytest.raises(ValueError):
        read_snapshot(spark, path, version=2)
    with pytest.raises(ValueError):
        read_snapshot(spark, path, as_of_ts=250.0)  # outside retained window
    assert not os.path.isdir(f"{path}/_v=1")
    assert snapshot_vacuum(path, keep_last=2) == 0  # idempotent
