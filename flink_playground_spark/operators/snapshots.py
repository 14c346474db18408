"""Versioned table snapshots: time-travel reads on vanilla parquet.

The SCD2 operators (operators/scd.py) answer "which VERSION OF A ROW
was current at time t"; this answers the coarser, table-level question
— "what did the WHOLE TABLE look like at time t" — the Delta/Iceberg
``VERSION AS OF`` / ``TIMESTAMP AS OF`` read, reduced to its essential
mechanics on a plain filesystem:

- every publish writes a complete snapshot under ``_v=<n>/`` and then
  appends one entry to a JSON manifest — the manifest append is the
  COMMIT POINT (readers resolve versions only through the manifest, so
  a torn write that never reached the manifest is invisible, and the
  data-then-manifest order makes publishes crash-safe);
- reads resolve a version (latest, explicit, or latest-at-timestamp)
  driver-side from the manifest — pure metadata — then read exactly
  that snapshot directory.

Full-copy snapshots, not deltas: right for dimension-sized tables
(the reproducibility story: pin the exact dimension a training run
joined against). Fact-scale history wants SCD2 rows or an incremental
table format — documented boundary, not an aspiration.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_path: str) -> str:
    return f"{table_path}/_manifest.json"


def _load_manifest(table_path: str) -> list[dict]:
    p = _manifest_path(table_path)
    if not os.path.exists(p):
        return []
    with open(p) as fh:
        return json.load(fh)


def snapshot_write(df: DataFrame, table_path: str, ts: float | None = None) -> int:
    """Publish a new snapshot; returns its version number.

    ``ts`` (epoch seconds) defaults to now and is what ``TIMESTAMP AS
    OF`` reads resolve against; pass it explicitly for deterministic
    tests or backfills."""
    versions = _load_manifest(table_path)
    version = (max(v["version"] for v in versions) + 1) if versions else 1
    ts = time.time() if ts is None else float(ts)
    if versions and ts < versions[-1]["ts"]:
        raise ValueError(
            f"snapshot ts {ts} precedes the latest published ts "
            f"{versions[-1]['ts']}; history must be append-only"
        )
    data_dir = f"{table_path}/_v={version}"
    df.write.mode("overwrite").parquet(data_dir)
    # data is fully on disk before the manifest learns about it: the
    # manifest append is the commit point
    versions.append({"version": version, "ts": ts})
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(versions, fh)
    os.replace(tmp, _manifest_path(table_path))  # atomic on POSIX
    return version


def snapshot_history(table_path: str) -> list[dict]:
    """Published versions, oldest first: [{"version": n, "ts": t}, ...]."""
    return _load_manifest(table_path)


def read_snapshot(
    spark: SparkSession,
    table_path: str,
    version: int | None = None,
    as_of_ts: float | None = None,
) -> DataFrame:
    """Read a snapshot: ``version`` (VERSION AS OF), ``as_of_ts``
    (TIMESTAMP AS OF: latest snapshot published at or before the
    timestamp), or neither (latest)."""
    if version is not None and as_of_ts is not None:
        raise ValueError("pass version OR as_of_ts, not both")
    versions = _load_manifest(table_path)
    if not versions:
        raise FileNotFoundError(f"no snapshots published at {table_path}")
    if version is not None:
        match = [v for v in versions if v["version"] == version]
        if not match:
            raise ValueError(f"version {version} not in {[v['version'] for v in versions]}")
        chosen = match[0]
    elif as_of_ts is not None:
        eligible = [v for v in versions if v["ts"] <= as_of_ts]
        if not eligible:
            raise ValueError(f"no snapshot at or before ts {as_of_ts}")
        chosen = eligible[-1]
    else:
        chosen = versions[-1]
    return spark.read.parquet(f"{table_path}/_v={chosen['version']}")


def snapshot_vacuum(table_path: str, keep_last: int = 3) -> int:
    """Retention: drop all but the newest ``keep_last`` snapshots.

    The manifest commits FIRST (truncated history), then the orphaned
    snapshot dirs are deleted — a crash in between leaves invisible
    garbage, never a manifest entry pointing at deleted data. Returns
    the number of snapshots removed. Time-travel reads older than the
    retained window fail loudly afterwards (by design — that is what
    retention means)."""
    import shutil

    versions = _load_manifest(table_path)
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    if len(versions) <= keep_last:
        return 0
    drop, keep = versions[:-keep_last], versions[-keep_last:]
    tmp = _manifest_path(table_path) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(keep, fh)
    os.replace(tmp, _manifest_path(table_path))
    for v in drop:
        shutil.rmtree(f"{table_path}/_v={v['version']}", ignore_errors=True)
    return len(drop)
