"""Z-order layout (operators/layout.py): the Morton code is correct, and
the clustered write measurably shrinks per-file stat ranges on BOTH
dimensions — the property parquet footer pruning keys off."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from flink_playground_spark.operators.layout import zorder_col, zorder_write
from flink_playground_spark.sources.tables import load_table


def test_morton_interleave_golden(spark):
    # bits=2, two columns; bucket grid is the value domain 0..3 directly
    df = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x int, y int"
    )
    got = {
        (r["x"], r["y"]): r["_zval"]
        for r in zorder_col(df, ["x", "y"], bits=2).collect()
    }
    # interleave(x=3 (0b11), y=1 (0b01)): bit i of x at 2i, of y at 2i+1
    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    # width_bucket maps the uniform ints 0..3 onto buckets 0..3 monotonically;
    # adjacent (x,y) cells must get adjacent-curve z values, and the
    # extremes must map exactly
    assert got[(0, 0)] == morton(0, 0) == 0
    assert got[(3, 3)] == morton(3, 3) == 15
    assert len(set(got.values())) == 16  # bijective on the 4x4 grid


def _file_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Average per-file (max-min) span of each column, normalized by the
    global span: ~1.0 = every file covers the whole domain (no pruning
    possible), << 1 = files are tight hyper-rectangles."""
    spans: dict[str, list[float]] = {c: [] for c in cols}
    glo: dict[str, tuple[float, float]] = {}
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) > 4
    for f in files:
        md = pq.read_metadata(f)
        for c in cols:
            idx = md.schema.names.index(c)
            mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
            mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
            spans[c].append(mx - mn)
            lo, hi = glo.get(c, (mn, mx))
            glo[c] = (min(lo, mn), max(hi, mx))
    return {
        c: (sum(v) / len(v)) / (glo[c][1] - glo[c][0]) for c, v in spans.items()
    }


def test_zorder_write_shrinks_file_spans_on_both_dims(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")

    lin = str(tmp_path / "linear")
    # the naive layout: sort by one column only
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(lin)
    zo = str(tmp_path / "zorder")
    zorder_write(ev, ["user_id", "value"], zo, n_files=16)

    lin_spans = _file_spans(lin, ["user_id", "value"])
    zo_spans = _file_spans(zo, ["user_id", "value"])
    # z-order: BOTH dimensions substantially tighter than the full
    # domain, and the non-sort dimension far tighter than the 1-D
    # layout leaves it
    assert zo_spans["user_id"] < 0.5
    assert zo_spans["value"] < 0.5
    assert zo_spans["value"] < 0.7 * lin_spans["value"]

    # and the data survives the round trip
    back = spark.read.parquet(zo)
    assert back.count() == ev.count()
    assert back.agg(F.sum("event_id")).collect()[0][0] == ev.agg(F.sum("event_id")).collect()[0][0]


def test_zorder_skips_files_for_point_range_queries(spark, sf_dir, tmp_path):
    """Count the files whose footer stats admit a 2-D selective predicate:
    the z-ordered layout must admit strictly fewer than the 1-D sort."""
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    lin, zo = str(tmp_path / "lin"), str(tmp_path / "zo")
    ev.repartitionByRange(16, "user_id").sortWithinPartitions("user_id").write.mode(
        "overwrite"
    ).parquet(lin)
    zorder_write(ev, ["user_id", "value"], zo, n_files=16)

    def admitting_files(path, lo_u, hi_u, lo_v, hi_v):
        n = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.read_metadata(f)
            iu = md.schema.names.index("user_id")
            iv = md.schema.names.index("value")
            for g in range(md.num_row_groups):
                su = md.row_group(g).column(iu).statistics
                sv = md.row_group(g).column(iv).statistics
                if su.min <= hi_u and su.max >= lo_u and sv.min <= hi_v and sv.max >= lo_v:
                    n += 1
                    break
        return n

    # the payoff dimension: a selective band on `value`, the column the
    # 1-D layout did NOT sort by — its footer stats admit (nearly) every
    # file, while the z-ordered files are tight on value too
    stats = ev.agg(
        F.min("user_id"), F.max("user_id"),
        F.expr("percentile(value, 0.4)"), F.expr("percentile(value, 0.45)"),
    ).collect()[0]
    lo_u, hi_u, lo_v, hi_v = stats
    zo_n = admitting_files(zo, lo_u, hi_u, lo_v, hi_v)
    lin_n = admitting_files(lin, lo_u, hi_u, lo_v, hi_v)
    assert lin_n >= 12  # 1-D sort cannot skip on the other dimension
    assert zo_n <= lin_n // 2
    # correctness: the same rows come back from both layouts
    pred = (F.col("value") >= lo_v) & (F.col("value") <= hi_v)
    a = sorted(r[0] for r in spark.read.parquet(zo).filter(pred).select("event_id").collect())
    b = sorted(r[0] for r in spark.read.parquet(lin).filter(pred).select("event_id").collect())
    assert a == b


def test_compact_files(spark, tmp_path):
    """64 tiny files collapse to the byte-target count; data survives
    exactly; a sort_by compaction additionally tightens footer spans."""
    import os

    from flink_playground_spark.operators.layout import compact_files
    from flink_playground_spark.sources.tables import load_table

    src = load_table(spark, "/root/testdata/sf0.01", "orders")
    path = str(tmp_path / "frag")
    src.repartition(64).write.parquet(path)
    n_small = sum(1 for e in os.scandir(path) if e.name.endswith(".parquet"))
    assert n_small == 64
    before = src.count()
    checksum = spark.read.parquet(path).agg(
        F.sum(F.xxhash64(*spark.read.parquet(path).columns).cast("decimal(38,0)"))
    ).first()[0]

    total = sum(
        e.stat().st_size for e in os.scandir(path) if e.name.endswith(".parquet")
    )
    stats = compact_files(spark, path, target_bytes=total // 4 + 1)
    assert stats["files_before"] == 64
    assert stats["files_after"] <= 5
    got = spark.read.parquet(path)
    assert got.count() == before
    assert got.agg(F.sum(F.xxhash64(*got.columns).cast("decimal(38,0)"))).first()[0] == checksum
    assert not os.path.exists(path + "._compact_tmp")
    assert not os.path.exists(path + "._compact_old")

    # sorted compaction: per-file o_custkey spans shrink vs round-robin
    import pyarrow.parquet as pq

    def spans(p):
        out = []
        for e in os.scandir(p):
            if not e.name.endswith(".parquet"):
                continue
            md = pq.ParquetFile(e.path).metadata
            i = [c for c in range(len(md.schema)) if md.schema.column(c).name == "o_custkey"][0]
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(i).statistics
                mins.append(st.min); maxs.append(st.max)
            out.append(max(maxs) - min(mins))
        return out

    rr_spans = spans(path)
    compact_files(spark, path, target_bytes=total // 4 + 1, sort_by=["o_custkey"])
    sorted_spans = spans(path)
    assert sum(sorted_spans) < sum(rr_spans) / 2


def test_compact_files_crash_recovery(spark, tmp_path):
    """A crash between the swap's two renames (input moved aside, output
    never landed) is repaired on the next compact_files call: the input
    is restored before anything else runs — data is never lost."""
    import os
    import shutil

    from flink_playground_spark.operators.layout import compact_files
    from flink_playground_spark.sources.tables import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "t")
    src.repartition(8).write.parquet(path)
    n = src.count()
    # simulate the torn state
    os.rename(path, path + "._compact_old")
    assert not os.path.isdir(path)
    stats = compact_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == 8
    assert spark.read.parquet(path).count() == n
    assert not os.path.isdir(path + "._compact_old")


def test_compact_files_stale_old_dir_removed(spark, tmp_path):
    """Crash AFTER the replacement landed but before cleanup: `path` is
    valid and `._compact_old` is a stale leftover. The next run must
    clear it and compact normally instead of wedging on ENOTEMPTY
    (r2 ADVICE)."""
    import os

    from flink_playground_spark.operators.layout import compact_files
    from flink_playground_spark.sources.tables import load_table

    src = load_table(spark, "/root/testdata/sf0.001", "orders")
    path = str(tmp_path / "t")
    src.repartition(8).write.parquet(path)
    n = src.count()
    # simulate: valid compacted data at path + stale moved-aside dir
    src.limit(10).write.parquet(path + "._compact_old")
    stats = compact_files(spark, path, target_bytes=1 << 30)
    assert stats["files_before"] == 8
    assert spark.read.parquet(path).count() == n
    assert not os.path.isdir(path + "._compact_old")
