"""Golden unit fixtures — the reference's own literal datasets and their
hand-checked expected outputs (FIXTURES.md §A; semantics recorded in the
reference's comments, e.g. WithStateTtlJob.java:75, CrossJoinJob.java:51).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_playground_spark.operators.dedup import dedup_latest, pk_upsert_view
from flink_playground_spark.operators.temporal import as_of_join, temporal_join
from flink_playground_spark.operators.unnest import unnest_outer
from flink_playground_spark.operators.windows import tumble_agg
from flink_playground_spark.operators.relational import Table, col
from flink_playground_spark.sources.memory import from_rows


def _people(spark):
    # DataStreamJob.java:63-73
    return from_rows(
        spark,
        [("Alice", 12, "a"), ("Bob", 5, "b"), ("Peter", 13, "c"), ("Paul", 13, "d")],
        ["name", "age", "country"],
        [str, int, str],
    )


def _countries(spark):
    # versioned dim: two versions for 'a', one for 'b'; none for 'c'/'d'
    return from_rows(
        spark,
        [
            ("a", "old-a", datetime(2024, 1, 1, 0, 0, 0)),
            ("a", "new-a", datetime(2024, 1, 2, 0, 0, 0)),
            ("b", "cap-b", datetime(2024, 1, 1, 12, 0, 0)),
        ],
        ["iso", "capital", "ts"],
        [str, str, "timestamp_ntz"],
    )


def test_dedup_latest_keeps_latest_version(spark):
    out = dedup_latest(_countries(spark), "iso", "ts").orderBy("iso").collect()
    assert [(r.iso, r.capital) for r in out] == [("a", "new-a"), ("b", "cap-b")]


def test_dedup_strategies_agree(spark):
    want = None
    for strategy in ("struct_max", "max_by", "row_number"):
        got = sorted(map(tuple, dedup_latest(_countries(spark), "iso", "ts", strategy=strategy).collect()))
        assert want is None or got == want, strategy
        want = got


def test_flagship_dedup_join_shape(spark):
    """WithDeduplicateJoinJob.java:88-104: people ⟕ dedup-latest(countries)."""
    latest = dedup_latest(_countries(spark), "iso", "ts")
    people = _people(spark)
    out = people.join(latest, people.country == latest.iso, "left_outer").select(
        "name", "country", "capital"
    )
    got = {(r.name, r.capital) for r in out.collect()}
    assert got == {("Alice", "new-a"), ("Bob", "cap-b"), ("Peter", None), ("Paul", None)}


def test_pk_upsert_collapses_duplicate_keys(spark):
    """WithStateTtlJob.java:62-77: 4 rows for key 'a' behave as upserts; the
    join must match 1 row (the latest), not 4 (comment at :75)."""
    dim = from_rows(
        spark,
        [("a", "a", 1), ("a", "b", 2), ("a", "c", 3), ("a", "d", 4)],
        ["iso", "capital", "arrival"],
        [str, str, int],
    )
    upsert = pk_upsert_view(dim, "iso", "arrival")
    people = _people(spark)
    out = people.join(upsert, people.country == upsert.iso, "left_outer").select("name", "capital")
    got = {(r.name, r.capital) for r in out.collect()}
    assert got == {("Alice", "d"), ("Bob", None), ("Peter", None), ("Paul", None)}


def test_unnest_outer_preserves_empty_array(spark):
    """CrossJoinJob.java:47-59: (a,[{b}]) and (b,[]) -> (a,b),(b,NULL)."""
    df = from_rows(
        spark,
        [("a", [("b",)]), ("b", [])],
        ["id", "items"],
        [str, "array<struct<item_id:string>>"],
    )
    out = unnest_outer(df, "items")
    got = {(r.id, r.item_id) for r in out.collect()}
    assert got == {("a", "b"), ("b", None)}


def test_temporal_join_current_version(spark):
    """DataStreamJob.java:88-120: LATERAL TABLE(ttf) probes the latest
    version; left-outer keeps unmatched probe rows."""
    people = _people(spark)
    out = temporal_join(people, _countries(spark), [("country", "iso")], "ts", how="left")
    got = {(r.name, r.capital) for r in out.collect()}
    assert got == {("Alice", "new-a"), ("Bob", "cap-b"), ("Peter", None), ("Paul", None)}


def test_as_of_join_event_time(spark):
    probes = from_rows(
        spark,
        [
            ("p1", "a", datetime(2024, 1, 1, 6, 0, 0)),   # after old-a only
            ("p2", "a", datetime(2024, 1, 3, 0, 0, 0)),   # after new-a
            ("p3", "a", datetime(2023, 12, 31, 0, 0, 0)), # before any version
            ("p4", "b", datetime(2024, 1, 1, 12, 0, 0)),  # exact match boundary
            ("p5", "z", datetime(2024, 1, 1, 0, 0, 0)),   # unknown key
        ],
        ["pid", "key", "pt"],
        [str, str, "timestamp_ntz"],
    )
    out = as_of_join(probes, _countries(spark), [("key", "iso")], "pt", "ts", how="left")
    got = {(r.pid, r.capital) for r in out.collect()}
    assert got == {("p1", "old-a"), ("p2", "new-a"), ("p3", None), ("p4", "cap-b"), ("p5", None)}
    inner = as_of_join(probes, _countries(spark), [("key", "iso")], "pt", "ts", how="inner")
    assert {r.pid for r in inner.collect()} == {"p1", "p2", "p4"}


def test_tumble_agg_counts(spark):
    """WindowsProctimeAggJob.java:65-81 with deterministic event time."""
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 10)),
        ("a", datetime(2024, 1, 1, 0, 0, 50)),
        ("a", datetime(2024, 1, 1, 0, 1, 10)),
        ("b", datetime(2024, 1, 1, 0, 2, 5)),
    ]
    df = from_rows(spark, rows, ["iso", "ts"], [str, "timestamp_ntz"])
    out = tumble_agg(df, "ts", "1 minute", ["iso"], [F.count(F.lit(1)).alias("cnt")])
    got = {(r.iso, r.window_start.minute, r.cnt) for r in out.collect()}
    assert got == {("a", 0, 2), ("a", 1, 1), ("b", 2, 1)}


def test_tumble_offset_shifts_alignment(spark):
    """Flink's optional TUMBLE offset argument (window(startTime=...)):
    1-minute windows aligned to :30 — a row at 00:00:50 lands in the
    [00:00:30, 00:01:30) window, not [00:00:00, 00:01:00)."""
    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 10)),  # -> window starting 23:59:30
        ("a", datetime(2024, 1, 1, 0, 0, 50)),  # -> window starting 00:00:30
        ("a", datetime(2024, 1, 1, 0, 1, 10)),  # -> window starting 00:00:30
    ]
    df = from_rows(spark, rows, ["iso", "ts"], [str, "timestamp_ntz"])
    out = tumble_agg(
        df, "ts", "1 minute", ["iso"], [F.count(F.lit(1)).alias("cnt")], offset="30 seconds"
    )
    got = {(r.window_start.strftime("%H:%M:%S"), r.cnt) for r in out.collect()}
    assert got == {("23:59:30", 1), ("00:00:30", 2)}


def test_resample_locf_golden(spark):
    """Gap-filling semantics: values carry forward through empty buckets,
    the grid starts at the bucket floor of the first observation (NULL
    there if the observation isn't exactly on the boundary... it is
    here, so filled), ties on observation time resolve by tiebreaker."""
    from flink_playground_spark.operators.temporal import resample_locf

    rows = [
        (1, "u", datetime(2024, 1, 1, 1, 0), 10.0),
        (2, "u", datetime(2024, 1, 1, 1, 0), 20.0),   # tie: higher id wins
        (3, "u", datetime(2024, 1, 1, 4, 30), 30.0),  # lands inside bucket 04:00
    ]
    df = from_rows(
        spark, rows, ["event_id", "k", "ts", "value"], [int, str, "timestamp_ntz", float]
    )
    out = resample_locf(
        df, ["k"], "ts", step="1 hour", value_cols=["value"], tiebreakers=("event_id",)
    )
    got = {r.grid_ts.hour: r.value for r in out.collect()}
    # buckets 01..04; 02/03 carry the tie-winner forward; 04 precedes the
    # 04:30 observation, so it still carries 20.0
    assert got == {1: 20.0, 2: 20.0, 3: 20.0, 4: 20.0}


def test_sessionize_dynamic_gap_golden(spark):
    """Per-event gaps: a purchase (2h gap) holds the session open across
    a silence that would split click-only (30min gap) traffic; an event
    landing exactly at the previous window's end starts a NEW session
    (half-open windows)."""
    from flink_playground_spark.operators.windows import sessionize_dynamic

    rows = [
        (1, "u", "click", datetime(2024, 1, 1, 0, 0)),      # end 00:30
        (2, "u", "purchase", datetime(2024, 1, 1, 0, 10)),  # end 02:10 holds open
        (3, "u", "click", datetime(2024, 1, 1, 1, 30)),     # < 02:10: same session
        (4, "u", "click", datetime(2024, 1, 1, 2, 10)),     # == max end: NEW session
        (5, "v", "click", datetime(2024, 1, 1, 0, 0)),      # end 00:30
        (6, "v", "click", datetime(2024, 1, 1, 1, 0)),      # past it: new session
    ]
    df = from_rows(
        spark, rows, ["event_id", "user", "etype", "ts"], [int, str, str, "timestamp_ntz"]
    )
    gap = F.when(F.col("etype") == "purchase", 7200).otherwise(1800)
    out = sessionize_dynamic(df, ["user"], "ts", gap.cast("double"), tiebreakers=("event_id",))
    got = {r.event_id: (r.user, r.session_id) for r in out.collect()}
    assert got == {
        1: ("u", 1), 2: ("u", 1), 3: ("u", 1), 4: ("u", 2),
        5: ("v", 1), 6: ("v", 2),
    }


def test_table_api_fluent(spark):
    """TableAPIJob.java:85-90 via the fluent Table façade."""
    _people(spark).createOrReplaceTempView("people")
    dedup_latest(_countries(spark), "iso", "ts").createOrReplaceTempView("countries")
    out = (
        Table.from_(spark, "people")
        .left_outer_join(Table.from_(spark, "countries"), col("country") == col("iso"))
        .select("name", "country", "capital")
    )
    got = {(r.name, r.capital) for r in out.df.collect()}
    assert got == {("Alice", "new-a"), ("Bob", "cap-b"), ("Peter", None), ("Paul", None)}


def test_as_of_join_broadcast_strategy_matches_union_sort(spark):
    probes = from_rows(
        spark,
        [
            ("p1", "a", datetime(2024, 1, 1, 6, 0, 0)),
            ("p2", "a", datetime(2024, 1, 3, 0, 0, 0)),
            ("p3", "a", datetime(2023, 12, 31, 0, 0, 0)),
            ("p4", "b", datetime(2024, 1, 1, 12, 0, 0)),
            ("p5", "z", datetime(2024, 1, 1, 0, 0, 0)),
        ],
        ["pid", "key", "pt"],
        [str, str, "timestamp_ntz"],
    )
    for how in ("left", "inner"):
        a = as_of_join(probes, _countries(spark), [("key", "iso")], "pt", "ts", how=how)
        b = as_of_join(
            probes, _countries(spark), [("key", "iso")], "pt", "ts", how=how,
            strategy="broadcast", left_id="pid",
        )
        assert sorted(map(tuple, a.select("pid", "capital").collect())) == sorted(
            map(tuple, b.select("pid", "capital").collect())
        ), how


def test_as_of_join_auto_strategy(spark, sf_dir):
    """strategy='auto' picks broadcast for a small version table (same
    result as both explicit strategies) and falls back to union_sort
    without left_id."""
    from flink_playground_spark.operators.temporal import as_of_join
    from flink_playground_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    versions = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select("user_id", F.col("ts").alias("vts"), "value")
    )
    want = sorted(
        map(
            tuple,
            as_of_join(
                events, versions, on=[("user_id", "user_id")],
                left_time="ts", right_time="vts", strategy="union_sort",
            ).collect(),
        )
    )
    got_auto = sorted(
        map(
            tuple,
            as_of_join(
                events, versions, on=[("user_id", "user_id")],
                left_time="ts", right_time="vts", strategy="auto", left_id="event_id",
            ).collect(),
        )
    )
    got_auto_noid = sorted(
        map(
            tuple,
            as_of_join(
                events, versions, on=[("user_id", "user_id")],
                left_time="ts", right_time="vts", strategy="auto",
            ).collect(),
        )
    )
    assert got_auto == want
    assert got_auto_noid == want


def test_cumulate_window_tvf(spark):
    """CUMULATE semantics: a row lands in every expanding window
    [base, base+k*step) with end > its timestamp; the last step equals
    the tumble window."""
    from flink_playground_spark.operators.windows import cumulate

    df = spark.createDataFrame(
        [("a", "2024-01-01 10:05:00"), ("b", "2024-01-01 10:40:00")],
        "k string, ts string",
    ).select("k", F.col("ts").cast("timestamp_ntz").alias("ts"))
    got = {
        (r["k"], str(r["window_start"]), str(r["window_end"]))
        for r in cumulate(df, "ts", "1 hour", "30 minutes").collect()
    }
    assert got == {
        ("a", "2024-01-01 10:00:00", "2024-01-01 10:30:00"),  # partial
        ("a", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),  # full
        ("b", "2024-01-01 10:00:00", "2024-01-01 11:00:00"),  # only full (t>=10:30)
    }
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        cumulate(df, "ts", "1 hour", "25 minutes")
