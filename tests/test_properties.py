"""Property-based tests (hypothesis): operator semantics vs independent
pandas reference implementations on randomized inputs. Small example
counts — each example runs real Spark jobs."""

from __future__ import annotations

from datetime import datetime, timedelta

import pandas as pd
from hypothesis import given, settings, strategies as st

from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.operators.temporal import as_of_join
from flink_playground_spark.sources.memory import from_rows

BASE_TS = datetime(2024, 1, 1)


def _ts(minutes: int) -> datetime:
    return BASE_TS + timedelta(minutes=minutes)


rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),      # key
        st.integers(0, 30),     # time ordinal
        st.integers(0, 100),    # payload
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(rows=rows_strategy)
def test_dedup_latest_matches_pandas(spark, rows):
    # unique (key, ts, payload) triples: make ordering total via payload tiebreak
    df = from_rows(
        spark,
        [(k, _ts(t), p) for k, t, p in rows],
        ["k", "ts", "p"],
        [int, "timestamp_ntz", int],
    )
    for strategy in ("struct_max", "row_number"):
        got = {
            (r.k, r.ts, r.p)
            for r in dedup_latest(df, "k", "ts", ("p",), strategy=strategy).collect()
        }
        pdf = pd.DataFrame(rows, columns=["k", "t", "p"]).sort_values(["t", "p"])
        want = {
            (k, _ts(int(row.t)), int(row.p))
            for k, row in pdf.groupby("k").last().iterrows()
        }
        assert got == want, strategy


@settings(max_examples=12, deadline=None)
@given(
    left=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 2), st.integers(0, 30), st.integers(0, 99)), min_size=1, max_size=15),
)
def test_as_of_join_matches_merge_asof(spark, left, right):
    # dedup right on (key, ts): keep max payload (deterministic), mirroring
    # the engine's required unique-version precondition
    rdf = pd.DataFrame(right, columns=["k", "t", "v"]).groupby(["k", "t"], as_index=False)["v"].max()
    ldf = pd.DataFrame(left, columns=["k", "t"]).drop_duplicates()
    l_spark = from_rows(
        spark, [(k, _ts(t)) for k, t in ldf.itertuples(index=False)], ["k", "lts"], [int, "timestamp_ntz"]
    )
    r_spark = from_rows(
        spark,
        [(k, _ts(t), int(v)) for k, t, v in rdf.itertuples(index=False)],
        ["k", "rts", "v"],
        [int, "timestamp_ntz", int],
    )
    got = {
        (r.k, r.lts, r.v)
        for r in as_of_join(l_spark, r_spark, ["k"], "lts", "rts", how="left").collect()
    }
    lp = ldf.assign(ts=[_ts(t) for t in ldf.t]).sort_values(["ts", "k"])
    rp = rdf.assign(ts=[_ts(t) for t in rdf.t]).sort_values(["ts", "k"])
    merged = pd.merge_asof(lp, rp, on="ts", by="k", direction="backward")
    want = {
        (int(r.k), r.ts, None if pd.isna(r.v) else int(r.v))
        for r in merged.itertuples(index=False)
    }
    assert got == want


# --- CEP operators vs pure-Python references --------------------------------

SYMS = ["A", "B", "C"]

event_rows = st.lists(
    st.tuples(
        st.integers(0, 2),            # key
        st.integers(0, 40),           # time ordinal (minutes)
        st.sampled_from(SYMS),        # symbol
    ),
    min_size=1,
    max_size=30,
)


def _event_df(spark, rows):
    # unique event ids make every ordering total
    return from_rows(
        spark,
        [(k, _ts(t), s, i) for i, (k, t, s) in enumerate(rows)],
        ["k", "t", "et", "eid"],
        [int, "timestamp_ntz", str, int],
    )


@settings(max_examples=10, deadline=None)
@given(rows=event_rows)
def test_funnel_matches_python_reference(spark, rows):
    from pyspark.sql import functions as F

    from flink_playground_spark.operators.cep import funnel

    df = _event_df(spark, rows)
    et = F.col("et")
    got = {
        (r["k"], r["start_id"], r["ts1"], r["ts2"], r["ts3"])
        for r in funnel(
            df, "k", "t", [et == "A", et == "B", et == "C"], "INTERVAL 15 MINUTES",
            start_cols=[F.col("eid").alias("start_id")],
        ).collect()
    }
    # reference: greedy earliest-next chain per start, all inside deadline
    evs = sorted(
        [(k, _ts(t), s, i) for i, (k, t, s) in enumerate(rows)],
        key=lambda e: (e[1], e[3]),
    )
    want = set()
    for k0, t0, s0, i0 in evs:
        if s0 != "A":
            continue
        deadline = t0 + timedelta(minutes=15)
        cur, chain = t0, []
        for sym in ("B", "C"):
            nxt = [e for e in evs if e[0] == k0 and e[2] == sym and cur < e[1] <= deadline]
            if not nxt:
                chain = None
                break
            cur = min(e[1] for e in nxt)
            chain.append(cur)
        if chain:
            want.add((k0, i0, t0, chain[0], chain[1]))
    assert got == want


@settings(max_examples=10, deadline=None)
@given(rows=event_rows)
def test_match_plus_matches_python_reference(spark, rows):
    from flink_playground_spark.operators.cep import match_plus

    df = _event_df(spark, rows)
    got = {
        (r["k"], r["start_id"], r["n_plus"], r["ts1"], r["ts2"], r["ts3"])
        for r in match_plus(
            df, "k", "t", "et", "A", "B", id_col="eid", tiebreakers=["eid"]
        ).collect()
    }
    want = set()
    by_key: dict[int, list] = {}
    for i, (k, t, s) in enumerate(rows):
        by_key.setdefault(k, []).append((_ts(t), i, s))
    for k0, evs in by_key.items():
        evs.sort()
        j = 0
        while j < len(evs):
            if evs[j][2] == "A":
                run = [evs[j]]
                while j + 1 < len(evs) and evs[j + 1][2] == "A":
                    j += 1
                    run.append(evs[j])
                if j + 1 < len(evs) and evs[j + 1][2] == "B":
                    want.add(
                        (k0, run[0][1], len(run), run[0][0], run[-1][0], evs[j + 1][0])
                    )
            j += 1
    assert got == want


scd_rows = st.lists(
    st.tuples(
        st.integers(0, 2),          # key
        st.integers(0, 15),         # time ordinal
        st.integers(0, 99),         # seq (tiebreaker; may repeat — fine)
        st.sampled_from(["A", "B", "C"]),
    ),
    min_size=1,
    max_size=20,
)


@settings(max_examples=12, deadline=None)
@given(rows=scd_rows)
def test_scd2_build_matches_python_reference(spark, rows):
    """scd2_build vs a straightforward Python SCD2: tie-dedup by max
    (seq), collapse equal consecutive states, close intervals at the
    next change."""
    from flink_playground_spark.operators.scd import scd2_build

    # make (key, ts, seq) unique the way real changelogs are (seq is an
    # event id); hypothesis may repeat, keep the max-seq row per (k, t, s)
    uniq = {}
    for k, t, s, v in rows:
        uniq[(k, t, s)] = v
    data = [(k, t, s, v) for (k, t, s), v in uniq.items()]

    df = from_rows(
        spark,
        [(k, _ts(t), s, v) for k, t, s, v in data],
        ["k", "ts", "seq", "state"],
        [int, "timestamp_ntz", int, str],
    )
    got = {
        (r.k, r.state, r.valid_from, r.valid_to)
        for r in scd2_build(df, ["k"], "ts", ["state"], "seq").collect()
    }

    want = set()
    bykey: dict = {}
    for k, t, s, v in data:
        bykey.setdefault(k, {})
        cur = bykey[k].get(t)
        if cur is None or s > cur[0]:
            bykey[k][t] = (s, v)  # tie-dedup: max seq wins per (k, ts)
    for k, tv in bykey.items():
        hist = sorted(tv.items())  # (t, (s, v)) by time
        collapsed = []
        for t, (_, v) in hist:
            if not collapsed or collapsed[-1][1] != v:
                collapsed.append((t, v))
        for i, (t, v) in enumerate(collapsed):
            nxt = _ts(collapsed[i + 1][0]) if i + 1 < len(collapsed) else None
            want.add((k, v, _ts(t), nxt))
    assert got == want


interval_rows = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 40)),  # key, minute
    min_size=1,
    max_size=18,
)


@settings(max_examples=10, deadline=None)
@given(left=interval_rows, right=interval_rows, bounds=st.tuples(
    st.integers(-12, 12), st.integers(0, 12)))
def test_interval_join_matches_brute_force(spark, left, right, bounds):
    """Bucketized band join == brute-force range predicate for random
    bands (lower may be negative; width may be zero)."""
    from flink_playground_spark.operators.interval import interval_join

    lo, width = bounds
    up = lo + width
    ldf = from_rows(
        spark,
        [(i, k, _ts(t)) for i, (k, t) in enumerate(left)],
        ["lid", "k", "lt"],
        [int, int, "timestamp_ntz"],
    )
    rdf = from_rows(
        spark,
        [(100 + i, k, _ts(t)) for i, (k, t) in enumerate(right)],
        ["rid", "rk", "rt"],
        [int, int, "timestamp_ntz"],
    )
    out = interval_join(ldf, rdf, [("k", "rk")], "lt", "rt", lo * 60, up * 60)
    got = sorted((r.lid, r.rid) for r in out.select("lid", "rid").collect())
    want = sorted(
        (i, 100 + j)
        for i, (k1, t1) in enumerate(left)
        for j, (k2, t2) in enumerate(right)
        if k1 == k2 and lo <= t2 - t1 <= up
    )
    assert got == want
