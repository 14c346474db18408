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
