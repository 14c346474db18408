"""Bucketized interval (band) join — operators/interval.py: parity with
the naive range-predicate join, exactly-once pair emission, negative and
degenerate bands, left-outer survival."""

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from flink_playground_spark.operators.interval import interval_join

BASE = dt.datetime(2024, 3, 1, 0, 0, 0)


def _frames(spark, n_left=60, n_right=80, keys=4, seed=3):
    rng = random.Random(seed)
    lrows = [
        (i, rng.randrange(keys), BASE + dt.timedelta(seconds=rng.randrange(0, 7200)))
        for i in range(n_left)
    ]
    rrows = [
        (1000 + i, rng.randrange(keys), BASE + dt.timedelta(seconds=rng.randrange(0, 7200)))
        for i in range(n_right)
    ]
    left = spark.createDataFrame(lrows, "lid long, k long, lt timestamp")
    right = spark.createDataFrame(rrows, "rid long, rk long, rt timestamp")
    return left, right, lrows, rrows


def _brute(lrows, rrows, lo, up):
    return sorted(
        (l[0], r[0])
        for l in lrows
        for r in rrows
        if l[1] == r[1] and lo <= (r[2] - l[2]).total_seconds() <= up
    )


@pytest.mark.parametrize("lo,up", [(0, 600), (-300, 300), (-900, -60)])
def test_matches_brute_force(spark, lo, up):
    left, right, lrows, rrows = _frames(spark, seed=lo * 7 + up)
    out = interval_join(left, right, [("k", "rk")], "lt", "rt", lo, up)
    got = sorted((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect())
    assert got == _brute(lrows, rrows, lo, up)
    assert len(got) == len(set(got)), "pair emitted more than once"


def test_zero_width_band_is_exact_offset(spark):
    left, right, lrows, rrows = _frames(spark, seed=9)
    # manufacture exact offsets so the degenerate path has matches
    right2 = right.withColumn("rt", F.col("rt") + F.expr("INTERVAL 60 SECONDS"))
    rrows2 = [(rid, k, t + dt.timedelta(seconds=60)) for rid, k, t in rrows]
    out = interval_join(left, right2, [("k", "rk")], "lt", "rt", 60, 60)
    got = sorted((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect())
    assert got == _brute(lrows, rrows2, 60, 60)


def test_left_outer_keeps_unmatched_once(spark):
    left = spark.createDataFrame(
        [(1, 7, BASE), (2, 7, BASE + dt.timedelta(hours=5))], "lid long, k long, lt timestamp"
    )
    right = spark.createDataFrame(
        [(10, 7, BASE + dt.timedelta(minutes=5))], "rid long, rk long, rt timestamp"
    )
    out = interval_join(left, right, [("k", "rk")], "lt", "rt", 0, 600, how="left").collect()
    by_lid = {}
    for r in out:
        by_lid.setdefault(r["lid"], []).append(r["rid"])
    assert by_lid == {1: [10], 2: [None]}


def test_timedelta_bounds_and_validation(spark):
    left, right, lrows, rrows = _frames(spark, seed=1)
    out = interval_join(
        left, right, [("k", "rk")], "lt", "rt", dt.timedelta(0), dt.timedelta(minutes=10)
    )
    got = sorted((r["lid"], r["rid"]) for r in out.select("lid", "rid").collect())
    assert got == _brute(lrows, rrows, 0, 600)
    with pytest.raises(ValueError, match="exceeds"):
        interval_join(left, right, [("k", "rk")], "lt", "rt", 10, 0)
    with pytest.raises(ValueError, match="disjoint"):
        interval_join(left, left.alias("x"), "k", "lt", "lt", 0, 10)


def test_same_name_join_key_using_semantics(spark):
    """A join key sharing its name on both sides works (USING: output
    keeps the left copy, one column), in both band widths."""
    left = spark.createDataFrame([(1, 7, BASE)], "lid long, k long, lt timestamp")
    right = spark.createDataFrame(
        [(10, 7, BASE + dt.timedelta(minutes=5))], "rid long, k long, rt timestamp"
    )
    out = interval_join(left, right, "k", "lt", "rt", 0, 600)
    assert out.columns.count("k") == 1
    assert [(r["lid"], r["rid"], r["k"]) for r in out.collect()] == [(1, 10, 7)]
    zero = interval_join(left, right, ["k"], "lt", "rt", 300, 300)
    assert [(r["lid"], r["rid"]) for r in zero.select("lid", "rid").collect()] == [(1, 10)]


def test_plan_is_equi_join_on_bucket(spark):
    left, right, _, _ = _frames(spark)
    out = interval_join(left, right, [("k", "rk")], "lt", "rt", 0, 600)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
