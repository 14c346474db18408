"""Approximate aggregates (functions/approx.py + Spark built-ins):
error bounds vs exact answers, and sketch mergeability — the property
that makes distinct counts tractable at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_playground_spark.functions.approx import approx_distinct_rollup
from flink_playground_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    return load_table(spark, sf_dir, "lineitem")


def test_approx_count_distinct_bound(lineitem):
    exact = lineitem.select(F.countDistinct("l_orderkey")).first()[0]
    approx = lineitem.select(F.approx_count_distinct("l_orderkey", rsd=0.05)).first()[0]
    assert abs(approx - exact) / exact < 0.15  # 3 sigma of the 5% rsd


def test_percentile_approx_bound(lineitem):
    exact = lineitem.selectExpr("percentile(l_extendedprice, 0.5)").first()[0]
    approx = lineitem.selectExpr(
        "percentile_approx(l_extendedprice, 0.5, 10000)"
    ).first()[0]
    assert abs(float(approx) - float(exact)) / float(exact) < 0.01


def test_hll_rollup_groups_and_total(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    per_group, total = approx_distinct_rollup(ev, "event_type", "user_id")
    got = {r["event_type"]: r["approx_distinct"] for r in per_group.collect()}
    exact = {
        r["event_type"]: r["d"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("d")).collect()
    }
    assert set(got) == set(exact)
    for k, e in exact.items():
        assert abs(got[k] - e) / e < 0.1, (k, got[k], e)
    # the grand total comes from MERGING the per-group sketches — it must
    # agree with a direct global sketch (same lgConfigK => same estimate)
    merged = total.first()[0]
    direct = ev.select(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(12)))
    ).first()[0]
    assert merged == direct
    exact_total = ev.select(F.countDistinct("user_id")).first()[0]
    assert abs(merged - exact_total) / exact_total < 0.1


def test_hll_rollup_is_single_scan(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    per_group, total = approx_distinct_rollup(ev, "event_type", "user_id")
    # the total plan aggregates sketches (binary union), not raw rows:
    # one parquet scan, no count-distinct expansion
    plan = total._jdf.queryExecution().executedPlan().toString()
    assert "hll_union_agg" in plan
    assert plan.count("FileScan") == 1
    assert "count(distinct" not in plan.lower()
