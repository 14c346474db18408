"""Bucketing: the co-located join must be shuffle-free (plan-verified)."""

from __future__ import annotations

import pytest

from flink_playground_spark.plans.spec import explain_str
from flink_playground_spark.sources.bucketed import save_bucketed
from flink_playground_spark.sources.kafka import kafka_available, kafka_stream
from flink_playground_spark.sources.tables import load_table


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    save_bucketed(events, "ev_b", "user_id", 8, path=str(tmp_path / "ev_b"))
    save_bucketed(customer, "cust_b", "c_custkey", 8, path=str(tmp_path / "cust_b"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ
    try:
        a, b = spark.table("ev_b"), spark.table("cust_b")
        joined = a.join(b, a.user_id == b.c_custkey)
        plan = explain_str(joined, "physical")
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket distribution satisfies the join
        # and the result is still correct
        plain = events.join(customer, events.user_id == customer.c_custkey)
        assert joined.count() == plain.count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS ev_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_kafka_stub_raises_actionable_error(spark):
    if kafka_available(spark):  # pragma: no cover - jar present
        pytest.skip("kafka connector present")
    with pytest.raises(ModuleNotFoundError, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")
