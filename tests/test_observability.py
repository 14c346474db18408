"""observe() metrics: computed by the observed job's own tasks — no
second scan — in both batch and streaming."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_playground_spark.observability import observe_stream, observed, quality_metrics
from flink_playground_spark.sources.tables import load_table


def test_batch_observation_matches_direct_aggregates(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    df, obs = observed(events, *quality_metrics(["props", "user_id"], "value"))
    n = df.count()  # the action that also computes the metrics
    got = obs.get
    assert got["n_rows"] == n
    direct = events.agg(
        F.sum(F.col("props").isNull().cast("long")),
        F.sum(F.col("user_id").isNull().cast("long")),
        F.min("value"),
        F.max("value"),
    ).first()
    assert got["n_null_props"] == direct[0]
    assert got["n_null_user_id"] == direct[1]
    assert got["min_value"] == direct[2]
    assert got["max_value"] == direct[3]


def test_streaming_observation_reports_per_batch(spark, sf_dir):
    from flink_playground_spark.streaming.runners import replay_events_waves

    stream = replay_events_waves(spark, sf_dir, waves=2)
    stream = observe_stream(stream, "ingest", *quality_metrics(["props"], "value"))
    q = (
        stream.writeStream.format("noop")
        .trigger(availableNow=True)
        .option("checkpointLocation", f"/tmp/obs_ck_{time.time_ns()}")
        .start()
    )
    q.awaitTermination()
    batches = [p for p in q.recentProgress if p["observedMetrics"].get("ingest")]
    assert len(batches) == 2  # one metric row per wave
    total = sum(p["observedMetrics"]["ingest"]["n_rows"] for p in batches)
    assert total == load_table(spark, sf_dir, "events").count()
    for p in batches:
        m = p["observedMetrics"]["ingest"]
        assert m["n_null_props"] == 0
        assert m["min_value"] <= m["max_value"]
