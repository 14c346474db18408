"""Materialized-view capstone: the full retraction contract end to end.

The reference prints changelogs (``toChangelogStream``); this example
runs what a production pipeline does with them:

1. REPLAY — events arrive in two deterministic waves;
2. CHANGELOG — the keep-latest view emits Flink-exact +I/-U/+U ops
   (``streaming/changelog.py``);
3. MAINTAIN — two continuous views consume the ops
   (``streaming/ivm.py``): a retractable SUM/COUNT per event type and
   the non-retractable MIN/MAX via multiset state; a redelivered batch
   is applied zero times (exactly-once store), and both views equal the
   batch query over the deduplicated table;
4. WATCH — the numeric drift monitor folds the same waves
   (``streaming/drift.py``): wave 0 is the frozen reference, wave 1 the
   live histogram, PSI terms from state alone;
5. RESCALE — the sum view's state grows; rewrite it under 4x the
   buckets without losing content or replay protection.

Run: ``python examples/pipeline_materialized_views.py``
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.sources.tables import load_table
from flink_playground_spark.streaming.changelog import keep_latest_changelog_stream
from flink_playground_spark.streaming.drift import StreamingDriftMonitor
from flink_playground_spark.streaming.ivm import RetractableAggView, RetractableMinMaxView
from flink_playground_spark.streaming.runners import replay_events_waves

SF = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark()
    work = tempfile.mkdtemp(prefix="mviews_")

    # 1-2. waves -> Flink-exact changelog
    stream = replay_events_waves(spark, SF, waves=2).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    log = keep_latest_changelog_stream(stream, "user_id", "ts", tiebreakers=("event_id",))
    n_ops = log.count()
    print(f"changelog: {n_ops} ops across {log.select('batch_id').distinct().count()} batches")

    # 3. continuous views consume it
    sums = RetractableAggView(f"{work}/sums", ["event_type"], ["value"])
    extrema = RetractableMinMaxView(f"{work}/mm", ["event_type"], "value")
    bids = sorted(r[0] for r in log.select("batch_id").distinct().collect())
    for bid in bids:
        batch = log.filter(F.col("batch_id") == bid)
        sums.apply_batch(batch, int(bid))
        extrema.apply_batch(batch, int(bid))
    # redelivery: applied zero times
    replayed = sums.apply_batch(log.filter(F.col("batch_id") == bids[-1]), int(bids[-1]))
    assert replayed is False

    view = {r["event_type"]: r["cnt"] for r in sums.read(spark).collect()}
    batch_table = dedup_latest(
        load_table(spark, SF, "events"), "user_id", "ts", ("event_id",)
    )
    want = {r["event_type"]: r["cnt"] for r in
            batch_table.groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert view == want
    mm = {r["event_type"]: (r["min_value"], r["max_value"])
          for r in extrema.read(spark).collect()}
    print(f"views equal batch answer over {sum(view.values())} live rows; "
          f"extrema groups={len(mm)}; replay applied={replayed}")

    # 4. drift watch over the same waves
    mon = StreamingDriftMonitor(f"{work}/drift")
    q = (replay_events_waves(spark, SF, waves=2).select("value")
         .writeStream.foreachBatch(lambda b, i: mon.ingest(b, i))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    psi_total = mon.psi(spark).agg(F.round(F.sum("psi_term"), 6).alias("s")).first()["s"]
    print(f"PSI(live vs frozen reference) = {psi_total}")

    # 5. state outgrew its buckets: rescale without losing anything
    sums.state.rebucket(spark, 32)
    still = sums.apply_batch(log.filter(F.col("batch_id") == bids[-1]), int(bids[-1]))
    assert still is False
    assert {r["event_type"]: r["cnt"] for r in sums.read(spark).collect()} == want
    print("rescaled 8->32 buckets: content intact, replay still skipped")
    print("materialized-view loop complete: changelog -> views -> drift -> rescale")


if __name__ == "__main__":
    main()
