"""Reference: WithDeduplicateJoinJob.java — dedup-keep-latest + outer join.

The Flink job dedups a rate-limited datagen dim to the latest row per
`iso` via `ROW_NUMBER() OVER (PARTITION BY iso ORDER BY ts DESC) = 1`
(:89-97), left-outer-joins `people` with a `STATE_TTL('p'='0h','e'='90d')`
hint (:98-104), INSERTs into a print sink, and prints the compiled plan
(:86-106). Here: deterministic datagen (bounded), both dedup strategies,
the same join, and the engine's compiled-plan JSON artifact.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.plans.spec import compile_plan
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.datagen import datagen_batch
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job2-dedup-join")
    people = from_rows(
        spark,
        [("Alice", 12, "a"), ("Bob", 5, "b"), ("Peter", 13, "c"), ("Paul", 13, "d")],
        ["name", "age", "country"],
        [str, int, str],
    )
    # the reference throttles datagen to 4 rows/s with 1-char fields; the
    # deterministic equivalent synthesizes the same shape, plus a version
    # timestamp so keep-latest has observable effect
    dim = datagen_batch(
        spark,
        64,
        {
            "iso": {"kind": "string", "length": 1},
            "capital": {"kind": "string", "length": 1},
            "ts": {"kind": "timestamp", "start": "2024-01-01 00:00:00", "step_seconds": 1},
        },
    )
    deduped = dedup_latest(dim, "iso", "ts")  # max_by strategy (scale path)
    joined = people.join(deduped, people.country == deduped.iso, "left_outer").select(
        "name", "age", "country", "capital"
    )
    print_sink(joined, "dedup (keep latest per iso) + left outer join")
    # compiled-plan artifact (CompiledPlan.printJsonString parity)
    snap = compile_plan(joined)
    print("== compiled plan (physical, first lines) ==")
    print("\n".join(snap["physical"].splitlines()[:8]))
    spark.stop()


if __name__ == "__main__":
    main()
