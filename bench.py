"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``.

Each query is materialized via the ``noop`` datasource — full execution
(scan, shuffles, aggregation) without driver-side collection, so the
number measures the engine, not py4j transfer.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

from flink_playground_spark import get_spark
from flink_playground_spark.queries import REGISTRY


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(pathlib.Path(sf_dir).name.removeprefix("sf") or 0.1)
    spark = get_spark("bench")
    spark.range(10_000).selectExpr("sum(id)").collect()  # JVM warmup

    times: dict[str, float] = {}
    for name, q in REGISTRY.items():
        if not q.bench:
            continue
        best = float("inf")
        for _ in range(2):  # min-of-2: excludes one-time costs (file
            # listing, codegen compilation) from the steady-state number
            df = q.spark_fn(spark, sf_dir)
            t0 = time.perf_counter()
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
