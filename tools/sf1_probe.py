"""sf1 floor check (round-14 verdict Next #8): time the board's top
rows at the 10x step-up fixture, at two core counts, so the next round
knows where real compute lives vs per-query fixed floors.

Usage::

    SPARK_GRAFT_CPUS=32 python tools/sf1_probe.py [out.json]

Runs each probe query min-of-2 (construction + noop, the bench
protocol) against BOTH /root/testdata/sf0.1 and .scaledata/sf1 in one
session, so the sf1/sf0.1 ratio is same-host. A ratio near 10x = the
row is compute/data-bound (core count should matter); near 1x = the row
is fixed-floor-bound (driver/jobs/plan time).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark  # noqa: E402

PROBES = [
    "streaming_ann_pq_topk",
    "streaming_window_topn",
    "dedup_clusters",
    "semantic_dedup_clusters",
    "ann_ivfpq_topk",
    "exact_substring_dedup",
    "video_scene_neardup",
    "ann_pq_topk",
    "semantic_clusters",
    "bigram_lm_score",
    "corpus_sampling",
    "q1_pricing_summary",
    "q8_market_share",
    "cep_pattern_match",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "plans/r14/sf1_probe.json"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("sf1-probe")
    spark.range(10_000).selectExpr("sum(id)").collect()
    from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

    allq = {**REGISTRY, **EXTRA_REGISTRY}
    result = {"cpus": int(cpus), "reps": 2, "queries": {}}
    for name in PROBES:
        fn = allq[name].spark_fn
        row = {}
        for label, sf_dir in (("sf0.1", "/root/testdata/sf0.1"), ("sf1", ".scaledata/sf1")):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
                best = min(best, time.perf_counter() - t0)
            row[label] = round(best, 3)
        row["ratio"] = round(row["sf1"] / row["sf0.1"], 2)
        result["queries"][name] = row
        print(json.dumps({name: row}), flush=True)
    spark.stop()
    p = pathlib.Path(out_path)
    p.parent.mkdir(parents=True, exist_ok=True)
    existing = {}
    if p.exists():
        existing = json.loads(p.read_text())
    existing[f"cpus{cpus}"] = result
    p.write_text(json.dumps(existing, indent=1) + "\n")
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
