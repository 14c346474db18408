"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE compact JSON line LAST:
``{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}``
and writes the full per-query breakdown (including round-over-round
ratios) to ``BENCH_FULL.json`` beside this file. Round 2's single long
line was truncated by the driver's tail capture (BENCH_r02.json:
``parsed: null``), so the machine line is kept small and emitted last.

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
from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(pathlib.Path(sf_dir).name.removeprefix("sf") or 0.1)
    spark = get_spark("bench")
    spark.range(10_000).selectExpr("sum(id)").collect()  # JVM warmup

    times: dict[str, float] = {}
    for name, q in {**REGISTRY, **EXTRA_REGISTRY}.items():
        if not q.bench:
            continue
        best = float("inf")
        for _ in range(3):  # min-of-3: excludes one-time costs (file
            # listing, codegen compilation) from the steady-state number.
            # The timer wraps CONSTRUCTION + materialization: iterative
            # operators (connected components) run their convergence
            # loop eagerly during construction, and excluding it would
            # under-report them.
            t0 = time.perf_counter()
            df = q.spark_fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    prev = _load_previous_round()
    if prev:
        full["vs_prev"] = _compare(times, prev)
    sidecar = pathlib.Path(__file__).resolve().parent / "BENCH_FULL.json"
    sidecar.write_text(json.dumps(full, indent=1) + "\n")
    # Full line first (for humans / generous captures), compact machine
    # line LAST so a bounded tail capture always parses the headline.
    print(json.dumps(full, separators=(",", ":")))
    compact = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "n_queries": len(times),
        "regressions": (full.get("vs_prev") or {}).get("regressions", {}),
        "full": sidecar.name,
    }
    print(json.dumps(compact, separators=(",", ":")))
    spark.stop()


# Registry entries renamed/merged since BENCH_r01 (consolidation): map the
# old recorded name to its successor so round-over-round stays comparable.
_RENAMES = {
    "tumble_count_events": "tumble_hop_events",
    "text_stats": "text_analysis",
}

# Queries whose DEFINITION grew this round (consolidation merged several
# registry entries into one): their ratio vs the previous round compares
# different work, so they are reported but not flagged as regressions.
_CHANGED = {
    "tumble_hop_events",  # was tumble only; now tumble + hop branches
    "sessionize_events",  # was gap-strategy only; now gaps + native
    "text_analysis",  # was stats only; now + lang-id + fingerprint + token counts
}


def _load_previous_round() -> dict | None:
    here = pathlib.Path(__file__).resolve().parent
    # Prefer the committed sidecar (full per-query dict from the previous
    # round's bench run), then walk driver round files newest-first until
    # one has a parseable queries dict (r02's was tail-truncated).
    candidates = [here / "BENCH_FULL.json"] + sorted(
        here.glob("BENCH_r*.json"), reverse=True
    )
    for path in candidates:
        try:
            data = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        # the driver wraps our JSON line under "parsed"
        queries = data.get("queries") or (data.get("parsed") or {}).get("queries")
        if queries:
            return {"file": path.name, "queries": queries}
    return None


def _compare(times: dict[str, float], prev: dict) -> dict:
    old = {_RENAMES.get(k, k): v for k, v in prev["queries"].items()}
    ratios = {
        name: round(times[name] / old[name], 2)
        for name in times
        if name in old and old[name] > 0
    }
    return {
        "against": prev["file"],
        "ratios": ratios,  # this round / previous round, per query
        "regressions": {
            n: r for n, r in ratios.items() if r > 1.5 and n not in _CHANGED
        },
        "changed_definition": sorted(_CHANGED & set(ratios)),
        "new_queries": sorted(set(times) - set(old)),
    }


if __name__ == "__main__":
    main()
