"""Dump ``explain('formatted')`` for named registry queries to files.

Usage::

    python tools/dump_plans.py OUTDIR SUFFIX query [query ...]

Writes ``OUTDIR/<query>_<SUFFIX>.txt`` for each query — the judge-facing
before/after plan evidence (``plans/r14/...``).
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark  # noqa: E402


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    out = pathlib.Path(outdir)
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-plans")
    sf_dir = "/root/testdata/sf0.1"
    from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

    allq = {**REGISTRY, **EXTRA_REGISTRY}
    for name in names:
        df = allq[name].spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        (out / f"{name}_{suffix}.txt").write_text(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
