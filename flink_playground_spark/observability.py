"""Pipeline observability: in-flight metrics via ``DataFrame.observe``.

A 100 TB pipeline cannot afford a second pass to learn what it just
processed — row counts, null rates and value ranges must fall out of
the SAME job that does the work. Spark's observation API attaches named
aggregate metrics to a plan node; they are computed incrementally by
the very tasks executing the query (an accumulator under the hood, zero
extra scans, zero extra shuffles) and surface:

- batch: through ``pyspark.sql.Observation`` after any action;
- streaming: per micro-batch in ``StreamingQueryProgress
  .observedMetrics`` — the hook monitoring dashboards consume.

``quality_metrics`` packages the standard ingest health row: count,
per-column null counts, and min/max of a numeric column. Reference
parity note: the reference's jobs print their streams to inspect them
(PrintSinkJob); observation is the production-shaped version of the
same need — see what flowed through, without a tap changing the plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def quality_metrics(
    null_cols: Sequence[str] = (), range_col: str | None = None
) -> list[Column]:
    """The standard ingest health metrics: row count, null count per
    ``null_cols`` entry, min/max of ``range_col``. Compose with extras
    and pass to ``observed`` / ``observe_stream``."""
    cols: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in null_cols:
        cols.append(F.sum(F.col(c).isNull().cast("long")).alias(f"n_null_{c}"))
    if range_col is not None:
        cols.append(F.min(range_col).alias(f"min_{range_col}"))
        cols.append(F.max(range_col).alias(f"max_{range_col}"))
    return cols


def observed(df: DataFrame, *metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach metrics to a batch DataFrame; returns ``(df, observation)``.
    After any action on the returned df, ``observation.get`` holds the
    metric row — computed by the action's own tasks, no second scan."""
    obs = Observation()
    return df.observe(obs, *metrics), obs


def observe_stream(df: DataFrame, name: str, *metrics: Column) -> DataFrame:
    """Attach named metrics to a streaming DataFrame; each micro-batch
    reports them in ``query.lastProgress["observedMetrics"][name]``."""
    return df.observe(name, *metrics)
