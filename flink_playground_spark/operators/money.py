"""Exact money aggregation at primitive-codegen speed.

Spark's decimal-sum aggregate is exact and order-independent but runs
outside whole-stage codegen's primitive path (~4× slower than a long
sum, measured at sf0.1 — PERF.md). For fixed-point money columns the
engine sums EXACT INTEGER UNITS (cents, or products of cents) as longs
and converts to decimal once per output group:

- ``cents(col)``: a 2-decimal double column as exact integer cents.
  Safe for values stored with ≤2 decimals: the double nearest to x.yz
  times 100 rounds to the exact integer (relative error ~1e-15, nowhere
  near the .5 boundary).
- ``units_to_decimal(col, scale)``: an integer-unit sum as the exact
  decimal total (multiplication by the exact decimal scale factor —
  no decimal division anywhere).
- ``exact_money_agg``: grouped aggregation of integer-unit expressions.
  With ``partition_stage=True`` the heavy pass groups by
  ``(keys…, spark_partition_id)`` — map-side it collapses to one row per
  (partition, group), so both exchanges carry only groups × partitions
  rows, and the per-partition partial is bounded by
  ``maxPartitionBytes`` row counts (~1.1e6 rows × the max per-row unit
  value — orders of magnitude inside int64; Spark 4 ANSI throws loudly
  rather than wrapping if that invariant ever broke). Decimal math then
  touches only the partials. Use this whenever a single group can span
  an unbounded number of rows (low-cardinality keys, global sums).
  With ``partition_stage=False`` the sum is a plain single-stage long
  aggregation — for high-cardinality keys whose per-group row count is
  structurally bounded (e.g. lineitems per order).

Integer sums are exact in any order, so results are bit-identical to
the all-decimal formulation — q1/q3/q18 use this and hash-match their
DuckDB oracles unchanged (1.13s → 0.54s on q1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Exact integer cents of a ≤2-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def units_to_decimal(col: Column, scale: int) -> Column:
    """Integer-unit total → exact decimal dollars (scale = decimal
    places of the unit: cents→2, cents×hundredths→4, …)."""
    factor = "0." + "0" * (scale - 1) + "1"
    return col.cast("decimal(32,0)") * F.lit(factor).cast(f"decimal({scale + 1},{scale})")


def exact_money_agg(
    df: DataFrame,
    keys: Sequence[str],
    unit_sums: dict[str, tuple[Column, int]],
    extra: dict[str, Column] | None = None,
    partition_stage: bool = True,
) -> DataFrame:
    """Grouped exact money sums via the long-units two-level plan.

    ``unit_sums``: output name → (integer-unit row expression, unit
    scale). The result carries one exact DECIMAL column per entry plus
    any ``extra`` long-summable aggregates (counts, integer sums) given
    as name → row expression.
    """
    keys = list(keys)
    extra = extra or {}
    if partition_stage:
        partials = df.groupBy(*keys, F.spark_partition_id().alias("__pid")).agg(
            *[F.sum(expr).alias(f"__u_{n}") for n, (expr, _) in unit_sums.items()],
            *[F.sum(expr).alias(f"__x_{n}") for n, expr in extra.items()],
        )
        return partials.groupBy(*keys).agg(
            *[
                units_to_decimal(F.sum(F.col(f"__u_{n}").cast("decimal(27,0)")), s).alias(n)
                for n, (_, s) in unit_sums.items()
            ],
            *[F.sum(f"__x_{n}").alias(n) for n in extra],
        )
    return df.groupBy(*keys).agg(
        *[
            units_to_decimal(F.sum(expr).cast("decimal(27,0)"), s).alias(n)
            for n, (expr, s) in unit_sums.items()
        ],
        *[F.sum(expr).alias(n) for n, expr in extra.items()],
    )
