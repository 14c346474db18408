"""Slowly-changing-dimension (type 2) build + point-in-time reads.

The reference's temporal joins (DataStreamJob.java:98-104, the lateral
TTF family) probe the *latest* version of a dimension; a warehouse also
needs the full version history as validity intervals — SCD2 — and the
ability to enrich facts with the version that was current at fact time
(point-in-time correctness, the thing that prevents label leakage in
training-data pipelines).

Scale shape:

- ``scd2_build`` is ONE shuffle on the dimension key. Tie-dedup, change
  detection (lag) and interval close-out (lead) are all windows over the
  same ``partitionBy(keys)`` with the same sort order, so Catalyst plans
  a single Exchange + a single Sort and runs the three window frames on
  it back-to-back.
- ``point_in_time_join`` does NOT run the textbook interval join
  (``fact.ts >= valid_from AND fact.ts < valid_to``) — a range join that
  Spark would execute as a broadcast-nested-loop or an exploding
  theta-join. Because SCD2 intervals are contiguous and non-overlapping
  per key by construction, "the interval containing ts" IS "the latest
  valid_from at or before ts", so the probe lowers to the as-of join
  (operators/temporal.py): union-sort, one shuffle, zero join node, no
  version explosion. valid_to rides along in the payload, so the result
  still exposes the interval form.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_playground_spark.operators.temporal import as_of_join


def scd2_build(
    changelog: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreaker: str,
) -> DataFrame:
    """Collapse a changelog into SCD2 validity intervals.

    Input: one row per observed state ``(keys, ts_col, attr_cols)``;
    ``tiebreaker`` resolves multiple rows at the same (keys, ts) —
    highest wins, matching keep-latest dedup semantics (W1).

    Output: ``keys + attr_cols + (valid_from, valid_to)`` with one row
    per *state change*: consecutive rows whose attrs are unchanged are
    merged into one interval; ``valid_to`` is the next change's ts and
    NULL for the current (open) version. Intervals per key are
    contiguous and non-overlapping by construction.
    """
    keys = list(keys)
    attr_cols = list(attr_cols)
    # one partitioning, one sort, three window frames — a single Exchange
    w = Window.partitionBy(*keys).orderBy(F.asc(ts_col), F.asc(tiebreaker))

    attrs = F.struct(*[F.col(c) for c in attr_cols])
    df = (
        changelog.select(*keys, ts_col, tiebreaker, *attr_cols)
        # tie-dedup: the last row of each equal-ts run (max tiebreaker)
        # survives — lead(ts) over the same sort, no (keys, ts) reshuffle
        .withColumn("__next_ts", F.lead(ts_col).over(w))
        .filter(F.col("__next_ts").isNull() | (F.col("__next_ts") != F.col(ts_col)))
        # change detection: drop rows whose attrs equal the previous row's
        # (null-safe: a NULL attribute is "same" only vs another NULL)
        .withColumn("__prev", F.lag(attrs).over(w))
        .filter(F.col("__prev").isNull() | ~F.col("__prev").eqNullSafe(attrs))
        # close out each interval at the next change
        .withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
    )
    return df.select(*keys, *attr_cols, "valid_from", "valid_to")


def point_in_time_join(
    facts: DataFrame,
    scd2: DataFrame,
    on: Sequence[tuple[str, str]],
    fact_time: str,
    how: str = "left",
) -> DataFrame:
    """Enrich facts with the SCD2 version current at ``fact_time``.

    ``on`` is ``[(fact_key, dim_key), ...]``; ``scd2`` must carry
    ``valid_from``/``valid_to`` as produced by :func:`scd2_build`.
    Equivalent to the interval join ``fact.ts >= valid_from AND
    (valid_to IS NULL OR fact.ts < valid_to)`` but executed as a
    single-shuffle as-of join on ``valid_from`` (see module docstring).
    """
    return as_of_join(
        facts,
        scd2,
        list(on),
        left_time=fact_time,
        right_time="valid_from",
        how=how,
    )
