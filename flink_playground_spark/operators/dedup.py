"""Deduplication — keep latest row per key (SURVEY §2.4 W1/W2).

Reference semantics:
- W1 "Deduplication" pattern: ``ROW_NUMBER() OVER (PARTITION BY iso ORDER
  BY ts DESC) ... WHERE rownum = 1`` (``WithDeduplicateJoinJob.java:89-97``).
- W2 primary-key upsert view: declaring ``primaryKey("iso")`` collapses
  duplicate-key rows to the latest version (``WithStateTtlJob.java:73-77``;
  comment at :75 — "Without this restriction the join will produce four
  rows for 'a'").

Scale notes (100 TB): the default strategy is ``max_by`` — a hash
aggregation with map-side partial combine, so each input partition first
collapses locally and only one candidate row per (partition, key) crosses
the shuffle. The ``row_number`` strategy shuffles *every* row to its key
partition and sorts; it is kept because it is the literal reference shape
and is faster when keys are nearly unique (no combine win). Both are one
shuffle; neither collects to the driver.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dedup_latest(
    df: DataFrame,
    keys: str | Sequence[str],
    order_col: str,
    tiebreakers: Sequence[str] = (),
    strategy: str = "max_by",
) -> DataFrame:
    """Keep the latest row per key, ordered by ``order_col`` (desc) then
    ``tiebreakers`` (desc) for determinism when order values collide.

    Exactly the reference's keep-latest dedup (W1); column set and order
    are preserved.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order_cols = [order_col, *tiebreakers]
    if strategy == "max_by":
        out_struct = F.struct(*[F.col(c) for c in df.columns])
        ord_struct = F.struct(*[F.col(c) for c in order_cols])
        return (
            df.groupBy(*keys)
            .agg(F.max_by(out_struct, ord_struct).alias("__latest"))
            .select("__latest.*")
        )
    if strategy == "row_number":
        w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_cols])
        return (
            df.withColumn("__rownum", F.row_number().over(w))
            .filter(F.col("__rownum") == 1)
            .drop("__rownum")
        )
    raise ValueError(f"unknown dedup strategy: {strategy}")


def pk_upsert_view(df: DataFrame, primary_key: str | Sequence[str], arrival_col: str) -> DataFrame:
    """Primary-key upsert view (W2): successive rows with the same key act
    as upserts; the view exposes the last arrival per key.

    The reference orders by arrival; in batch that order must be made
    explicit — ``arrival_col`` is the insertion ordinal or event time.
    """
    return dedup_latest(df, primary_key, arrival_col)
