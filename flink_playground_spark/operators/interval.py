"""Interval (time-band) join — Flink's stream-stream interval join
re-expressed for Spark.

Reference semantics (Flink SQL interval join; the reference repo's Flink
version ships it as a first-class streaming join): match left and right
rows with equal keys whose event times are within a band,

    r.time BETWEEN l.time + lower AND l.time + upper

The naive Spark formulation — an equi-join on keys with the band as a
range predicate — is fine when keys are selective, but degenerates into
a per-key cross product × post-filter when keys are hot (every pair of
a key's rows meets the join before the band filter prunes). The scale
formulation here is the published band-join rewrite (bucketize +
equi-join, e.g. Bouros & Mamoulis' forward-scan family lowered to
MapReduce): bucket both sides by a tumbling window the width of the
band, explode the RIGHT side into its bucket and the previous one, join
on (keys, bucket) — every qualifying pair shares exactly the left row's
bucket, so each pair is produced once — then apply the exact band
predicate. Join work is proportional to rows per (key, band-width
bucket), not rows per key.

All arithmetic stays in the datetime domain (interval add/subtract,
``window()`` bucketing) — no epoch conversion, so TIMESTAMP_NTZ inputs
are immune to session-timezone and DST effects.

The STREAMING flavor needs no custom operator at all: Structured
Streaming's stream-stream join accepts exactly this shape (equi-key +
time-range condition + watermarks on both sides) and uses the range to
evict state — ``streaming_interval_join`` in queries.py runs it on the
real micro-batch engine against the same oracle.
"""

from __future__ import annotations

import datetime as _dt
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _to_micros(bound: float | int | _dt.timedelta) -> int:
    if isinstance(bound, _dt.timedelta):
        return round(bound.total_seconds() * 1_000_000)
    return round(bound * 1_000_000)


def _ivl(micros: int):
    return F.expr(f"INTERVAL '{micros}' MICROSECOND")


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str | tuple[str, str]],
    left_time: str,
    right_time: str,
    lower: float | _dt.timedelta,
    upper: float | _dt.timedelta,
    how: str = "inner",
) -> DataFrame:
    """Rows of ``left`` joined to rows of ``right`` with equal keys and
    ``right_time`` within ``[left_time + lower, left_time + upper]``.

    ``lower``/``upper`` are seconds (may be negative) or timedeltas,
    ``lower <= upper``. ``how`` is ``inner`` or ``left`` (unmatched left
    rows survive with NULL right columns — Flink's outer interval join
    result). Join keys may share a name on both sides (USING semantics:
    the output keeps the left copy); any other shared column name is
    ambiguous and rejected — alias before joining. Each qualifying pair
    is emitted exactly once.
    """
    lo, up = _to_micros(lower), _to_micros(upper)
    if lo > up:
        raise ValueError(f"lower bound {lower} exceeds upper bound {upper}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner or left, got {how!r}")
    width = up - lo
    pairs = [(k, k) if isinstance(k, str) else tuple(k) for k in ([on] if isinstance(on, str) else on)]
    # USING-style same-name join keys are fine (the right copy is
    # renamed internally and dropped); any OTHER shared column name is
    # ambiguous in the output and rejected.
    join_keys_rhs = {rk for _, rk in pairs}
    overlap = (set(left.columns) & set(right.columns)) - {
        rk for lk, rk in pairs if lk == rk
    }
    if overlap:
        raise ValueError(f"column names must be disjoint, both sides have {sorted(overlap)}")
    renames = {
        rk: f"__rk_{i}"
        for i, (lk, rk) in enumerate(pairs)
        if rk in left.columns and rk in join_keys_rhs
    }
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    pairs = [(lk, renames.get(rk, rk)) for lk, rk in pairs]
    key_cond = [left[lk] == right[rk] for lk, rk in pairs]

    if width == 0:
        # degenerate band: an exact offset match is a plain equi-join
        cond = key_cond + [right[right_time] == left[left_time] + _ivl(lo)]
        return left.join(right, cond, how).drop(*renames.values())

    w = f"{width} microseconds"
    # left bucket: tumbling window of the band width over the left time
    lb = left.withColumn("__lb", F.window(F.col(left_time), w).start)
    # right rows shifted so the band becomes [l.time, l.time + width];
    # a shifted right time lands in the left row's bucket or the next
    # one, so emitting (bucket, bucket - width) covers every match once
    shifted = F.col(right_time) - _ivl(lo)
    rb = right.withColumn(
        "__rb", F.explode(F.array(F.window(shifted, w).start, F.window(shifted, w).start - _ivl(width)))
    )
    band = [
        rb[right_time] >= lb[left_time] + _ivl(lo),
        rb[right_time] <= lb[left_time] + _ivl(up),
    ]
    key_cond = [lb[lk] == rb[rk] for lk, rk in pairs]
    joined = lb.join(rb, key_cond + [lb["__lb"] == rb["__rb"]] + band, how)
    return joined.drop("__lb", "__rb", *renames.values())
