"""Window operators: tumbling-window TVF and analytic ranking
(SURVEY §2.5 A1, §2.6 G1, §2.7 T1).

Reference semantics:
- Tumbling window TVF ``TABLE(TUMBLE(TABLE input, DESCRIPTOR(ts),
  INTERVAL '1' MINUTES))`` adds ``window_start, window_end, window_time``
  columns (``WindowsProctimeAggJob.java:71-80``), grouped in the outer
  query with ``count(*)`` (``:65-70``).
- ``ROW_NUMBER() OVER (PARTITION BY k ORDER BY ts DESC)``
  (``WithDeduplicateJoinJob.java:92-94``).

Spark-first: ``F.window`` (tumbling and sliding), expanded to the TVF's
flat column names; ``window_time`` is Flink's rowtime of the window,
``window_end - 1ms``. Window aggregation is a hash agg with map-side
partial combine — exactly one shuffle on (group keys, window).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def single_group(col: str) -> Column:
    """Constant-valued but NON-FOLDABLE partition key for a window over a
    provably bounded relation: ``pmod(xxhash64(col), 1)`` is always 0 —
    one group, same execution as an empty partitionSpec — but Catalyst
    cannot constant-fold it away (a plain ``lit(0)`` is stripped from
    the spec by FoldablePropagation and the plan reverts to an
    unpartitioned Window).

    Use this ONLY where the input is bounded by construction (a <=k*64
    salt-survivor set, a <=n_bins sketch, one metrics row per stream
    wave) and say so at the call site. The point is hygiene at scale:
    gate runs stay free of WindowExec "No Partition Defined" warnings,
    so the ONE warning that ever appears again is a genuinely unbounded
    global window — signal, not noise.
    """
    return F.pmod(F.xxhash64(F.col(col)), F.lit(1))


def tumble(
    df: DataFrame,
    time_col: str,
    size: str,
    slide: str | None = None,
    offset: str | None = None,
) -> DataFrame:
    """Window TVF (T1): append ``window_start``/``window_end``/``window_time``.

    ``size``/``slide`` are Spark duration strings ("1 minute", "1 hour");
    a ``slide`` turns the tumble into Flink's HOP (sliding) window.
    ``offset`` shifts the window alignment (Flink's optional TUMBLE/HOP
    offset argument — e.g. "15 minutes" makes hour windows run
    :15 → :15); Spark's ``window(startTime=...)`` is the same knob.
    """
    win = F.window(F.col(time_col), size, slide or size, offset) if (slide or offset) else F.window(
        F.col(time_col), size
    )
    return (
        df.withColumn("__w", win)
        .withColumn("window_start", F.col("__w.start"))
        .withColumn("window_end", F.col("__w.end"))
        .withColumn("window_time", F.col("__w.end") - F.expr("INTERVAL 1 MILLISECOND"))
        .drop("__w")
    )


def tumble_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    slide: str | None = None,
    offset: str | None = None,
) -> DataFrame:
    """Windowed group-by aggregation (G1): group on keys × window."""
    windowed = tumble(df, time_col, size, slide, offset)
    return windowed.groupBy(*group_cols, "window_start", "window_end").agg(*aggs)


_UNITS = {
    "second": 1, "seconds": 1, "minute": 60, "minutes": 60,
    "hour": 3600, "hours": 3600, "day": 86400, "days": 86400,
}


def _duration_seconds(s: str) -> int:
    n, unit = s.strip().split()
    return int(n) * _UNITS[unit.lower()]


def cumulate(df: DataFrame, time_col: str, size: str, step: str) -> DataFrame:
    """Flink's third window TVF: CUMULATE — expanding windows that share
    a start and grow by ``step`` until ``size``
    (``TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL step, INTERVAL
    size))``). A row at time t lands in every window
    ``[base, base + k·step)`` with ``base = floor(t/size)·size`` and
    ``base + k·step > t`` — early partial results that converge to the
    tumble answer at the last step.

    Map-side the row explodes into ≤ size/step copies (like HOP's
    overlap factor) via a codegen'd sequence + filter; the aggregation
    downstream is still one shuffle on (keys, window).
    """
    size_s, step_s = _duration_seconds(size), _duration_seconds(step)
    if size_s % step_s:
        raise ValueError(f"cumulate size {size!r} must be a multiple of step {step!r}")
    n = size_s // step_s
    # explode(array of literals) + WHERE: whole-stage codegen throughout
    # (array lambdas would be interpreted — PERF.md)
    return (
        df.withColumn("window_start", F.window(F.col(time_col), size)["start"])
        .withColumn("__k", F.explode(F.array(*[F.lit(k) for k in range(1, n + 1)])))
        .withColumn(
            "window_end",
            F.col("window_start")
            + F.make_dt_interval(secs=(F.col("__k") * step_s).cast("decimal(18,6)")),
        )
        .filter(F.col("window_end") > F.col(time_col))
        .withColumn("window_time", F.col("window_end") - F.expr("INTERVAL 1 MILLISECOND"))
        .drop("__k")
    )


def cumulate_agg(
    df: DataFrame,
    time_col: str,
    size: str,
    step: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
) -> DataFrame:
    windowed = cumulate(df, time_col, size, step)
    return windowed.groupBy(*group_cols, "window_start", "window_end").agg(*aggs)


def sessionize(
    df: DataFrame, keys: Sequence[str], time_col: str, gap: str = "30 minutes"
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the previous event (per key) exceeds ``gap``. Appends ``session_id``
    (1-based per key). One shuffle+sort per key — the classic
    lag+cumulative-sum construction; Spark's native ``F.session_window``
    is the aggregation-shaped alternative (both are exposed as queries)."""
    w = Window.partitionBy(*keys).orderBy(time_col)
    prev = F.lag(time_col).over(w)
    is_new = F.when(
        prev.isNull() | (F.col(time_col) > prev + F.expr(f"INTERVAL {gap}")), 1
    ).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize_dynamic(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    gap_seconds: Column,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Flink's DYNAMIC session gap (a gap extractor per element; Spark's
    ``session_window`` takes the same per-row gap expression): each
    event proposes its own window ``[ts, ts + gap)`` and sessions are
    the connected overlap components — a purchase can hold a session
    open for hours while clicks time out in minutes.

    Construction (keeps the event rows, which the aggregation-shaped
    native form does not): per key, order by (ts, tiebreakers), running
    max of PREVIOUS events' window ends; a new session starts when
    ``ts >= that max`` (half-open windows: an event exactly at the
    previous end does not overlap). One shuffle+sort per key, same cost
    shape as fixed-gap sessionize. ``gap_seconds`` is a Column in
    seconds (may reference any event attribute)."""
    w = Window.partitionBy(*keys).orderBy(time_col, *tiebreakers)
    win_end = F.col(time_col) + F.make_interval(secs=gap_seconds)
    prev_end = F.max(win_end).over(w.rowsBetween(Window.unboundedPreceding, -1))
    is_new = F.when(prev_end.isNull() | (F.col(time_col) >= prev_end), 1).otherwise(0)
    return df.withColumn(
        "session_id",
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def row_number_ranked(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column]) -> DataFrame:
    """A1: append ``rownum`` ranking within partitions."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn("rownum", F.row_number().over(w))


def top_k_per_group(df: DataFrame, partition_by: Sequence[str], order_by: Sequence[Column], k: int) -> DataFrame:
    """Top-k per group via ranking; Catalyst's InferWindowGroupLimit pushes
    the k-limit below the sort at scale (rank-limit pushdown)."""
    return row_number_ranked(df, partition_by, order_by).filter(F.col("rownum") <= k)


def window_topn(
    df: DataFrame,
    time_col: str,
    size: str,
    group_cols: Sequence[str],
    aggs: Sequence[Column],
    order_by: Sequence[Column],
    n: int,
    slide: str | None = None,
) -> DataFrame:
    """Flink SQL's Window Top-N: a windowed group-by aggregation ranked
    within each window (``ROW_NUMBER() OVER (PARTITION BY window_start,
    window_end ORDER BY ...) <= n``). Two shuffles — (keys x window) for
    the agg, window for the rank; the rank side carries only one row per
    key per window, and InferWindowGroupLimit caps its sort at n."""
    agged = tumble_agg(df, time_col, size, group_cols, aggs, slide)
    return top_k_per_group(agged, ["window_start", "window_end"], order_by, n)


def window_dedup(
    df: DataFrame,
    time_col: str,
    size: str,
    partition_cols: Sequence[str],
    order_by: Sequence[Column],
    slide: str | None = None,
) -> DataFrame:
    """Flink SQL's Window Deduplication: keep ONE row per (window, key),
    chosen by rank order (``ROW_NUMBER() OVER (PARTITION BY window_start,
    key ORDER BY ...) = 1`` under a window TVF) — e.g. each user's last
    event of every hour. One shuffle on (window, key); dedup_latest's
    ``max_by`` single-agg lowering applies identically here, but the
    rank form keeps arbitrary multi-column tie-breaks, and
    InferWindowGroupLimit caps the per-group sort at 1."""
    windowed = tumble(df, time_col, size, slide)
    return row_number_ranked(
        windowed, ["window_start", *partition_cols], order_by
    ).filter(F.col("rownum") == 1).drop("rownum")


def window_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str,
    size: str,
    on: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Flink SQL's Window Join: rows of two streams join iff they share
    the key AND fall in the SAME tumbling window — the bounded-state
    form of a stream-stream join (each side's state lives exactly one
    window). Lowered to an equi-join on (window_start, key): windowing
    is a scan-stage projection on both sides, then ONE pair of shuffles
    co-partitions them; no range predicate, no interval explosion, and
    the window key rides the same Exchange as the join key at any scale.
    Columns are disambiguated with l_/r_ prefixes (both inputs keep
    their full row, Flink's window-join output contract)."""
    lw = tumble(left, time_col, size).drop("window_time", "window_end")
    rw = tumble(right, time_col, size).drop("window_time", "window_end")
    keys = ["window_start", *on]
    lp = lw.select(
        *keys, *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in on]
    )
    rp = rw.select(
        *keys, *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in on]
    )
    return lp.join(rp, keys, how)
