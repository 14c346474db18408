"""Temporal (as-of) joins (SURVEY §2.3 J1-J3, §2.8 U1/U2).

Reference semantics: a ``TemporalTableFunction`` registered over a
versioned dimension table (time attr + key,
``DataStreamJob.java:88-91``) probed via ``LATERAL TABLE(ttf(p.proctime))``
(``DataStreamJob.java:98-104``) — for each probe row, join the *latest*
dimension version whose time attribute is <= the probe's time; the
left-outer flavor keeps probe rows with no version
(``DataStreamJob.java:116-120``). The reference is restricted to a literal
``ON TRUE`` predicate and a single join key
(``DataStreamJob.java:106-115``); this implementation supports arbitrary
key lists — a documented capability superset.

Scale design (100 TB): the event-time as-of join is the *union-sort*
algorithm — tag both inputs, union, and resolve each probe row with a
running ``last(payload ignore nulls)`` window over (key, time, side).
One shuffle + one sort, no row explosion — unlike the naive
``join on key AND l.ts >= r.ts`` + re-aggregate, which multiplies every
probe row by all earlier versions of its key (quadratic in versions per
key). Skewed keys are handled by AQE; the sort is time-ordered within
key, which Spark spills gracefully.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from flink_playground_spark.operators.dedup import dedup_latest


def _norm_on(on) -> list[tuple[str, str]]:
    if isinstance(on, str):
        return [(on, on)]
    pairs = []
    for item in on:
        pairs.append((item, item) if isinstance(item, str) else (item[0], item[1]))
    return pairs


def as_of_snapshot(
    dim: DataFrame, keys: str | Sequence[str], time_col: str, tiebreakers: Sequence[str] = ()
) -> DataFrame:
    """Latest version per key — the ``TemporalTableFunction`` snapshot (U1)
    evaluated at processing time "now" (every version qualifies, keep the
    newest). Equivalent to ``table.createTemporalTableFunction($("ts"),
    $("iso"))`` probed at proctime."""
    return dedup_latest(dim, keys, time_col, tiebreakers)


def temporal_join(
    left: DataFrame,
    dim: DataFrame,
    on,
    dim_time: str,
    how: str = "inner",
    dim_tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Processing-time temporal join (J1/J2): probe the *current* version
    of each dimension key. Lowered to dedup-latest + equi-join — the
    engine-level rewrite SURVEY §4 calls for; Catalyst then picks
    broadcast vs shuffle join for the (small) snapshot side."""
    pairs = _norm_on(on)
    snap = as_of_snapshot(dim, [r for _, r in pairs], dim_time, dim_tiebreakers)
    cond = None
    for l, r in pairs:
        c = left[l] == snap[r]
        cond = c if cond is None else (cond & c)
    return left.join(snap, cond, how)


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_time: str,
    right_time: str,
    how: str = "left",
    right_tiebreakers: Sequence[str] = (),
    allow_exact_match: bool = True,
    strategy: str = "union_sort",
    left_id: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Event-time as-of join (J1 generalized): for each left row, attach
    the right row with the greatest ``right_time`` <= ``left_time`` for
    the same key(s) (``direction="backward"``, the default), or the
    *smallest* ``right_time`` >= ``left_time`` (``direction="forward"`` —
    "earliest next event", the building block for CEP/funnel chains in
    ``operators.cep``). Among right rows tied on ``right_time``, the
    greatest ``right_tiebreakers`` win in both directions. ``how`` in
    {"left", "inner"}.

    Output columns: all left columns, then right non-key columns
    (including ``right_time``); a right column whose name collides with a
    left column is prefixed ``right_``.

    Strategies:
    - ``union_sort`` (default): one shuffle of both sides on the key,
      running last-payload window. Right choice when both sides are big.
    - ``broadcast``: broadcast the (small) version table, theta-join, and
      keep the max-version row per left row — the probe side never
      shuffles (beyond one hash agg keyed on ``left_id``, which AQE keeps
      local post-broadcast). Requires ``left_id``, a unique left column.
    - ``auto``: pick ``broadcast`` when Catalyst's size estimate for the
      version table is under ``spark.sql.autoBroadcastJoinThreshold``
      (the same statistic the planner uses for join selection) AND
      ``left_id`` is provided; ``union_sort`` otherwise.
    """
    if how not in ("left", "inner"):
        raise ValueError("as_of_join supports how in {'left','inner'}")
    if direction not in ("backward", "forward"):
        raise ValueError("as_of_join direction must be 'backward' or 'forward'")
    if direction == "forward" and strategy == "broadcast":
        # the broadcast path's max(__ver) tie-resolution is backward-specific;
        # forward probes always take the always-correct union_sort plan
        raise ValueError("direction='forward' supports strategy 'union_sort' (or 'auto')")
    if strategy == "auto":
        strategy = "union_sort"
        if direction == "backward" and left_id is not None:
            try:
                size = int(
                    right._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
                )
                threshold = int(
                    right.sparkSession.conf.get(
                        "spark.sql.autoBroadcastJoinThreshold", "10485760"
                    )
                )
                if 0 <= size <= threshold:
                    strategy = "broadcast"
            except Exception:
                pass  # stats unavailable → the always-safe union_sort
    if strategy == "broadcast":
        if left_id is None:
            raise ValueError("broadcast as_of_join requires left_id (unique left column)")
        return _as_of_broadcast(
            left, right, _norm_on(on), left_time, right_time, how, right_tiebreakers,
            allow_exact_match, left_id,
        )
    if strategy != "union_sort":
        raise ValueError(f"unknown as_of_join strategy: {strategy}")
    pairs = _norm_on(on)
    lkeys = [l for l, _ in pairs]
    rkeys = [r for _, r in pairs]

    payload_cols = [c for c in right.columns if c not in rkeys]
    out_names = {c: (f"right_{c}" if c in left.columns else c) for c in payload_cols}

    # SQL join semantics: NULL keys never match. Window.partitionBy would
    # group NULL keys together (a NULL-key probe row would "match" a
    # NULL-key version row), so: version rows with any NULL key are
    # dropped up front, and probe rows with any NULL key carry a flag
    # that nulls their resolved match (left => emitted unmatched,
    # inner => filtered) — one pass, no plan split.
    r_null = None
    l_null = None
    for l, r in pairs:
        rn, ln = F.col(r).isNull(), F.col(l).isNull()
        r_null = rn if r_null is None else (r_null | rn)
        l_null = ln if l_null is None else (l_null | ln)
    right = right.filter(~r_null)

    # Common layout: key cols (left names), event time, side tag, payloads.
    r_side = right.select(
        *[F.col(r).alias(l) for l, r in pairs],
        F.col(right_time).cast("timestamp_ntz").alias("__t"),
        F.struct(*[F.col(c) for c in payload_cols]).alias("__rpay"),
        F.lit(None).cast(
            "struct<" + ",".join(f"`{c}`:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("__lpay"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(right_tiebreakers)],
    )
    l_side = left.select(
        *[F.col(l) for l in lkeys],
        F.col(left_time).cast("timestamp_ntz").alias("__t"),
        F.lit(None).cast(r_side.schema["__rpay"].dataType).alias("__rpay"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lpay"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__tb{i}") for i, c in enumerate(right_tiebreakers)],
        l_null.alias("__nullkey"),
    )
    r_side = r_side.withColumn("__nullkey", F.lit(False))

    tb_order = [F.asc_nulls_last(f"__tb{i}") for i in range(len(right_tiebreakers))]
    # Right rows sort before left rows at equal time => `<=` (exact match
    # allowed); with allow_exact_match=False left sorts first => strict `<`.
    # direction="forward" walks time descending, so the running last-right
    # seen "before" a probe row is its earliest *following* version; the
    # side/tiebreaker conventions are unchanged.
    side_order = F.asc("__side") if allow_exact_match else F.desc("__side")
    t_order = F.asc("__t") if direction == "backward" else F.desc("__t")
    w = (
        Window.partitionBy(*lkeys)
        .orderBy(t_order, side_order, *tb_order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    resolved = (
        r_side.unionByName(l_side)
        .withColumn(
            "__match",
            F.when(~F.col("__nullkey"), F.last("__rpay", ignorenulls=True).over(w)),
        )
        .filter(F.col("__side") == 1)
    )
    if how == "inner":
        # a null payload struct means this probe row found no version
        resolved = resolved.filter(F.col("__match").isNotNull())
    return resolved.select(
        "__lpay.*",
        *[F.col(f"__match.{c}").alias(out_names[c]) for c in payload_cols],
    )


def _as_of_broadcast(
    left: DataFrame,
    right: DataFrame,
    pairs: list[tuple[str, str]],
    left_time: str,
    right_time: str,
    how: str,
    right_tiebreakers: Sequence[str],
    allow_exact_match: bool,
    left_id: str,
) -> DataFrame:
    payload_cols = [c for c in right.columns if c not in [r for _, r in pairs]]
    out_names = {c: (f"right_{c}" if c in left.columns else c) for c in payload_cols}
    # cast to timestamp_ntz to match the union_sort strategy — otherwise
    # inputs with differing time column types (string vs timestamp,
    # ntz vs ltz) could produce strategy-dependent results
    r = right.select(
        *[F.col(rc).alias(f"__k_{lc}") for lc, rc in pairs],
        F.struct(
            F.col(right_time).cast("timestamp_ntz").alias("__t"),
            *[F.col(c).alias(f"__tb{i}") for i, c in enumerate(right_tiebreakers)],
            F.struct(*[F.col(c) for c in payload_cols]).alias("__p"),
        ).alias("__ver"),
    )
    cond = None
    for lc, _ in pairs:
        c = left[lc] == r[f"__k_{lc}"]
        cond = c if cond is None else (cond & c)
    lt = left[left_time].cast("timestamp_ntz")
    time_pred = (r["__ver.__t"] <= lt) if allow_exact_match else (r["__ver.__t"] < lt)
    joined = left.join(F.broadcast(r), cond & time_pred, "left" if how == "left" else "inner")
    best = (
        joined.groupBy(left_id)
        .agg(
            F.max("__ver").alias("__best"),
            *[F.first(c).alias(c) for c in left.columns if c != left_id],
        )
    )
    return best.select(
        *left.columns,
        *[F.col(f"__best.__p.{c}").alias(out_names[c]) for c in payload_cols],
    )


def resample_locf(
    df: DataFrame,
    keys: Sequence[str],
    time_col: str,
    step: str = "1 hour",
    value_cols: Sequence[str] | None = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Fixed-interval resampling with last-observation-carried-forward —
    the gap-filling step between an irregular event stream and anything
    that wants a regular time series (feature grids, charting, joins on
    aligned timestamps).

    Per key: a grid of ``step``-aligned points spanning the key's
    observed range (``F.window(...).start`` alignment, so engine-
    portable bucket boundaries), then the as-of join attaches the
    latest observation at or before each grid point — carried forward
    through gaps, NULL before the first observation (the grid starts at
    the bucket floor of the first one). Ties on the observation time
    resolve by the greatest ``tiebreakers``.

    Cost shape: one aggregate for per-key bounds, a scan-local
    ``sequence``/``explode`` for the grid (rows ∝ span/step per key,
    never a cross join), and the union-sort as-of (one shuffle of grid
    + observations on the key). At 100 TB the grid side is tiny
    relative to events and co-shuffles with them.
    """
    value_cols = list(
        value_cols
        if value_cols is not None
        else [c for c in df.columns if c not in keys and c != time_col]
    )
    # bucket the observations FIRST (one window expression — Spark
    # rejects two in one plan), so per-key min/max are already aligned
    bucketed = df.select(*keys, F.window(F.col(time_col), step).start.alias("__b"))
    bounds = bucketed.groupBy(*keys).agg(
        F.min("__b").alias("__mn"), F.max("__b").alias("__mx")
    )
    grid = bounds.select(
        *keys,
        F.explode(
            F.sequence(F.col("__mn"), F.col("__mx"), F.expr(f"INTERVAL {step}"))
        ).alias("grid_ts"),
    )
    extra = [t for t in tiebreakers if t not in value_cols and t != time_col]
    obs = df.select(*keys, time_col, *value_cols, *extra)
    return as_of_join(
        grid,
        obs,
        [(k, k) for k in keys],
        "grid_ts",
        time_col,
        how="left",
        right_tiebreakers=tiebreakers,
    )
