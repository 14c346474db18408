"""Complex-event processing: sequence/pattern detection over keyed event
streams (the MATCH_RECOGNIZE / CEP family).

The reference repo has no CEP job — this is a capability superset in the
spirit of Flink SQL's ``MATCH_RECOGNIZE`` clause, re-expressed Spark-first:

- ``funnel``: non-contiguous "skip-till-next-match" sequence detection
  (each step is the *earliest* qualifying event strictly after the
  previous step, all within a deadline of the start). Greedy-earliest is
  exact here: taking the earliest possible event for step *i* only
  loosens the constraint for step *i+1*, so a chain is found iff one
  exists. Implemented as a chain of forward as-of joins
  (``operators.temporal.as_of_join(direction="forward")``) — one shuffle
  per step, **no row explosion** (the naive formulation joins every
  step-1 row with every later candidate, quadratic per key).
- ``match_contiguous``: strict-contiguity patterns (Flink's
  ``A B C`` with no gaps) via a single lead-chain window — one shuffle,
  codegen'd comparisons, window-group evaluation.

Scale: both operators shuffle only on the pattern key; per-key work is a
sort (funnel: k-1 sorts; contiguous: 1). State never exceeds the events
of one key partition — the property that survives 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from flink_playground_spark.operators.temporal import as_of_join


def funnel(
    df: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    steps: Sequence[Column],
    within: str,
    start_cols: Sequence[str | Column] = (),
) -> DataFrame:
    """Detect completed ``steps[0] -> steps[1] -> ...`` sequences per key.

    For each row matching ``steps[0]``, resolve step *i* (i>=2) to the
    earliest row matching ``steps[i-1]`` with a strictly greater time than
    step *i-1*, requiring every step to land within ``within`` (a SQL
    interval string, e.g. ``"INTERVAL 48 HOURS"``) of the start. Returns
    only completed chains: key cols + ``start_cols`` (carried from the
    step-1 row) + ``ts1..tsK`` (timestamp_ntz of each step).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    cur = df.filter(steps[0]).select(
        *keys, *start_cols, F.col(time_col).cast("timestamp_ntz").alias("ts1")
    )
    deadline = F.col("ts1") + F.expr(within)
    for i, pred in enumerate(steps[1:], start=2):
        right = df.filter(pred).select(
            *keys, F.col(time_col).cast("timestamp_ntz").alias(f"ts{i}")
        )
        cur = as_of_join(
            cur,
            right,
            [(k, k) for k in keys],
            left_time=f"ts{i - 1}",
            right_time=f"ts{i}",
            how="inner",
            allow_exact_match=False,
            direction="forward",
        ).filter(F.col(f"ts{i}") <= deadline)
    return cur


def match_plus(
    df: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    symbol_col: str,
    plus_symbol: str,
    then_symbol: str,
    id_col: str | None = None,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Greedy quantifier pattern ``A+ B`` (MATCH_RECOGNIZE
    ``PATTERN (A+ B)``, strict contiguity): each *maximal* run of
    consecutive ``plus_symbol`` rows whose immediately following row is
    ``then_symbol``. Output: key cols [+ ``start_id`` when ``id_col``] +
    ``n_plus`` (run length), ``ts1`` (run start), ``ts2`` (run end),
    ``ts3`` (the B row's time).

    Gaps-and-islands on ONE window partitioning: run boundaries come from
    ``lag(symbol)``, run ids from a running sum of boundary flags, the
    follower from ``lead`` — every window keys on the same columns, so
    the whole operator is a single shuffle of codegen'd expressions.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(time_col).asc(), *[F.col(t).asc() for t in tiebreakers]]
    w = Window.partitionBy(*keys).orderBy(*order)
    # the running-sum window orders by __rn (same total order, but a column
    # that survives the projection below) — still the same partitioning,
    # so no extra Exchange
    w_run = (
        Window.partitionBy(*keys).orderBy("__rn").rowsBetween(Window.unboundedPreceding, 0)
    )
    t_ntz = F.col(time_col).cast("timestamp_ntz")
    rows = df.select(
        *keys,
        t_ntz.alias("__t"),
        F.col(symbol_col).alias("__sym"),
        *([F.col(id_col).alias("__id")] if id_col else []),
        F.row_number().over(w).alias("__rn"),
        F.lead(F.col(symbol_col)).over(w).alias("__next_sym"),
        F.lead(t_ntz).over(w).alias("__next_t"),
        F.coalesce(F.lag(F.col(symbol_col)).over(w) != F.col(symbol_col), F.lit(True))
        .cast("int")
        .alias("__boundary"),
    ).withColumn("__run", F.sum("__boundary").over(w_run))
    runs = (
        rows.filter(F.col("__sym") == plus_symbol)
        .groupBy(*keys, "__run")
        .agg(
            F.count(F.lit(1)).alias("n_plus"),
            F.min("__t").alias("ts1"),
            F.max("__t").alias("ts2"),
            *([F.min_by("__id", "__rn").alias("start_id")] if id_col else []),
            F.max_by("__next_sym", "__rn").alias("__after_sym"),
            F.max_by("__next_t", "__rn").alias("ts3"),
        )
    )
    return runs.filter(F.col("__after_sym") == then_symbol).select(
        *keys, *(["start_id"] if id_col else []), "n_plus", "ts1", "ts2", "ts3"
    )


def match_contiguous(
    df: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    symbol_col: str,
    pattern: Sequence[str],
    tiebreakers: Sequence[str] = (),
    within: str | None = None,
) -> DataFrame:
    """Strict-contiguity pattern match: rows of each key, ordered by
    (``time_col``, ``tiebreakers``), where ``pattern[0..k-1]`` match
    ``symbol_col`` on k *consecutive* rows. Returns the step-1 row's
    columns + ``ts2..tsK`` (times of the following matched rows). With
    ``within``, the last step must land inside ``start + within``.

    Lead columns are materialized *before* the pattern filter (a window
    expression evaluated after a filter would see the filtered frame).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    if len(pattern) < 2:
        raise ValueError("match_contiguous needs a pattern of length >= 2")
    w = Window.partitionBy(*keys).orderBy(
        F.col(time_col).asc(), *[F.col(t).asc() for t in tiebreakers]
    )
    t_ntz = F.col(time_col).cast("timestamp_ntz")
    leads = df.select(
        "*",
        *[F.lead(symbol_col, i).over(w).alias(f"__sym{i}") for i in range(1, len(pattern))],
        *[F.lead(t_ntz, i).over(w).alias(f"ts{i + 1}") for i in range(1, len(pattern))],
    )
    cond = F.col(symbol_col) == pattern[0]
    for i, sym in enumerate(pattern[1:], start=1):
        cond = cond & (F.col(f"__sym{i}") == sym)
    if within is not None:
        cond = cond & (
            F.col(f"ts{len(pattern)}") <= t_ntz + F.expr(within)
        )
    return leads.filter(cond).drop(*[f"__sym{i}" for i in range(1, len(pattern))])
