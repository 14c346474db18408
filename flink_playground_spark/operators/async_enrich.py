"""Async external-lookup enrichment — Flink's ``AsyncDataStream``
(``orderedWait`` / ``unorderedWait`` over an ``AsyncFunction``).

Flink overlaps slow external lookups (REST services, key-value stores)
with stream processing by keeping ``capacity`` requests in flight per
task. The Spark-first shape is ``mapInPandas``: rows arrive in Arrow
batches, each batch fans its lookups out on a thread pool (``capacity``
concurrent calls per partition — the direct analog of Flink's in-flight
buffer), and results are re-attached as new columns.

Semantic parity:

- ``ordered=True`` ≈ ``orderedWait``: output preserves the input row
  order within every partition (results are gathered positionally, so a
  slow lookup holds back later rows — same head-of-line trade as Flink).
- ``ordered=False`` ≈ ``unorderedWait``: rows are emitted in completion
  order within the batch — lower latency, order not guaranteed. (Either
  way Spark batch results are a SET unless you sort; the flag matters
  for streaming sinks that consume partition-ordered output.)
- timeouts: a lookup that raises or exceeds ``timeout_s`` yields NULL
  result columns plus ``lookup_error`` — Flink's timeout path
  (``AsyncFunction#timeout``) made visible as data instead of a task
  failure.

The lookup function runs in the Python worker: keep it I/O-bound (the
GIL makes CPU-bound thread pools pointless) and idempotent (Spark may
re-run a task; at-least-once calls to the external system are inherent
to BOTH engines' retry models). Per-partition client construction goes
through ``client_factory`` so connections are opened once per task, not
per row — the ``RichAsyncFunction#open`` equivalent.
"""

from __future__ import annotations

import concurrent.futures
from collections.abc import Callable, Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def async_enrich(
    df: DataFrame,
    key_cols: Sequence[str],
    lookup: Callable[[object, tuple], dict] | None = None,
    result_schema: str | StructType = "",
    client_factory: Callable[[], object] = lambda: None,
    capacity: int = 8,
    timeout_s: float = 10.0,
    ordered: bool = True,
) -> DataFrame:
    """Enrich every row with ``lookup(client, key_tuple) -> dict`` run
    ``capacity``-way concurrent per partition.

    ``result_schema`` declares the added columns (DDL string, e.g.
    ``"score double, label string"``); every name must appear in the
    dicts ``lookup`` returns. A failed/timed-out lookup contributes
    NULLs and the error text in ``lookup_error``.
    """
    if lookup is None:
        raise ValueError("lookup function is required")
    base = df.schema
    added = (
        StructType.fromDDL(result_schema)
        if isinstance(result_schema, str)
        else result_schema
    )
    out_schema = StructType(list(base.fields) + list(added.fields)).add(
        "lookup_error", "string"
    )
    res_names = [f.name for f in added.fields]
    keys = list(key_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        client = client_factory()
        with concurrent.futures.ThreadPoolExecutor(max_workers=capacity) as pool:
            for pdf in batches:
                futs = [
                    pool.submit(lookup, client, tuple(row))
                    for row in pdf[keys].itertuples(index=False, name=None)
                ]
                results: list[tuple[int, dict | None, str | None]] = []

                def settle(i, f):
                    try:
                        results.append((i, f.result(timeout=timeout_s), None))
                    except Exception as e:  # noqa: BLE001 — error becomes data
                        f.cancel()
                        results.append((i, None, f"{type(e).__name__}: {e}"))

                if ordered:
                    for i, f in enumerate(futs):
                        settle(i, f)
                else:
                    # completion order: the unorderedWait latency win.
                    # PROGRESS-BASED deadline: wait up to timeout_s for
                    # at least one completion; any completion resets the
                    # clock. A batch of n fast lookups draining through
                    # `capacity` slots never falsely times out no matter
                    # how long the whole batch takes (a cumulative-batch
                    # deadline did, once the batch outlasted timeout_s),
                    # while a hung service stalls the task at most
                    # timeout_s past the LAST completion — not
                    # ceil(n/capacity)*timeout_s as the old per-request
                    # accounting allowed.
                    order = {id(f): i for i, f in enumerate(futs)}
                    pending: set = set(futs)
                    while pending:
                        done, pending = concurrent.futures.wait(
                            pending,
                            timeout=timeout_s,
                            return_when=concurrent.futures.FIRST_COMPLETED,
                        )
                        if not done:
                            break  # a full timeout_s with ZERO progress
                        for f in done:
                            settle(order[id(f)], f)
                    for f in pending:
                        # A future can complete between wait() returning an
                        # empty `done` set and this cleanup loop — its result
                        # is available, so settle it instead of dropping a
                        # successful lookup as a timeout.
                        if f.done():
                            settle(order[id(f)], f)
                            continue
                        # cancel() only succeeds on queued-never-started
                        # futures — label those distinctly from the hung
                        # in-flight ones so one stalled lookup doesn't make
                        # every queued row read as its own timeout.
                        if f.cancel():
                            results.append(
                                (
                                    order[id(f)],
                                    None,
                                    "TimeoutError: never started (pool stalled)",
                                )
                            )
                            continue
                        # cancel() == False means running OR already done: a
                        # future can finish between the f.done() check above
                        # and cancel() — its result is available, so settle
                        # it rather than recording a timeout (same race class
                        # the preceding done() check closed, narrower window).
                        if f.done():
                            settle(order[id(f)], f)
                        else:
                            results.append(
                                (
                                    order[id(f)],
                                    None,
                                    "TimeoutError: no progress within timeout",
                                )
                            )
                idx = [i for i, _, _ in results]
                out = pdf.iloc[idx].reset_index(drop=True)
                for name in res_names:
                    out[name] = [
                        None if r is None else r.get(name) for _, r, _ in results
                    ]
                out["lookup_error"] = [err for _, _, err in results]
                yield out

    return df.mapInPandas(run, out_schema)
