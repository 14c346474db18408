"""Streaming CEP: incremental funnel detection over an event stream.

The batch funnel (``operators/cep.py``) resolves each start event's chain
with forward as-of joins. On a stream, re-running that over the
accumulated corpus every micro-batch would repeat the round-1 near-dup
mistake (per-batch work growing with history). Instead this operator
keeps *open partial chains* as keyed state in
``applyInPandasWithState`` — the same shape as Flink's CEP NFA state:

- state per key = the set of started-but-unfinished chains
  (start id + the timestamps matched so far);
- each micro-batch advances chains greedily in event-time order
  (first qualifying event wins — identical to the batch operator's
  earliest-next semantics);
- a chain leaves state the moment it completes (emitted, append mode)
  or its deadline (``start + within``) passes — state is bounded by the
  number of starts inside one deadline window per key, independent of
  stream history.

Ordering contract: events must arrive non-decreasing in event time per
key across micro-batches (the replay helper splits by time range). A
production deployment would front this with a watermark-delayed sort
(``streaming/runners.py`` patterns); the operator itself is agnostic.
"""

from __future__ import annotations

import glob
import os
import shutil
import tempfile
from collections.abc import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def funnel_stream(
    df: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    symbol_col: str,
    pattern: Sequence[str],
    within_ms: int,
    id_col: str,
    ttl_ms: int | None = None,
    emit_timeouts: bool = False,
) -> DataFrame:
    """Streaming skip-till-next-match funnel: emit one row per completed
    ``pattern[0] -> ... -> pattern[k-1]`` chain (strictly increasing
    event times, all within ``within_ms`` of the start). Output columns:
    key cols, ``start_id`` (the ``id_col`` of the step-1 event),
    ``ts1..tsK`` (timestamp_ntz). Equals the batch ``operators.cep.funnel``
    answer on the same events (pinned by parity tests).

    ``emit_timeouts`` adds Flink CEP's TIMED-OUT side output
    (``PatternTimeoutFunction``): a partial chain whose deadline passes
    is emitted with ``timed_out = true``, ``matched`` = steps it got
    through, and NULL ``ts`` columns beyond them, instead of vanishing
    silently — abandoned-funnel analytics come from exactly these rows.
    Expiry is detected when the key's NEXT event arrives (event times
    are per-key non-decreasing, so by then no event can complete the
    chain); a chain still open when the stream pauses stays in state,
    like an un-elapsed Flink pattern."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    k = len(pattern)
    if k < 2:
        raise ValueError("funnel_stream needs a pattern of length >= 2")
    within_us = within_ms * 1000

    out_schema = T.StructType(
        [df.schema[c] for c in keys]
        + [T.StructField("start_id", df.schema[id_col].dataType)]
        + [T.StructField(f"ts{i}", T.TimestampNTZType()) for i in range(1, k + 1)]
        + (
            [
                T.StructField("matched", T.IntegerType()),
                T.StructField("timed_out", T.BooleanType()),
            ]
            if emit_timeouts
            else []
        )
    )
    # open chains, column-wise: ids[j] started at steps_us[j][0] and has
    # matched len(steps_us[j]) symbols so far (times as int64 micros)
    state_schema = T.StructType(
        [
            T.StructField("ids", T.ArrayType(df.schema[id_col].dataType)),
            T.StructField("steps_us", T.ArrayType(T.ArrayType(T.LongType()))),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        ids: list = []
        steps: list[list[int]] = []
        if state.exists:
            sids, ssteps = state.get
            ids, steps = list(sids), [list(s) for s in ssteps]
        done: list[tuple] = []
        expired: list[tuple] = []
        # a large group arrives as several Arrow chunks — sort the whole
        # batch once, not per chunk
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values([time_col, id_col])
            ts_us = pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
            syms = pdf[symbol_col].to_numpy()
            evids = pdf[id_col].to_numpy()
            for t, sym, eid in zip(ts_us.tolist(), syms.tolist(), evids.tolist()):
                # .tolist() => plain Python scalars: numpy values in the
                # state tuple break the JVM-side unpickler
                # expire chains whose deadline has passed (event times are
                # non-decreasing, so no future event can advance them)
                live = [j for j in range(len(ids)) if steps[j][0] + within_us >= t]
                if len(live) != len(ids):
                    if emit_timeouts:
                        dead = set(range(len(ids))) - set(live)
                        expired.extend((ids[j], steps[j]) for j in sorted(dead))
                    ids = [ids[j] for j in live]
                    steps = [steps[j] for j in live]
                nxt_ids, nxt_steps = [], []
                for sid, st in zip(ids, steps):
                    if sym == pattern[len(st)] and t > st[-1]:
                        st = st + [t]
                        if len(st) == k:
                            done.append((sid, st))
                            continue  # completed -> emitted, leaves state
                    nxt_ids.append(sid)
                    nxt_steps.append(st)
                ids, steps = nxt_ids, nxt_steps
                if sym == pattern[0]:
                    ids.append(eid)
                    steps.append([int(t)])
        if ids:
            state.update((ids, steps))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
        elif state.exists:
            state.remove()
        if done or expired:
            rows = []
            for timed_out, chains in ((False, done), (True, expired)):
                for sid, st in chains:
                    row = dict(zip(keys, key))
                    row["start_id"] = sid
                    for i in range(1, k + 1):
                        row[f"ts{i}"] = (
                            pd.Timestamp(st[i - 1], unit="us") if i <= len(st) else None
                        )
                    if emit_timeouts:
                        row["matched"] = len(st)
                        row["timed_out"] = timed_out
                    rows.append(row)
            yield pd.DataFrame(rows)

    return df.groupBy(*keys).applyInPandasWithState(
        detect, out_schema, state_schema, "append", timeout
    )


def replay_events_stream_timeordered(
    spark: SparkSession, sf_dir: str, waves: int = 3, files_per_batch: int = 1
) -> DataFrame:
    """events replayed as a stream in event-time order: the table is split
    into ``waves`` contiguous time ranges (ntile over ts), one file per
    micro-batch, mtimes pinned strictly increasing so the file source
    drains them in order."""
    from flink_playground_spark.sources.tables import load_table

    work = tempfile.mkdtemp(prefix="fps_evsrc_")
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.selectExpr(
        f"percentile_approx(unix_micros(cast(ts as timestamp)), array({','.join(str((i + 1) / waves) for i in range(waves - 1))}), 10000) p"
    ).collect()[0]["p"] if waves > 1 else []
    src = f"{work}/src"
    os.makedirs(src)
    tsd = F.unix_micros(F.col("ts").cast("timestamp"))
    for i in range(waves):
        cond = F.lit(True)
        if i > 0:
            cond = cond & (tsd > bounds[i - 1])
        if i < waves - 1:
            cond = cond & (tsd <= bounds[i])
        part = f"{work}/w{i}"
        ev.filter(cond).coalesce(1).write.mode("overwrite").parquet(part)
        dst = f"{src}/wave{i}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        os.utime(dst, (1_700_000_000 + i, 1_700_000_000 + i))
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src)
    )


def funnel_txn_wave(
    state,
    writer_id: str,
    batch_id: int,
    events: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    symbol_col: str,
    pattern: Sequence[str],
    within_ms: int,
    id_col: str,
) -> bool:
    """One exactly-once wave of the funnel over TRANSACTIONAL bucketed
    state (``txn_state.TransactionalKeyState``) — the foreachBatch
    deployment shape, where ``funnel_stream`` is the
    applyInPandasWithState one.

    State rows (one per chain, live or settled)::

        keys..., start_id, steps_us array<long>, status
        status: 'open' | 'done' | 'timeout'

    Each wave unions the key's open chains with the wave's events
    (encoded into the same schema with status='ev'), replays the exact
    ``funnel_stream`` advance loop per key inside ``applyInPandas``, and
    commits the resulting chain set back — completed and TIMED-OUT
    chains stay in state as settled rows, so the query answer is a pure
    read (``funnel_txn_results``) and replays are absorbed by the
    writers ledger (returns False on a re-delivered batch). Because the
    state lives in the transactional store, a mid-stream
    ``state.rebucket(spark, n)`` rescale preserves open chains, settled
    rows, AND the replay guard (pinned by test_cep).

    Ordering contract matches ``funnel_stream``: per-key event times
    non-decreasing across waves."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    k = len(pattern)
    if k < 2:
        raise ValueError("funnel_txn_wave needs a pattern of length >= 2")
    within_us = within_ms * 1000
    pat = list(pattern)
    key_names = list(keys)
    tcol, scol, icol = time_col, symbol_col, id_col

    encoded = events.select(
        *key_names,
        F.col(icol).alias("start_id"),
        F.array(F.unix_micros(F.col(tcol).cast("timestamp"))).alias("steps_us"),
        F.col(scol).alias("sym"),
        F.lit("ev").alias("status"),
    )
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in encoded.schema.fields
    )

    def advance(pdf: pd.DataFrame) -> pd.DataFrame:
        settled = pdf[pdf["status"].isin(["done", "timeout"])]
        opens = pdf[pdf["status"] == "open"]
        ids = opens["start_id"].tolist()
        steps = [list(s) for s in opens["steps_us"]]
        evs = pdf[pdf["status"] == "ev"].copy()
        evs["__t"] = [int(s[0]) for s in evs["steps_us"]]
        evs = evs.sort_values(["__t", "start_id"])
        done: list[tuple] = []
        expired: list[tuple] = []
        for t, sym, eid in zip(
            evs["__t"].tolist(), evs["sym"].tolist(), evs["start_id"].tolist()
        ):
            live = [j for j in range(len(ids)) if steps[j][0] + within_us >= t]
            if len(live) != len(ids):
                dead = set(range(len(ids))) - set(live)
                expired.extend((ids[j], steps[j]) for j in sorted(dead))
                ids = [ids[j] for j in live]
                steps = [steps[j] for j in live]
            nxt_ids, nxt_steps = [], []
            for sid, st in zip(ids, steps):
                if sym == pat[len(st)] and t > st[-1]:
                    st = st + [t]
                    if len(st) == k:
                        done.append((sid, st))
                        continue
                nxt_ids.append(sid)
                nxt_steps.append(st)
            ids, steps = nxt_ids, nxt_steps
            if sym == pat[0]:
                ids.append(eid)
                steps.append([int(t)])
        kvals = {c: (pdf[c].iloc[0] if len(pdf) else None) for c in key_names}
        rows = [
            {**kvals, "start_id": sid, "steps_us": st, "sym": None, "status": status}
            for status, chains in (("done", done), ("timeout", expired), ("open", zip(ids, steps)))
            for sid, st in chains
        ]
        out = pd.concat([settled, pd.DataFrame(rows, columns=pdf.columns)]) if rows else settled
        return out[list(pdf.columns)]

    def combine(base: DataFrame, cols: Sequence[str]) -> DataFrame:
        return base.groupBy(*key_names).applyInPandas(advance, out_fields).select(*cols)

    return state.merge_transform(writer_id, batch_id, encoded, combine)


def funnel_txn_results(state, spark: SparkSession, n_steps: int) -> DataFrame:
    """Settled chains from the transactional funnel state, decoded to
    the ``funnel_stream(emit_timeouts=True)`` output shape: key cols,
    ``start_id``, ``ts1..tsK`` (NULL beyond the matched prefix),
    ``matched``, ``timed_out``. Open chains stay silent, exactly like
    the streaming operator."""
    st = state.read(spark)
    if st is None:
        raise ValueError("funnel state is empty")
    settled = st.filter(F.col("status").isin("done", "timeout"))
    cols = [c for c in st.columns if c not in ("steps_us", "sym", "status")]
    sel = [F.col(c) for c in cols]
    for i in range(1, n_steps + 1):
        # try_element_at: 1-based, NULL past the matched prefix (plain
        # element_at throws under ANSI). The cast chain is the exact
        # inverse of the encode (ntz -> instant in session tz ->
        # micros), so any single session round-trips the naive value
        # regardless of its timezone.
        sel.append(
            F.timestamp_micros(F.try_element_at("steps_us", F.lit(i)))
            .cast("timestamp_ntz")
            .alias(f"ts{i}")
        )
    sel.append(F.size("steps_us").alias("matched"))
    sel.append((F.col("status") == "timeout").alias("timed_out"))
    return settled.select(*sel)


def match_contiguous_stream(
    df: DataFrame,
    keys: str | Sequence[str],
    time_col: str,
    symbol_col: str,
    pattern: Sequence[str],
    id_col: str,
    ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming strict-contiguity matcher: ``pattern`` on k consecutive
    rows of each key's (time, id)-ordered stream, across micro-batch
    boundaries. State per key = the last k-1 rows only — a window of k
    consecutive rows can span at most that far back, and any window fully
    inside the previous batch was already emitted there, so prepending
    the k-1 tail sees every boundary-spanning window exactly once (no
    duplicates by construction). Output: key cols + ``start_id`` +
    ``ts1..tsK``."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    k = len(pattern)
    if k < 2:
        raise ValueError("match_contiguous_stream needs a pattern of length >= 2")

    out_schema = T.StructType(
        [df.schema[c] for c in keys]
        + [T.StructField("start_id", df.schema[id_col].dataType)]
        + [T.StructField(f"ts{i}", T.TimestampNTZType()) for i in range(1, k + 1)]
    )
    # tail of the key's stream: last k-1 (time_us, symbol, id) triples
    state_schema = T.StructType(
        [
            T.StructField("ts_us", T.ArrayType(T.LongType())),
            T.StructField("syms", T.ArrayType(T.StringType())),
            T.StructField("ids", T.ArrayType(df.schema[id_col].dataType)),
        ]
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout if ttl_ms else GroupStateTimeout.NoTimeout
    )

    def detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        tail_t: list[int] = []
        tail_s: list[str] = []
        tail_i: list = []
        if state.exists:
            st_t, st_s, st_i = state.get
            tail_t, tail_s, tail_i = list(st_t), list(st_s), list(st_i)
        n_tail = len(tail_t)
        rows_t, rows_s, rows_i = tail_t, tail_s, tail_i
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values([time_col, id_col])
            rows_t = rows_t + pdf[time_col].astype("datetime64[us]").astype("int64").tolist()
            rows_s = rows_s + pdf[symbol_col].tolist()
            rows_i = rows_i + pdf[id_col].tolist()
        out = []
        # windows that END in a new row: start positions from
        # max(0, n_tail - (k-1)) would double-count nothing — any window
        # ending inside the tail was emitted by the batch that completed it,
        # so only scan windows whose last row is new (index >= n_tail).
        for end in range(max(n_tail, k - 1), len(rows_t)):
            start = end - (k - 1)
            if all(rows_s[start + j] == pattern[j] for j in range(k)):
                row = dict(zip(keys, key))
                row["start_id"] = rows_i[start]
                for j in range(k):
                    row[f"ts{j + 1}"] = pd.Timestamp(rows_t[start + j], unit="us")
                out.append(row)
        new_tail_t = rows_t[-(k - 1):] if len(rows_t) >= k - 1 else rows_t
        new_tail_s = rows_s[-(k - 1):] if len(rows_s) >= k - 1 else rows_s
        new_tail_i = rows_i[-(k - 1):] if len(rows_i) >= k - 1 else rows_i
        if new_tail_t:
            state.update((new_tail_t, new_tail_s, new_tail_i))
            if ttl_ms:
                state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out)

    return df.groupBy(*keys).applyInPandasWithState(
        detect, out_schema, state_schema, "append", timeout
    )
