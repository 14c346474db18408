"""Async external-lookup enrichment (operators/async_enrich.py):
ordered/unordered parity, error-as-data, per-partition client reuse,
concurrency actually overlapping."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from flink_playground_spark.operators.async_enrich import async_enrich


def _make_fake_lookup():
    """Deterministic 'external service': latency varies by key, value is
    a pure function of the key — so results are assertable and retries
    are idempotent. Built as a NESTED function so cloudpickle ships it
    by value to the Python workers (a tests-module global would pickle
    by reference and fail to import there)."""

    def fake_lookup(client, key):
        (k,) = key
        time.sleep(0.001 * (k % 7))
        if k % 10 == 9:
            raise RuntimeError(f"upstream 500 for {k}")
        return {"score": float(k) * 1.5, "label": f"cat{k % 3}"}

    return fake_lookup


def test_enrich_values_and_errors(spark):
    df = spark.range(0, 40).select(F.col("id").alias("k"))
    out = async_enrich(
        df, ["k"], _make_fake_lookup(), "score double, label string", capacity=8
    ).collect()
    assert len(out) == 40
    by_k = {r.k: r for r in out}
    for k in range(40):
        r = by_k[k]
        if k % 10 == 9:
            assert r.score is None and r.label is None
            assert "upstream 500" in r.lookup_error
        else:
            assert r.score == k * 1.5 and r.label == f"cat{k % 3}"
            assert r.lookup_error is None


def test_ordered_and_unordered_same_set(spark):
    df = spark.range(0, 30).select(F.col("id").alias("k"))
    a = async_enrich(df, ["k"], _make_fake_lookup(), "score double, label string", ordered=True)
    b = async_enrich(df, ["k"], _make_fake_lookup(), "score double, label string", ordered=False)
    key = lambda rows: sorted((r.k, r.score, r.label, r.lookup_error) for r in rows)
    assert key(a.collect()) == key(b.collect())


def test_ordered_preserves_partition_order(spark):
    """orderedWait semantics: within a partition the output order is the
    input order, even though a k%7==6 row is the slowest lookup."""
    df = spark.range(0, 64).select(F.col("id").alias("k")).coalesce(2)
    out = async_enrich(
        df, ["k"], _make_fake_lookup(), "score double, label string", ordered=True
    )
    parts = out.select("k").rdd.glom().collect()
    for part in parts:
        ks = [r.k for r in part]
        assert ks == sorted(ks)


def test_client_factory_once_per_partition(spark):
    """RichAsyncFunction#open equivalent: the client is constructed once
    per partition, not per row (counted via the returned client id)."""
    import itertools

    counter = itertools.count()

    def factory(counter=counter):
        return {"client_id": next(counter)}

    def lookup(client, key):
        return {"cid": client["client_id"]}

    df = spark.range(0, 50).select(F.col("id").alias("k")).coalesce(2)
    out = async_enrich(df, ["k"], lookup, "cid long", client_factory=factory).collect()
    # every row in a partition saw the same client instance
    assert len({r.cid for r in out}) <= 2


def test_timeout_becomes_data_not_failure(spark):
    def slow(client, key):
        (k,) = key
        if k == 3:
            time.sleep(5.0)
        return {"v": float(k)}

    df = spark.range(0, 6).select(F.col("id").alias("k")).coalesce(1)
    out = async_enrich(
        df, ["k"], slow, "v double", capacity=4, timeout_s=1.0, ordered=False
    ).collect()
    by_k = {r.k: r for r in out}
    assert by_k[3].v is None and "Timeout" in by_k[3].lookup_error
    assert all(by_k[k].v == float(k) for k in (0, 1, 2, 4, 5))


def test_unordered_timeout_is_per_request_not_per_batch(spark):
    """A batch whose CUMULATIVE time exceeds timeout_s must not falsely
    time out lookups that each finish well under it: 6 sequential
    0.06s lookups through capacity=1 take ~0.36s total against
    timeout_s=0.15 — every one must still settle with a value (the
    deadline scales by ceil(n/capacity), matching the per-request
    AsyncFunction timeout the ordered path already implements)."""

    def quick(client, key):
        time.sleep(0.06)
        (k,) = key
        return {"v": float(k)}

    df = spark.range(0, 6).select(F.col("id").alias("k")).coalesce(1)
    out = async_enrich(
        df, ["k"], quick, "v double", capacity=1, timeout_s=0.15, ordered=False
    ).collect()
    assert sorted(r.v for r in out) == [float(k) for k in range(6)]
    assert all(r.lookup_error is None for r in out)


def test_hung_lookup_stalls_at_most_timeout_past_last_completion(spark):
    """Progress-based deadline: a genuinely hung lookup must settle as a
    timeout ~timeout_s after the last completion — NOT after
    ceil(n/capacity)*timeout_s (which for a big Arrow batch at small
    capacity is effectively forever). 16 fast rows + 1 hung row,
    timeout_s=0.5: the batch must be fully settled well before the 4s
    hang elapses."""

    def hang_first(client, key):
        (k,) = key
        if k == 0:
            time.sleep(4.0)  # occupies the ONLY slot
        return {"v": float(k)}

    df = spark.range(0, 31).select(F.col("id").alias("k")).coalesce(1)
    t0 = time.perf_counter()
    out = async_enrich(
        df, ["k"], hang_first, "v double", capacity=1, timeout_s=0.5, ordered=False
    ).collect()
    elapsed = time.perf_counter() - t0
    by_k = {r.k: r for r in out}
    # the hang blocks capacity=1 with ZERO completions for > timeout_s:
    # the batch must declare timeout then (the old per-request deadline,
    # ceil(31/1)*0.5 = 15.5s, let the hang run to completion and settle
    # it as a SUCCESS 4s in). Queued-but-never-started rows settle as
    # timeouts too — that is the documented progress-deadline contract.
    assert by_k[0].v is None and "Timeout" in by_k[0].lookup_error
    assert all("Timeout" in by_k[k].lookup_error for k in range(1, 31))
    # settled at ~timeout_s; wall time is dominated by the pool joining
    # the hung thread at generator close (bounded by its 4s sleep)
    assert elapsed < 12.0


def test_concurrency_overlaps_latency(spark):
    """capacity=16 on a 0.05s-per-call service must beat sequential by a
    wide margin: 32 rows in one partition ≈ 2 waves, not 32."""

    def laggy(client, key):
        time.sleep(0.05)
        return {"v": 1.0}

    df = spark.range(0, 32).select(F.col("id").alias("k")).coalesce(1)
    t0 = time.time()
    n = async_enrich(df, ["k"], laggy, "v double", capacity=16).count()
    elapsed = time.time() - t0
    assert n == 32
    assert elapsed < 1.6 * 0.05 * 32  # far under the 1.6s sequential floor
