"""Deterministic corpus sampling for training-data pipelines.

Training runs need samples that are (a) reproducible across re-runs and
engines, (b) stable under repartitioning, and (c) computable in one
distributed pass. Random() fails all three; everything here keys off a
content hash (md5 of the row key), so any engine that agrees on md5
draws the same sample — which is also what makes these operators
oracle-checkable against DuckDB bit-for-bit.

Two families:

- ``bernoulli_hash_sample``: include a row iff md5(key) is below a hex
  threshold — an embarrassingly-parallel scan filter (no shuffle, no
  state), the distributed analogue of Bernoulli sampling at rate
  int(threshold,16)/16**len(threshold).
- ``stratified_topk_sample``: exactly k rows per stratum, chosen as the
  k smallest hashes — "hash-ordered reservoir" semantics without
  sequential state. Implemented two-level the same way as
  similarity.brute_force_topk: a salted local rank prunes each
  partition-slice to ≤k candidates BEFORE the per-stratum global rank,
  so no single reducer ever sees a stratum's full row set (a stratum
  can hold billions of rows at 100 TB; k·n_salt is what crosses the
  second shuffle).

Reference parity: the reference engine has no sampling surface; this is
part of the training-pipeline extension family (SURVEY §7.1).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_hash(key_col) -> F.Column:
    """The deterministic sampling hash: lowercase md5 hex of the key's
    string form (engine-portable, unlike xxhash64/rand)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.md5(c.cast("string").cast("binary"))


def bernoulli_hash_sample(df: DataFrame, key_col: str, threshold_hex: str) -> DataFrame:
    """Rows whose md5(key) sorts below ``threshold_hex`` (lexicographic
    on hex = numeric on the hash prefix). '28' ≈ 15.6 %, '80' = 50 %."""
    return df.filter(sample_hash(key_col) < threshold_hex)


def stratified_topk_sample(
    df: DataFrame,
    strata: Sequence[str],
    key_col: str,
    k: int,
    n_salt: int = 16,
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum: the k smallest sample
    hashes, ties broken by the key itself. Output = input columns plus
    ``sample_rank`` (1-based within the stratum)."""
    strata = list(strata)
    h = sample_hash(key_col).alias("__h")
    salted = df.select("*", h, F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_salt)).alias("__salt"))
    w_local = Window.partitionBy(*strata, "__salt").orderBy(F.col("__h"), F.col(key_col))
    pruned = (
        salted.withColumn("__lr", F.row_number().over(w_local))
        .filter(F.col("__lr") <= k)
        .drop("__lr", "__salt")
    )
    w_global = Window.partitionBy(*strata).orderBy(F.col("__h"), F.col(key_col))
    return (
        pruned.withColumn("sample_rank", F.row_number().over(w_global).cast("bigint"))
        .filter(F.col("sample_rank") <= k)
        .drop("__h")
    )


def mixing_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    targets: dict[str, float],
    total_n: int,
    n_salt: int = 16,
) -> DataFrame:
    """Domain mixing: a deterministic sample hitting TARGET PROPORTIONS
    per stratum — the composition step of every pretraining data recipe
    (up-weight scarce domains, cap dominant ones) made reproducible.

    Per-stratum quota ``k_s = floor(total_n * share + 0.5)`` (half-up,
    engine-portable); strata outside ``targets`` are excluded. Each
    stratum yields its ``k_s`` smallest sample hashes via the same
    two-level salted rank as ``stratified_topk_sample`` (pruned at the
    max quota, then per-stratum cut by a broadcast quota table) — so the
    sample is stable under repartitioning and identical across engines.
    A stratum smaller than its quota contributes everything it has (the
    under-run is visible in the output counts, not silently rebalanced).
    """
    ks = {s: int(total_n * share + 0.5) for s, share in targets.items()}
    spark = df.sparkSession
    ranked = stratified_topk_sample(
        df.filter(F.col(stratum_col).isin(list(ks))),
        [stratum_col],
        key_col,
        max(ks.values()),
        n_salt,
    )
    kdf = spark.createDataFrame(
        [(s, k) for s, k in ks.items()], f"{stratum_col} string, __k long"
    )
    return (
        ranked.join(F.broadcast(kdf), stratum_col)
        .filter(F.col("sample_rank") <= F.col("__k"))
        .drop("__k")
    )
