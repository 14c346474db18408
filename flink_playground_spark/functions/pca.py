"""Distributed PCA by power iteration — the embedding-space analysis
step (whitening / dominant-direction removal: "All-but-the-top",
Mu & Viswanath, ICLR 2018, is literally "subtract the mean, remove the
top principal components" — a standard preprocessing pass before
embedding similarity search at corpus scale).

Everything is DataFrame aggregates over bounded driver state, the same
layout as k-means / logistic regression / BPE in this engine:

- the mean vector is ONE aggregate (``dim`` exact-DECIMAL sums),
- each power-iteration round is ONE aggregate: per-row score
  ``s = (x − μ)·v`` as an unrolled codegen chain, then ``dim`` DECIMAL
  sums of ``s·(x_d − μ_d)`` — i.e. one pass computes ``Σ x x'ᵀ v``
  without ever materializing the covariance matrix,
- the driver holds μ and v (``dim`` doubles each) and renormalizes
  between rounds.

Determinism: DECIMAL(30,12) sums are aggregation-order-free; v is
rounded to 9dp after each normalization so the next round's literals
are bit-portable to the pure-Python reference; the sign is fixed by
convention (first non-zero component positive) since eigenvectors are
sign-ambiguous. Projections round to 6dp.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _r9(x: float) -> float:
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x))).quantize(Decimal("1e-9"), ROUND_HALF_UP))


def mean_vector(df: DataFrame, vec_col: str, dim: int) -> list[float]:
    """Per-dimension mean as one aggregate (exact-DECIMAL sums, double
    division) — bounded driver state, no explode shuffle."""
    aggs = [
        F.sum(F.col(vec_col)[d].cast("double").cast("decimal(30,12)"))
        .cast("double")
        .alias(f"s{d}")
        for d in range(dim)
    ] + [F.count(F.lit(1)).alias("n")]
    r = df.agg(*aggs).collect()[0]
    n = r["n"]
    return [r[f"s{d}"] / n for d in range(dim)]


def _centered(vec_col: str, mean: list[float], d: int) -> Column:
    return F.col(vec_col)[d].cast("double") - F.lit(mean[d])


def _score(vec_col: str, mean: list[float], v: list[float], dim: int) -> Column:
    s: Column = F.lit(0.0)
    for d in range(dim):
        s = s + _centered(vec_col, mean, d) * F.lit(v[d])
    return s


def power_component(
    df: DataFrame,
    vec_col: str,
    dim: int,
    mean: list[float],
    iters: int = 8,
    deflate: list[list[float]] = (),
) -> list[float]:
    """Dominant principal component of the (mean-centered) vectors via
    ``iters`` power-iteration rounds; pass earlier components in
    ``deflate`` to get the next one (classic deflation: the score
    subtracts each earlier component's projection, scan-locally)."""
    v = [0.0] * dim
    v[0] = 1.0  # deterministic seed
    for _ in range(iters):
        s = _score(vec_col, mean, v, dim)
        for u in deflate:
            # remove earlier components from the ITERATE, not the data:
            # s_defl = (x-μ)·v − Σ_u (u·v)((x-μ)·u) is algebraically the
            # score against the deflated matrix because u is unit-norm
            uv = sum(a * b for a, b in zip(u, v))
            s = s - F.lit(uv) * _score(vec_col, mean, u, dim)
        # project the score ONCE; referencing the raw chain inside all
        # `dim` aggregates duplicates a ~dim·(1+len(deflate))-term tree
        # per aggregate — measured 13.8 MiB task binaries and minutes of
        # codegen per round before this split. Same double ops, same
        # result, linear-size plan.
        scored = df.select(F.col(vec_col), s.alias("__s"))
        aggs = [
            F.sum((F.col("__s") * _centered(vec_col, mean, d)).cast("decimal(30,12)"))
            .cast("double")
            .alias(f"u{d}")
            for d in range(dim)
        ]
        r = scored.agg(*aggs).collect()[0]
        u = [r[f"u{d}"] for d in range(dim)]
        for w in deflate:
            uw = sum(a * b for a, b in zip(u, w))
            u = [a - uw * b for a, b in zip(u, w)]
        norm = math.sqrt(sum(x * x for x in u))
        v = [_r9(x / norm) for x in u]
    # sign convention: first non-zero component positive
    for x in v:
        if x != 0.0:
            if x < 0:
                v = [-y for y in v]
            break
    return v


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_components: int = 2,
    iters: int = 8,
) -> DataFrame:
    """(id, pc1..pcK) — mean-center, extract K components by power
    iteration + deflation, project each vector (scan-local, 6dp)."""
    mean = mean_vector(df, vec_col, dim)
    comps: list[list[float]] = []
    for _ in range(n_components):
        comps.append(
            power_component(df, vec_col, dim, mean, iters=iters, deflate=list(comps))
        )
    cols = [F.col(id_col)] + [
        F.round(_score(vec_col, mean, c, dim), 6).alias(f"pc{i + 1}")
        for i, c in enumerate(comps)
    ]
    return df.select(*cols)
