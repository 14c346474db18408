"""Distributed PCA via a ONE-SCAN scatter matrix — the embedding-space
analysis step (whitening / dominant-direction removal: "All-but-the-top",
Mu & Viswanath, ICLR 2018, is literally "subtract the mean, remove the
top principal components" — a standard preprocessing pass before
embedding similarity search at corpus scale).

Scale design (replaces the round-4 power-iteration-over-the-corpus
loop, which re-scanned the table once per round — 17 scans for 2
components x 8 iters; at 100 TB that is petabytes of redundant IO for a
64-dim decomposition):

- ONE corpus scan computes every sufficient statistic: ``n``, the
  ``dim`` per-dimension sums, and the ``dim*(dim+1)/2`` upper-triangle
  raw second moments ``M[d][e] = sum(x_d * x_e)`` — 2,145 exact-DECIMAL
  map-side-combined aggregates for dim=64. Bounded driver state
  (a 64x64 matrix of doubles), independent of corpus size.
- the centered scatter matrix ``C = M - n mu mu'`` and the whole power
  iteration / deflation then run on the DRIVER's dim x dim matrix —
  O(dim^2 * iters) floats, free at any corpus scale.
- ONE more scan projects each vector (scan-local score chain, 6dp).

Determinism: DECIMAL(30,12) sums are aggregation-order-free, so the
driver-side matrix is bit-identical to the pure-Python reference's
(functions/reference.py pca_project_ref accumulates the same quantized
decimals); from there both run the SAME float arithmetic in the same
fold order — matrix-vector products left-fold over e=0..dim-1, iterates
rounded to 9dp, sign fixed by first-non-zero-positive convention.
Projections round to 6dp.
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


def corpus_moments(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[int, list[float], list[list[float]]]:
    """(n, mean, scatter) from ONE corpus scan.

    ``scatter[d][e] = sum_rows (x_d - mu_d)(x_e - mu_e)`` from EXACT
    integer raw moments over 12dp-quantized coordinates, so the result
    is aggregation-order-free and bit-portable to the Python reference
    (``reference.py pca_project_ref`` runs the same quantization and
    the same final float expressions).

    Plan shape (why not 2,145 ``F.sum`` columns): a dim=64 wide
    aggregate is ~2k expression instances and costs Catalyst/codegen
    ~1 min of data-independent planning. Instead:

    1. ONE ``transform`` lambda quantizes each coordinate JVM-side —
       ``cast(double as DECIMAL(30,12))`` is Spark's HALF_UP shortest-
       repr quantization, the engine-wide determinism contract;
    2. an Arrow-batched ``mapInPandas`` turns each batch into exact
       integer partials: count, per-dim sums, and the upper-triangle
       products via three int64 matmuls on a 2^24 hi/lo split of the
       scaled-integer coordinates (exact for |x| < ~1.4e2 per the split
       bound; a guard falls back to big-int matmul otherwise), emitted
       as (idx, DECIMAL(38,0)) rows;
    3. one 2,145-group ``groupBy(idx).sum`` — two plan expressions, a
       few-KB shuffle regardless of corpus size.

    Overflow bound on the final DECIMAL(38,0) sums: |q| <= 1e13-ish for
    unit-scale embeddings, q*q <= ~1e26, so ~1e12 rows fit in 1e38.
    """
    import pandas as pd

    n_pairs = dim * (dim + 1) // 2
    quant = df.select(
        F.transform(
            F.col(vec_col), lambda x: x.cast("double").cast("decimal(30,12)")
        ).alias("q")
    )

    # int64-split exactness bound: with |q| < 2^46, hi = q // 2^24 has
    # |hi| < 2^22 and 0 <= lo < 2^24, so over a <= 2^14-row chunk every
    # int64 matmul entry is < 2^14 * 2^48 = 2^62 — no wraparound.
    CHUNK = 1 << 14

    def _partials(batches):
        from decimal import Decimal

        import numpy as np

        for pdf in batches:
            for lo_idx in range(0, len(pdf), CHUNK):
                rows = pdf["q"].values[lo_idx : lo_idx + CHUNK]
                b = len(rows)
                if not b:
                    continue
                q = np.empty((b, dim), dtype=object)
                for i, arr in enumerate(rows):
                    q[i, :] = [int(v.scaleb(12)) for v in arr]
                s = [int(x) for x in q.sum(axis=0)]
                flat_max = max(abs(int(q.max())), abs(int(q.min())))
                if flat_max < 1 << 46:
                    qi = q.astype(np.int64)
                    hi = qi // (1 << 24)
                    lo = qi - hi * (1 << 24)
                    mhh = hi.T @ hi
                    mhl = hi.T @ lo
                    mll = lo.T @ lo
                    m = [
                        (int(mhh[d, e]) << 48)
                        + ((int(mhl[d, e]) + int(mhl[e, d])) << 24)
                        + int(mll[d, e])
                        for d in range(dim)
                        for e in range(d, dim)
                    ]
                else:
                    mm = q.T @ q  # big-int matmul: exact, slow fallback
                    m = [int(mm[d, e]) for d in range(dim) for e in range(d, dim)]
                vals = [b] + s + m
                yield pd.DataFrame(
                    {
                        "idx": range(1 + dim + n_pairs),
                        "val": [Decimal(v) for v in vals],
                    }
                )

    parts = quant.mapInPandas(_partials, "idx int, val decimal(38,0)")
    totals = parts.groupBy("idx").agg(F.sum("val").alias("t")).collect()
    from decimal import Decimal

    tot = {int(r["idx"]): int(r["t"]) for r in totals}
    n = tot[0]
    mean = [float(Decimal(tot[1 + d]).scaleb(-12)) / n for d in range(dim)]
    scatter = [[0.0] * dim for _ in range(dim)]
    k = 1 + dim
    for d in range(dim):
        for e in range(d, dim):
            c = float(Decimal(tot[k]).scaleb(-24)) - n * mean[d] * mean[e]
            scatter[d][e] = c
            scatter[e][d] = c
            k += 1
    return n, mean, scatter


def principal_components(
    scatter: list[list[float]],
    dim: int,
    n_components: int = 2,
    iters: int = 8,
) -> list[list[float]]:
    """Top-K unit eigenvectors of the scatter matrix by driver-side
    power iteration with per-round re-orthogonalization against earlier
    components (deflation). Pure O(dim^2) float math — identical, fold
    order and all, in the Python reference.

    Iterates are rounded to 9dp each round (bit-portability); a
    vanishing iterate (effective rank < K: all vectors equal, or K
    exceeds the data's rank) breaks out early instead of dividing by ~0
    and poisoning everything downstream with NaN."""
    comps: list[list[float]] = []
    for _ in range(n_components):
        v = [0.0] * dim
        v[0] = 1.0  # deterministic seed
        accepted = False
        for _ in range(iters):
            u = [0.0] * dim
            for d in range(dim):
                s = 0.0
                for e in range(dim):
                    s = s + scatter[d][e] * v[e]
                u[d] = s
            for w in comps:
                uw = sum(a * b for a, b in zip(u, w))
                u = [a - uw * b for a, b in zip(u, w)]
            norm = math.sqrt(sum(x * x for x in u))
            if norm < 1e-12:
                break  # rank exhausted — keep the previous iterate
            v = [_r9(x / norm) for x in u]
            accepted = True
        if not accepted:
            # the norm vanished before ANY accepted iterate (rank-
            # deficient scatter, e.g. all vectors identical): the raw
            # [1,0,...] seed is neither deflated nor orthogonal to
            # earlier components — emit a zero component instead so
            # pc_{i>rank} scores 0 rather than duplicating pc1.
            v = [0.0] * dim
        for x in v:
            if x != 0.0:
                if x < 0:
                    v = [-y for y in v]
                break
        comps.append(v)
    return comps


def _centered(vec_col: str, mean: list[float], d: int) -> Column:
    return F.col(vec_col)[d].cast("double") - F.lit(mean[d])


def _score(vec_col: str, mean: list[float], v: list[float], dim: int) -> Column:
    """The projection chain as ONE parsed SQL string: the Column-API
    fold cost ~4 py4j round-trips per dimension per component (round-13
    profile: most of the query's driver gap at dim=64). The string
    parses to the identical left-associative double fold —
    ``CAST('<repr>' AS DOUBLE)`` reproduces ``F.lit(float)`` exactly
    and SQL ``arr[d]`` is the same 0-based GetArrayItem."""
    terms = "".join(
        f" + (CAST(`{vec_col}`[{d}] AS DOUBLE) - CAST('{mean[d]!r}' AS DOUBLE))"
        f" * CAST('{v[d]!r}' AS DOUBLE)"
        for d in range(dim)
    )
    return F.expr(f"CAST(0.0 AS DOUBLE){terms}")


def pca_project(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_components: int = 2,
    iters: int = 8,
) -> DataFrame:
    """(id, pc1..pcK) — ONE scan for the scatter matrix, driver-side
    eigensolve, ONE scan to project (scan-local, 6dp). Two corpus scans
    total regardless of K or iteration count."""
    _, mean, scatter = corpus_moments(df, vec_col, dim)
    comps = principal_components(scatter, dim, n_components, iters)
    cols = [F.col(id_col)] + [
        F.round(_score(vec_col, mean, c, dim), 6).alias(f"pc{i + 1}")
        for i, c in enumerate(comps)
    ]
    return df.select(*cols)
