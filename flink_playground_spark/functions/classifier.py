"""Model-based quality filtering: logistic regression trained ON the
cluster as DataFrame aggregations — the fastText/classifier stage of
LLM data pipelines (GPT-3/LLaMA-style "train a quality classifier,
keep what scores high") without leaving the engine.

Full-batch gradient descent where each iteration is ONE aggregate over
the feature table: ``grad_j = (1/n) Σ (σ(w·x) − y)·x_j``. The weight
vector lives on the driver (a handful of doubles — the same bounded
driver state as k-means centroids or BPE merge picks); the data never
does. At 100 TB this is the textbook distributed LR layout: per-row
work is a codegen'd arithmetic chain, the gradient is a map-side-
combined sum, and rounds are a bounded driver loop.

Determinism discipline (for the bit-exact Python reference): the
sigmoid is rounded to 9dp before entering the gradient (``exp`` can
differ by 1 ulp across libm implementations; the round makes the
propagated value portable), gradient sums run as exact
DECIMAL(30,12) — partition-order-free — and the driver update is plain
double arithmetic replayed identically by the reference.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _z(feature_cols: Sequence[str], w: list[float]) -> Column:
    z: Column = F.lit(w[0])
    for i, c in enumerate(feature_cols):
        z = z + F.lit(w[i + 1]) * F.col(c).cast("double")
    return z


def _sigma(z: Column) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 9)


def train_logreg(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    iters: int = 8,
    lr: float = 1.0,
) -> list[float]:
    """Learn ``[bias, w_1, ..., w_k]`` by ``iters`` full-batch GD steps.
    ``label_col`` must be 0/1. One scan + one bounded aggregate per
    step; cache the feature table if it is expensive to recompute."""
    n = df.count()
    if n == 0:
        raise ValueError("empty training set")
    w = [0.0] * (len(feature_cols) + 1)
    # each step's aggregate builds from ONE parsed SQL string — the
    # Column-API chain cost ~40 py4j round-trips per iteration, paid
    # iters× in a driver loop (round 13). CAST('<repr>' AS DOUBLE)
    # reproduces F.lit(float) exactly (repr round-trips), so the
    # Catalyst tree — and the bit-exact oracle replay — are unchanged.
    for _ in range(iters):
        z = f"CAST('{w[0]!r}' AS DOUBLE)" + "".join(
            f" + CAST('{w[i + 1]!r}' AS DOUBLE) * CAST(`{c}` AS DOUBLE)"
            for i, c in enumerate(feature_cols)
        )
        err = (
            f"(round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-({z}))), 9)"
            f" - CAST(`{label_col}` AS DOUBLE))"
        )
        aggs = [f"CAST(SUM(CAST({err} AS DECIMAL(30,12))) AS DOUBLE) AS g0"] + [
            f"CAST(SUM(CAST(({err} * CAST(`{c}` AS DOUBLE)) AS DECIMAL(30,12))) AS DOUBLE) AS g{i + 1}"
            for i, c in enumerate(feature_cols)
        ]
        g = df.agg(*[F.expr(a) for a in aggs]).collect()[0]
        w = [wi - lr * g[f"g{i}"] / n for i, wi in enumerate(w)]
    return w


def predict_logreg(
    df: DataFrame, feature_cols: Sequence[str], w: list[float], threshold: float = 0.5
) -> DataFrame:
    """Adds ``prob`` (6dp) and ``pred`` (prob >= threshold) columns —
    a pure scan-stage projection, no shuffle."""
    prob = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(feature_cols, w))), 6)
    return df.withColumn("prob", prob).withColumn(
        "pred", (F.col("prob") >= F.lit(float(threshold))).cast("int")
    )
