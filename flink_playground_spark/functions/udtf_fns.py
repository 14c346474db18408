"""User table functions (SURVEY §2.8 U1/U2 surface — Spark 4 Python UDTF).

The reference registers a ``TemporalTableFunction`` — a *table* function
— in the environment and calls it laterally (``LateralJob.java``,
``createTemporarySystemFunction``). The engine lowers that specific TTF
to relational as-of operators (operators/temporal.py: the fast path);
this module covers the registration surface itself: a user-authored
table function registered in the session catalog and callable from SQL
with ``LATERAL``, via ``pyspark.sql.functions.udtf``.

UDTFs are row-at-a-time Python — the sanctioned *flexibility* path, not
the hot path (the engine's n-gram operators in functions/dedupe.py do
the same shingling as codegen'd expressions for bulk work). Use a UDTF
when the per-row logic genuinely can't be expressed as columns.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

_TOKEN_RE = re.compile(r"[a-z0-9]+")


@udtf(returnType="pos int, ngram string")
class TokenizeNgrams:
    """Explode a document into word n-grams: one row per (position,
    n-gram), mirroring functions/dedupe.shingle semantics (lowercase
    alphanumeric token runs, space-joined)."""

    def eval(self, text: str, n: int):
        toks = _TOKEN_RE.findall((text or "").lower())
        for i in range(max(len(toks) - n + 1, 0)):
            yield i, " ".join(toks[i : i + n])


def register_udtfs(spark: SparkSession) -> None:
    """Install the table functions into the session catalog (the
    ``createTemporarySystemFunction`` equivalent); after this,
    ``SELECT ... FROM t, LATERAL tokenize_ngrams(t.text, 3)`` works in
    plain SQL."""
    spark.udtf.register("tokenize_ngrams", TokenizeNgrams)
