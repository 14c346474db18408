"""Relational core + fluent Table API (SURVEY §2.2 P1-P7, §2.3 J4/J6/J8, §3 E2).

The reference drives the same operators through two fronts: SQL strings
(``tableEnv.sqlQuery``, ``DataStreamJob.java:98``) and the fluent Table
API (``from("people").leftOuterJoin(countries).where(...).select(...)``,
``TableAPIJob.java:85-90``). Spark's DataFrame *is* that fluent surface;
this module adds a thin :class:`Table` wrapper for call-site parity plus
the join-predicate semantics note from SURVEY §4: the reference relies on
the planner pushing a post-join ``where`` into the outer-join condition —
we author the condition *in* the join to preserve outer semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def col(name: str) -> Column:
    """``$("name")`` expression DSL (P6)."""
    return F.col(name)


class Table:
    """Fluent Table API façade over a DataFrame (E2).

    ``Table.from_(spark, "people").left_outer_join(countries,
    col("country") == col("iso")).select("name", "capital")`` mirrors
    ``TableAPIJob.java:85-90``; ``.df`` exposes the underlying DataFrame.
    """

    def __init__(self, df: DataFrame):
        self.df = df

    @classmethod
    def from_(cls, spark: SparkSession, view_name: str) -> "Table":
        return cls(spark.table(view_name))

    def select(self, *cols) -> "Table":
        return Table(self.df.select(*cols))

    def where(self, predicate: Column) -> "Table":
        return Table(self.df.filter(predicate))

    filter = where

    def add_columns(self, **exprs: Column) -> "Table":
        """``columnByExpression`` computed columns (P7)."""
        df = self.df
        for name, expr in exprs.items():
            df = df.withColumn(name, expr)
        return Table(df)

    def join(self, other: "Table | DataFrame", on: Column, how: str = "inner") -> "Table":
        right = other.df if isinstance(other, Table) else other
        return Table(self.df.join(right, on, how))

    def left_outer_join(self, other: "Table | DataFrame", on: Column) -> "Table":
        """``leftOuterJoin`` with the predicate authored as the join
        condition (not a post-join filter), per SURVEY §4 — preserves
        outer-join null-extension semantics."""
        return self.join(other, on, "left_outer")

    def execute_print(self, n: int = 20) -> None:
        """``.execute().print()`` (S6)."""
        self.df.show(n, truncate=False)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[tuple[str, str]],
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: spread each hot left key over ``salt``
    sub-partitions (deterministic per-row salt from a full-row hash) and
    replicate the right side ``salt``× with an exploded salt column.

    Use when one join key carries a disproportionate share of rows and
    AQE's skew-join split isn't available (e.g. the skewed side is the
    output of an aggregation). Result is identical to the plain join for
    ``how`` in {inner, left/left_outer, left_semi, left_anti} — the only
    flavors allowed: the right side is replicated ``salt``×, so
    right/full outer would emit each unmatched right row ``salt`` times.
    """
    allowed = {"inner", "left", "left_outer", "left_semi", "left_anti", "semi", "anti"}
    if how not in allowed:
        raise ValueError(
            f"salted_join supports how in {sorted(allowed)}; the replicated right "
            f"side would duplicate unmatched right rows under {how!r}"
        )
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)).alias("__salt")
    left2 = left.select("*", lsalt)
    right2 = right.select("*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt"))
    cond = F.col("left.__salt") == F.col("right.__salt")
    for l, r in on:
        cond = cond & (F.col(f"left.{l}") == F.col(f"right.{r}"))
    out = left2.alias("left").join(right2.alias("right"), cond, how)
    return out.drop("__salt")


def proctime() -> Column:
    """``PROCTIME()`` processing-time attribute (T2): wall-clock stamped
    per batch/micro-batch. For deterministic tests, inject an explicit
    timestamp column instead (SURVEY §7.4)."""
    return F.current_timestamp()
