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


def proctime() -> Column:
    """``PROCTIME()`` processing-time attribute (T2): wall-clock stamped
    per batch/micro-batch. For deterministic tests, inject an explicit
    timestamp column instead (SURVEY §7.4)."""
    return F.current_timestamp()
