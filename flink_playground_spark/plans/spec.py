"""Plan compilation & persistence (SURVEY §2.7 T7/T8, §3 E3).

The reference pins executions with ``tableEnv.compilePlanSql(...)`` →
``CompiledPlan.printJsonString()`` (``WithDeduplicateJoinJob.java:86-106``)
— a JSON artifact decoupling the running plan from the SQL text, plus
``env.getExecutionPlan()`` dumps (``WithStateTtlJob.java:96``).

Spark-first equivalents:
- :class:`QuerySpec` — a declarative, JSON-serializable logical spec that
  *executes* (builds a DataFrame against a session + data dir). This is
  the engine's persisted-plan artifact; streaming state compatibility is
  pinned by the checkpoint location, per SURVEY §3 E3.
- :func:`compile_plan` — capture schema + optimized logical + physical
  plan for a DataFrame (the ``printJsonString``/``getExecutionPlan``
  introspection surface).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.operators.temporal import as_of_join, temporal_join
from flink_playground_spark.operators.unnest import unnest, unnest_outer
from flink_playground_spark.operators.windows import tumble
from flink_playground_spark.sources.tables import load_table


def explain_str(df: DataFrame, mode: str = "physical") -> str:
    """T8: the execution plan as a string (``env.getExecutionPlan()``).

    ``mode``: "physical" (executed plan) or "extended" (parsed →
    analyzed → optimized → physical)."""
    qe = df._jdf.queryExecution()
    if mode == "physical":
        return qe.executedPlan().toString()
    return qe.toString()


def compile_plan(df: DataFrame) -> dict:
    """T7: plan snapshot — schema, optimized logical plan, physical plan."""
    qe = df._jdf.queryExecution()
    return {
        "schema": df.schema.jsonValue(),
        "optimized_logical": qe.optimizedPlan().toString(),
        "physical": qe.executedPlan().toString(),
    }


@dataclass
class QuerySpec:
    """Executable declarative plan: an ordered pipeline of ops.

    Ops (each a dict with ``op`` plus arguments):
      scan(table) | filter(expr) | select(exprs) | with_column(name, expr)
      | join(table|spec, on, how) | dedup_latest(keys, order, tiebreakers)
      | temporal_join(spec, on, time, how) | as_of_join(spec, on, lt, rt, how)
      | interval_join(spec, on, left_time, right_time, lower, upper, how)
      | unnest(col, outer) | tumble(time, size, slide, offset)
      | sessionize_dynamic(keys, time, gap_expr, tiebreakers)
      | resample_locf(keys, time, step, value_cols, tiebreakers)
      | group_agg(keys, aggs: {alias: expr}) | limit(n)

    Expressions are Spark SQL strings (parsed by Catalyst — same
    expression language as the SQL front end).
    """

    ops: list[dict]

    def to_json(self) -> str:
        return json.dumps({"version": 1, "ops": self.ops}, indent=2)

    @classmethod
    def from_json(cls, s: str) -> "QuerySpec":
        doc = json.loads(s)
        if doc.get("version") != 1:
            raise ValueError(f"unsupported spec version: {doc.get('version')}")
        return cls(ops=doc["ops"])

    def build(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        df: DataFrame | None = None
        for op in self.ops:
            kind = op["op"]
            if kind == "scan":
                df = load_table(spark, sf_dir, op["table"])
            elif kind == "filter":
                df = df.filter(F.expr(op["expr"]))
            elif kind == "select":
                df = df.selectExpr(*op["exprs"])
            elif kind == "with_column":
                df = df.withColumn(op["name"], F.expr(op["expr"]))
            elif kind == "join":
                right = self._side(spark, sf_dir, op["right"])
                df = df.join(right, F.expr(op["on"]), op.get("how", "inner"))
            elif kind == "dedup_latest":
                df = dedup_latest(df, op["keys"], op["order"], op.get("tiebreakers", ()))
            elif kind == "temporal_join":
                right = self._side(spark, sf_dir, op["right"])
                df = temporal_join(
                    df, right, [tuple(p) for p in op["on"]], op["time"],
                    op.get("how", "inner"), op.get("tiebreakers", ()),
                )
            elif kind == "as_of_join":
                right = self._side(spark, sf_dir, op["right"])
                df = as_of_join(
                    df, right, [tuple(p) for p in op["on"]],
                    op["left_time"], op["right_time"], op.get("how", "left"),
                )
            elif kind == "interval_join":
                from flink_playground_spark.operators.interval import interval_join

                right = self._side(spark, sf_dir, op["right"])
                df = interval_join(
                    df, right, [tuple(p) for p in op["on"]],
                    op["left_time"], op["right_time"],
                    op["lower"], op["upper"], op.get("how", "inner"),
                )
            elif kind == "sessionize_dynamic":
                from flink_playground_spark.operators.windows import sessionize_dynamic

                df = sessionize_dynamic(
                    df, op["keys"], op["time"], F.expr(op["gap_expr"]),
                    op.get("tiebreakers", ()),
                )
            elif kind == "resample_locf":
                from flink_playground_spark.operators.temporal import resample_locf

                df = resample_locf(
                    df, op["keys"], op["time"], op.get("step", "1 hour"),
                    op.get("value_cols"), op.get("tiebreakers", ()),
                )
            elif kind == "unnest":
                df = (unnest_outer if op.get("outer", True) else unnest)(df, op["col"])
            elif kind == "tumble":
                df = tumble(df, op["time"], op["size"], op.get("slide"), op.get("offset"))
            elif kind == "group_agg":
                aggs = [F.expr(e).alias(a) for a, e in op["aggs"].items()]
                df = df.groupBy(*op["keys"]).agg(*aggs)
            elif kind == "limit":
                df = df.limit(op["n"])
            else:
                raise ValueError(f"unknown op: {kind}")
        if df is None:
            raise ValueError("empty spec")
        return df

    def _side(self, spark: SparkSession, sf_dir: str, right) -> DataFrame:
        if isinstance(right, str):
            return load_table(spark, sf_dir, right)
        return QuerySpec(right["ops"]).build(spark, sf_dir)
