"""flink_playground_spark — a PySpark-native analytics engine.

Re-expresses the query semantics of maqroll/flink-playground (a Flink
Table API / SQL-on-streams playground) as an idiomatic PySpark engine:
DataFrame/SQL logical plans optimized by Catalyst, Structured Streaming
for unbounded inputs, and Arrow-batched Pandas UDFs only where built-in
operators cannot express the semantics.

Reference (read-only, studied for behavior only):
``/root/reference/flink playground/`` — seven Flink jobs exercising
temporal (as-of) joins, dedup-keep-latest, stream-stream outer joins,
tumbling-window aggregation, and correlated UNNEST.

Layout:
- ``session``    engine session / config (parallelism T9, state-TTL T4/T5)
- ``sources``    parquet corpus, in-memory collections (S1), datagen (S2-S4)
- ``sinks``      console/print (S5/S6), insert-into (S7), memory sink
- ``operators``  relational (P1-P7, J4-J8), dedup (W1/W2), temporal
                 as-of join (J1-J3, U1/U2), windows (A1, G1/T1), unnest (J7)
- ``functions``  text analysis, similarity search, large-scale dedup,
                 multimodal plumbing (engine extensions)
- ``plans``      query-spec serialization / plan dump (T7/T8, E3)
- ``streaming``  changelog runners, stateful keep-latest, foreachBatch
                 enrichment (T2-T6)
"""

from flink_playground_spark.session import get_spark, tune  # noqa: F401

__version__ = "0.1.0"
