"""In-memory collection source (SURVEY §2.1 S1).

Reference: ``env.fromCollection(List<Row>, Types.ROW_NAMED(...))``
(``DataStreamJob.java:63-73`` and identical call sites in every job).
Spark-first mapping: ``spark.createDataFrame(rows, StructType)``.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_PY_TO_SPARK = {
    str: T.StringType(),
    int: T.IntegerType(),
    float: T.DoubleType(),
    bool: T.BooleanType(),
}


def from_rows(
    spark: SparkSession,
    rows: Iterable[tuple],
    names: Sequence[str],
    types: Sequence | None = None,
) -> DataFrame:
    """Bounded table from literal rows with an explicit row type.

    ``types`` entries may be Spark ``DataType`` instances, DDL strings
    ("string", "int", "timestamp_ntz", "array<struct<item_id:string>>"),
    or Python primitive types — mirroring the three schema declaration
    styles the reference uses (SQL DDL, Schema builder, ROW_NAMED).
    """
    rows = list(rows)
    if types is None:
        schema = T.StructType([T.StructField(n, _infer(rows, i), True) for i, n in enumerate(names)])
    else:
        fields = []
        for n, t in zip(names, types):
            if isinstance(t, str):
                dt = T._parse_datatype_string(t)
            elif isinstance(t, type):
                dt = _PY_TO_SPARK[t]
            else:
                dt = t
            fields.append(T.StructField(n, dt, True))
        schema = T.StructType(fields)
    return spark.createDataFrame(rows, schema=schema)


def _infer(rows: list[tuple], i: int) -> T.DataType:
    for r in rows:
        if r[i] is not None:
            return _PY_TO_SPARK.get(type(r[i]), T.StringType())
    return T.StringType()
