"""Correlated UNNEST / cross-join-to-array (SURVEY §2.3 J7).

Reference semantics: ``FROM input LEFT OUTER JOIN UNNEST(input.items)
AS T(item_id) ON TRUE`` (``CrossJoinJob.java:66-73``) — explode an
array-of-struct column per row, preserving rows whose array is empty or
NULL with NULL element values (the ``(id='b', items=[])`` fixture at
``CrossJoinJob.java:51`` must survive as ``(b, NULL)``).

Spark-first: ``explode_outer`` is the exact semantic match; it runs
inside whole-stage codegen (Generate node), no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def unnest_outer(df: DataFrame, array_col: str, keep: list[str] | None = None) -> DataFrame:
    """LEFT OUTER JOIN UNNEST: one output row per array element; empty or
    NULL arrays produce a single row with NULLs. Struct elements are
    flattened to their fields; scalar elements take the array column name.
    """
    keep = keep if keep is not None else [c for c in df.columns if c != array_col]
    elem_type = df.schema[array_col].dataType.elementType
    exploded = df.select(*keep, F.explode_outer(array_col).alias("__elem"))
    if isinstance(elem_type, T.StructType):
        return exploded.select(*keep, "__elem.*")
    return exploded.withColumnRenamed("__elem", array_col)


def unnest(df: DataFrame, array_col: str, keep: list[str] | None = None) -> DataFrame:
    """Inner UNNEST (comma cross join J8 against the array): empty arrays
    drop their parent row — ``explode``."""
    keep = keep if keep is not None else [c for c in df.columns if c != array_col]
    elem_type = df.schema[array_col].dataType.elementType
    exploded = df.select(*keep, F.explode(array_col).alias("__elem"))
    if isinstance(elem_type, T.StructType):
        return exploded.select(*keep, "__elem.*")
    return exploded.withColumnRenamed("__elem", array_col)
