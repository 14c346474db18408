"""Approximate aggregates: the sketches a 100 TB pipeline actually uses.

Exact COUNT(DISTINCT) is a full shuffle of every distinct value;
`approx_count_distinct` (HyperLogLog++) and the DataSketches HLL
functions (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`,
Spark 4 built-ins) keep a fixed-size sketch per group instead. The
killer property is *mergeability*: per-partition / per-group sketches
union into coarser rollups without re-scanning the data — the two-level
pattern every planet-scale distinct count uses. All JVM-side codegen'd
aggregates; no Python in the path.

Relative error: HLL++ honors `rsd` (default 5%); DataSketches HLL with
lgConfigK=12 is ~1.6% at one standard deviation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_rollup(
    df: DataFrame,
    keys: str | Sequence[str],
    col: str,
    lg_config_k: int = 12,
) -> tuple[DataFrame, DataFrame]:
    """Two-level distinct count: per-``keys`` HLL sketches, then a grand
    total by *merging the group sketches* — the fact table is scanned
    once, and the total costs only a union of fixed-size sketches.

    Returns ``(per_group, total)``: per_group has keys +
    ``approx_distinct``; total is one row with ``approx_distinct``. At
    1000-executor scale the second level moves kilobytes, not rows.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sketches = df.groupBy(*keys).agg(
        F.hll_sketch_agg(col, F.lit(lg_config_k)).alias("__sk")
    )
    per_group = sketches.select(
        *keys, F.hll_sketch_estimate("__sk").alias("approx_distinct")
    )
    total = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("approx_distinct")
    )
    return per_group, total
