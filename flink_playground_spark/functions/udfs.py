"""User scalar functions (SURVEY §2.8 U2 surface).

NB: no ``from __future__ import annotations`` here — ``pandas_udf``
resolves real type hints, and postponed evaluation turns them into
strings it cannot interpret.
"""

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def value_bucket(v: pd.Series) -> pd.Series:
    """Bucket a double to its lower multiple of 10 — Arrow-vectorized."""
    return (v // 10) * 10.0


@pandas_udf("double")
def geo_mean(v: pd.Series) -> float:
    """Grouped-aggregate pandas UDAF (Arrow batch in, scalar out) — the
    AggregateFunction side of the reference's function surface
    (SURVEY §2.8): geometric mean of the positive values. Usable in
    ``groupBy().agg()``, over windows, and — once registered — in SQL
    ``GROUP BY`` aggregates."""
    import numpy as np

    pos = v[v > 0]
    if len(pos) == 0:
        return float("nan")
    return float(np.exp(np.log(pos.astype("float64")).mean()))
