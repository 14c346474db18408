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
