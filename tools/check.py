"""Local replica of the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB over the same
parquet, then compares row count, column names, and order-insensitive
values. Usage::

    python tools/check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import pathlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark  # noqa: E402
from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY  # noqa: E402

ALL = {**REGISTRY, **EXTRA_REGISTRY}
from flink_playground_spark.sources.tables import TABLES  # noqa: E402


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            s = s.astype("datetime64[us]")
        df[c] = s.map(lambda v: "<null>" if v is None or v != v else str(v))
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        problems.append(f"columns spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}")
        return problems
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) == len(b) and not a.equals(b):
        neq = (a != b).any(axis=1)
        sample = pd.concat([a[neq].head(3).assign(__src="spark"), b[neq].head(3).assign(__src="oracle")])
        problems.append(f"values differ in {int(neq.sum())} rows:\n{sample.to_string()}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    names = [a for a in sys.argv[1:] if "/" not in a] or list(ALL)
    spark = get_spark("check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = 0
    for name in names:
        q = ALL[name]
        t0 = time.time()
        try:
            spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None and q.py_oracle is None:
            status = "ROWS-ONLY" if len(spark_pdf) >= 0 else "FAIL"
            print(f"{status:9s} {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            if q.oracle is not None:
                oracle_pdf = con.sql(q.oracle).fetchdf()
                tag = "OK"
            else:
                # hash-seeded query: full-value Python reference oracle
                # (functions/reference.py) instead of DuckDB SQL
                oracle_pdf = q.py_oracle(sf_dir)
                tag = "OK-PYREF"
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = compare(spark_pdf, oracle_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"{tag:9s} {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
    print(f"\n{len(names) - failures}/{len(names)} passed")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
