"""Oracle-differential tests: every registry query vs its DuckDB oracle at
sf0.001 (fast; the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

ALL = {**REGISTRY, **EXTRA_REGISTRY}
from flink_playground_spark.sources.tables import TABLES
from tools.check import compare


@pytest.fixture(scope="module")
def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", sorted(ALL))
def test_query_matches_oracle(spark, sf_dir, oracle_con, name):
    q = ALL[name]
    spark_pdf = q.spark_fn(spark, sf_dir).toPandas()
    if q.oracle is None and q.py_oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract
        return
    if q.oracle is not None:
        oracle_pdf = oracle_con.sql(q.oracle).fetchdf()
    else:
        # hash-seeded query DuckDB cannot express: FULL value check
        # against the bit-exact Python reference (functions/reference.py)
        # — round 5 proved that leaving these rows-only lets a wrong
        # rewrite of PQ/BPE/PCA internals sail through pytest.
        oracle_pdf = q.py_oracle(sf_dir)
    problems = compare(spark_pdf, oracle_pdf)
    assert not problems, f"{name}: " + "; ".join(problems)
