from __future__ import annotations

from pyspark.sql import functions as F

from flink_playground_spark.operators.relational import salted_join
from flink_playground_spark.sources.tables import load_table


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change results — only the shuffle distribution."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    plain = orders.join(customer, orders.o_custkey == customer.c_custkey, "inner").select(
        "o_orderkey", "c_custkey", "c_name"
    )
    salted = salted_join(orders, customer, [("o_custkey", "c_custkey")], "inner", salt=4).select(
        "o_orderkey", "c_custkey", "c_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, sf_dir):
    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    plain = events.join(customer, events.user_id == customer.c_custkey, "left_outer")
    salted = salted_join(events, customer, [("user_id", "c_custkey")], "left_outer", salt=4)
    assert sorted(map(tuple, plain.select("event_id", "c_name").collect())) == sorted(
        map(tuple, salted.select("event_id", "c_name").collect())
    )


def test_salted_join_rejects_right_and_full_outer(spark, sf_dir):
    """The replicated right side would duplicate unmatched right rows
    under right/full outer — salted_join must refuse, not corrupt."""
    import pytest

    events = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    for how in ("right", "right_outer", "full", "full_outer", "outer"):
        with pytest.raises(ValueError, match="salted_join supports"):
            salted_join(events, customer, [("user_id", "c_custkey")], how, salt=4)


def test_pandas_udf_registered_sql_callable(spark, sf_dir):
    """U2: after registration the UDF is callable from the SQL front end."""
    from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

    # rotation-safe lookup: driver-gate rotation moves entries between
    # the registries without changing what this test pins
    {**REGISTRY, **EXTRA_REGISTRY}["pandas_udf_bucket"].spark_fn(
        spark, sf_dir
    ).collect()  # registers
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_v")
    out = spark.sql("SELECT value_bucket(value) AS b FROM events_v LIMIT 5").collect()
    assert all(r.b % 10 == 0 for r in out)


def test_udtf_lateral_ngrams_matches_jvm_shingles(spark, sf_dir):
    """U1/U2 table-function surface: a Python UDTF registered in the
    session catalog, called from SQL with LATERAL, produces the same
    n-gram multiset as the codegen'd shingle expressions (the engine's
    bulk path) — same tokenization, same joining."""
    from flink_playground_spark.functions.udtf_fns import register_udtfs
    from flink_playground_spark.sources.tables import load_table

    register_udtfs(spark)
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        """
        SELECT d.doc_id, g.pos, g.ngram
        FROM udtf_docs d, LATERAL tokenize_ngrams(d.text, 3) g
        """
    ).collect()
    # driver-side reference on the same 20 docs (test-only, tiny)
    import re as _re

    want = []
    for r in docs.select("doc_id", "text").collect():
        toks = _re.findall(r"[a-z0-9]+", r["text"].lower())
        for i in range(max(len(toks) - 2, 0)):
            want.append((r["doc_id"], i, " ".join(toks[i : i + 3])))
    assert sorted((r["doc_id"], r["pos"], r["ngram"]) for r in got) == sorted(want)
    assert len(want) > 0


def test_exact_money_agg_bit_identical_to_decimal(spark, sf_dir):
    """Both exact_money_agg paths (partition-staged and plain) must be
    bit-identical to the all-decimal formulation — integer-unit sums are
    exact in any order."""
    from flink_playground_spark.operators.money import cents, exact_money_agg
    from flink_playground_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    base = li.select(
        "l_returnflag",
        cents("l_extendedprice").alias("pc"),
        cents("l_discount").alias("dc"),
    )
    want = {
        (r["l_returnflag"], str(r["s"]))
        for r in li.groupBy("l_returnflag")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
            )
            .cast("decimal(38,4)")
            .alias("s")
        )
        .collect()
    }
    for staged in (True, False):
        got = {
            (r["l_returnflag"], str(r["s"]))
            for r in exact_money_agg(
                base,
                ["l_returnflag"],
                unit_sums={"s": (F.col("pc") * (100 - F.col("dc")), 4)},
                partition_stage=staged,
            )
            .select("l_returnflag", F.col("s").cast("decimal(38,4)").alias("s"))
            .collect()
        }
        assert got == want, f"partition_stage={staged} diverged"


def test_window_topn(spark, sf_dir):
    """Flink Window Top-N: per tumbling day, the top-2 users by event
    count — pinned against the equivalent SQL window formulation."""
    from flink_playground_spark.operators.windows import window_topn
    from flink_playground_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = window_topn(
        ev, "ts", "1 day", ["user_id"], [F.count("*").alias("cnt")],
        [F.desc("cnt"), F.asc("user_id")], 2,
    ).select("window_start", "user_id", "cnt", "rownum")
    ev.createOrReplaceTempView("ev_topn")
    want = spark.sql("""
        SELECT window_start, user_id, cnt, rownum FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY window_start, window_end
                                       ORDER BY cnt DESC, user_id) AS rownum
          FROM (SELECT window(ts, '1 day').start AS window_start,
                       window(ts, '1 day').end AS window_end,
                       user_id, count(*) AS cnt
                FROM ev_topn GROUP BY 1, 2, 3)
        ) WHERE rownum <= 2
    """)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    assert got.count() > 0


def test_grouped_agg_udaf(spark, sf_dir):
    """Pandas UDAF: geometric mean per event_type equals the built-in
    exp(avg(ln)) identity, and the registered name works in SQL."""
    import math

    from flink_playground_spark.functions.udfs import geo_mean
    from flink_playground_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    got = {
        r["event_type"]: r["g"]
        for r in ev.groupBy("event_type").agg(geo_mean("value").alias("g")).collect()
    }
    want = {
        r["event_type"]: r["g"]
        for r in ev.groupBy("event_type")
        .agg(F.exp(F.avg(F.log("value"))).alias("g"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9), k

    spark.udf.register("geo_mean", geo_mean)
    ev.createOrReplaceTempView("ev_udaf")
    sql_rows = spark.sql(
        "SELECT event_type, geo_mean(value) AS g FROM ev_udaf GROUP BY event_type"
    ).collect()
    assert {r["event_type"]: r["g"] for r in sql_rows} == got
