from __future__ import annotations

from datetime import datetime

from flink_playground_spark.engine import EngineSession
from flink_playground_spark.operators.relational import col


def test_engine_session_end_to_end(spark):
    env = EngineSession(spark)
    people = env.from_collection(
        [("Alice", "a"), ("Bob", "b"), ("Paul", "z")], ["name", "country"], [str, str]
    )
    countries = env.from_collection(
        [
            ("a", "old", datetime(2024, 1, 1)),
            ("a", "new", datetime(2024, 1, 2)),
            ("b", "cap", datetime(2024, 1, 1)),
        ],
        ["iso", "capital", "ts"],
        [str, str, "timestamp_ntz"],
    )
    env.create_temporal_table_function("enrich", countries, "ts", "iso")

    joined = env.temporal_join(people, "enrich", [("country", "iso")], how="left")
    got = {(r.name, r.capital) for r in joined.collect()}
    assert got == {("Alice", "new"), ("Bob", "cap"), ("Paul", None)}

    snap = {(r.iso, r.capital) for r in env.snapshot("enrich").collect()}
    assert snap == {("a", "new"), ("b", "cap")}

    env.create_temporary_view("people_v", people)
    assert env.sql_query("SELECT count(*) AS n FROM people_v").collect()[0].n == 3

    t = env.from_("people_v").where(col("country") == "a").select("name")
    assert [r.name for r in t.df.collect()] == ["Alice"]
