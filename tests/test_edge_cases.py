"""Edge cases: empty inputs, null keys, degenerate groups — operators
must degrade gracefully, not throw."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from flink_playground_spark.functions.dedupe import minhash_lsh_pairs, ngram_jaccard_pairs
from flink_playground_spark.functions.text import lang_id, quality_score, token_count
from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.operators.temporal import as_of_join, temporal_join
from flink_playground_spark.operators.unnest import unnest_outer
from flink_playground_spark.operators.windows import sessionize, tumble_agg
from flink_playground_spark.sources.memory import from_rows


def _empty(spark, ddl):
    return spark.createDataFrame([], ddl)


def test_dedup_empty_and_single(spark):
    empty = _empty(spark, "k string, ts timestamp_ntz, v int")
    assert dedup_latest(empty, "k", "ts").count() == 0
    one = from_rows(spark, [("a", datetime(2024, 1, 1), 1)], ["k", "ts", "v"], [str, "timestamp_ntz", int])
    assert dedup_latest(one, "k", "ts").count() == 1


def test_dedup_null_keys_form_their_own_group(spark):
    df = from_rows(
        spark,
        [(None, datetime(2024, 1, 1), 1), (None, datetime(2024, 1, 2), 2), ("a", datetime(2024, 1, 1), 3)],
        ["k", "ts", "v"],
        [str, "timestamp_ntz", int],
    )
    out = {(r.k, r.v) for r in dedup_latest(df, "k", "ts").collect()}
    assert out == {(None, 2), ("a", 3)}  # groupBy treats NULL as a key


def test_as_of_join_empty_right(spark):
    left = from_rows(spark, [("a", datetime(2024, 1, 1))], ["k", "lts"], [str, "timestamp_ntz"])
    right = _empty(spark, "k string, rts timestamp_ntz, v int")
    out = as_of_join(left, right, ["k"], "lts", "rts", how="left").collect()
    assert len(out) == 1 and out[0].v is None
    assert as_of_join(left, right, ["k"], "lts", "rts", how="inner").count() == 0


def test_as_of_join_null_keys_never_match(spark):
    """SQL join semantics: a NULL key matches nothing — not even a
    NULL-keyed version row. Both strategies must agree (ADVICE r1)."""
    left = from_rows(
        spark,
        [(1, None, datetime(2024, 1, 5)), (2, "a", datetime(2024, 1, 5))],
        ["id", "k", "lts"],
        [int, str, "timestamp_ntz"],
    )
    right = from_rows(
        spark,
        [(None, datetime(2024, 1, 1), 10), ("a", datetime(2024, 1, 2), 20)],
        ["k", "rts", "v"],
        [str, "timestamp_ntz", int],
    )
    for kwargs in (
        {"strategy": "union_sort"},
        {"strategy": "broadcast", "left_id": "id"},
    ):
        out = {
            (r.id, r.v)
            for r in as_of_join(left, right, ["k"], "lts", "rts", how="left", **kwargs).collect()
        }
        assert out == {(1, None), (2, 20)}, kwargs
        inner = {
            (r.id, r.v)
            for r in as_of_join(left, right, ["k"], "lts", "rts", how="inner", **kwargs).collect()
        }
        assert inner == {(2, 20)}, kwargs


def test_temporal_join_empty_dim(spark):
    left = from_rows(spark, [("a", 1)], ["k", "x"], [str, int])
    dim = _empty(spark, "k string, ts timestamp_ntz, payload string")
    assert temporal_join(left, dim, ["k"], "ts", how="left").count() == 1
    assert temporal_join(left, dim, ["k"], "ts", how="inner").count() == 0


def test_unnest_outer_null_array(spark):
    df = from_rows(spark, [("a", None), ("b", [("x",)])], ["id", "items"], [str, "array<struct<item_id:string>>"])
    got = {(r.id, r.item_id) for r in unnest_outer(df, "items").collect()}
    assert got == {("a", None), ("b", "x")}


def test_tumble_agg_empty(spark):
    empty = _empty(spark, "k string, ts timestamp_ntz")
    assert tumble_agg(empty, "ts", "1 hour", ["k"], [F.count(F.lit(1)).alias("c")]).count() == 0


def test_sessionize_single_event_per_user(spark):
    df = from_rows(
        spark,
        [("u1", datetime(2024, 1, 1, 10)), ("u2", datetime(2024, 1, 1, 11))],
        ["u", "ts"],
        [str, "timestamp_ntz"],
    )
    out = sessionize(df, ["u"], "ts").collect()
    assert all(r.session_id == 1 for r in out)


def test_text_functions_on_empty_and_punct_only(spark):
    df = from_rows(spark, [(1, ""), (2, "!!! ???"), (3, "word")], ["i", "text"], [int, str])
    out = df.select(
        "i",
        token_count("text").alias("n"),
        quality_score("text").alias("q"),
        lang_id("text").alias("lang"),
    ).collect()
    by_id = {r.i: r for r in out}
    assert by_id[1].n == 0 and by_id[2].n == 0 and by_id[3].n == 1
    assert by_id[1].lang == "und" and by_id[2].lang == "und"
    assert all(r.q is not None for r in out)  # no division-by-zero NULLs


def test_neardup_on_empty_docs(spark):
    df = from_rows(spark, [(1, ""), (2, "a b")], ["doc_id", "text"], [int, str])
    assert ngram_jaccard_pairs(df, "doc_id", "text").count() == 0
    assert minhash_lsh_pairs(df, "doc_id", "text").count() == 0
