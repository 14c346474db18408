"""Broadcast-state rules pattern (streaming/broadcast_rules.py):
mid-stream rule change, tombstone delete, exactly-once replays,
out-of-order control updates losing to newer state."""

from __future__ import annotations

from flink_playground_spark.streaming.broadcast_rules import BroadcastRulesEngine


def _rules(spark, rows):
    return spark.createDataFrame(
        rows,
        "rule_id string, seq long, op string, event_type string, "
        "min_value double, action string",
    )


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, value double"
    )


def test_rules_lifecycle_and_exactly_once(spark, tmp_path):
    eng = BroadcastRulesEngine(str(tmp_path / "s"))
    data = _events(
        spark,
        [
            (1, 10, "click", 50.0),
            (2, 11, "click", 5.0),
            (3, 12, "view", 80.0),
            (4, 13, "purchase", 99.0),
        ],
    )

    # before any control wave: no rules, no matches, no crash
    assert eng.process(data).count() == 0

    # wave 0: two rules; one event matches each predicate branch
    assert eng.update_rules(
        _rules(spark, [("r1", 1, "U", "click", 10.0, "flag"), ("r2", 1, "U", "view", 70.0, "sample")]),
        0,
    )
    got = {(r.event_id, r.rule_id) for r in eng.process(data).collect()}
    assert got == {(1, "r1"), (3, "r2")}  # click 5.0 under threshold; purchase unruled

    # wave 1: raise r1's bar, tombstone r2, add r3
    assert eng.update_rules(
        _rules(
            spark,
            [
                ("r1", 2, "U", "click", 60.0, "flag"),
                ("r2", 2, "D", "view", 0.0, "sample"),
                ("r3", 2, "U", "purchase", 90.0, "audit"),
            ],
        ),
        1,
    )
    got = {(r.event_id, r.rule_id, r.action) for r in eng.process(data).collect()}
    assert got == {(4, "r3", "audit")}  # click 50 < 60; r2 deleted

    # replaying a committed control wave is a no-op (returns False,
    # state unchanged — the deleted rule must NOT resurrect)
    assert not eng.update_rules(
        _rules(spark, [("r2", 1, "U", "view", 70.0, "sample")]), 0
    )
    assert {r.rule_id for r in eng.current_rules(spark).collect()} == {"r1", "r3"}

    # a LATER wave carrying a stale (lower-seq) upsert loses to the
    # tombstone: keep-latest orders by seq, not arrival
    assert eng.update_rules(_rules(spark, [("r2", 1, "U", "view", 70.0, "sample")]), 2)
    assert {r.rule_id for r in eng.current_rules(spark).collect()} == {"r1", "r3"}


def test_multi_rule_match_emits_one_row_per_rule(spark, tmp_path):
    eng = BroadcastRulesEngine(str(tmp_path / "s"))
    eng.update_rules(
        _rules(
            spark,
            [
                ("lo", 1, "U", "click", 10.0, "flag"),
                ("hi", 1, "U", "click", 40.0, "escalate"),
            ],
        ),
        0,
    )
    data = _events(spark, [(1, 10, "click", 50.0), (2, 11, "click", 20.0)])
    got = sorted((r.event_id, r.rule_id) for r in eng.process(data).collect())
    assert got == [(1, "hi"), (1, "lo"), (2, "lo")]


def test_rules_join_is_broadcast(spark, tmp_path):
    """The evaluation must broadcast the RULES side — the data wave is
    the 100 TB side and must not shuffle."""
    eng = BroadcastRulesEngine(str(tmp_path / "s"))
    eng.update_rules(_rules(spark, [("r1", 1, "U", "click", 10.0, "flag")]), 0)
    data = _events(spark, [(1, 10, "click", 50.0)])
    plan = eng.process(data)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "Exchange hashpartitioning" not in plan
