"""Plan-layer tests: executable JSON query specs (T7/E3) and plan-quality
assertions — the properties that matter at 100 TB (pushdown, broadcast,
shuffle counts, codegen), checked against the actual physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_playground_spark.operators.dedup import dedup_latest
from flink_playground_spark.operators.temporal import as_of_join
from flink_playground_spark.plans.spec import QuerySpec, compile_plan, explain_str
from flink_playground_spark.queries import REGISTRY


def _q(name):
    """Query lookup across both registries — driver-gate rotation moves
    entries between them (r9 moved the long-green TPC-H rows to extras)
    without changing what these plan assertions pin."""
    from flink_playground_spark.queries import EXTRA_REGISTRY

    return {**REGISTRY, **EXTRA_REGISTRY}[name]

from flink_playground_spark.sources.tables import load_table

FLAGSHIP_SPEC = QuerySpec(
    ops=[
        {"op": "scan", "table": "customer"},
        {
            "op": "join",
            "right": {
                "ops": [
                    {"op": "scan", "table": "events"},
                    {"op": "dedup_latest", "keys": ["user_id"], "order": "ts", "tiebreakers": ["event_id"]},
                ]
            },
            "on": "c_custkey = user_id",
            "how": "left_outer",
        },
        {
            "op": "select",
            "exprs": [
                "c_custkey",
                "c_name",
                "event_type AS last_event_type",
                "value AS last_value",
                "ts AS last_ts",
            ],
        },
    ]
)


def test_query_spec_roundtrip_executes(spark, sf_dir):
    """CompiledPlan parity: serialize → deserialize → execute → same result
    as the hand-built flagship query."""
    restored = QuerySpec.from_json(FLAGSHIP_SPEC.to_json())
    got = restored.build(spark, sf_dir)
    want = REGISTRY["flagship_dedup_join"].spark_fn(spark, sf_dir)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_compile_plan_snapshot(spark, sf_dir):
    df = _q("q1_pricing_summary").spark_fn(spark, sf_dir)
    snap = compile_plan(df)
    assert snap["schema"]["type"] == "struct"
    assert "HashAggregate" in snap["physical"]


def test_filter_and_column_pushdown(spark, sf_dir):
    """Predicates and the projected column set must reach the parquet scan."""
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = _q("proj_filter_arith").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert "PushedFilters" in plan and "l_shipdate" in plan.split("PushedFilters")[1][:500]
    read_schema = plan.split("ReadSchema")[1][:500]
    assert "l_returnflag" in read_schema
    assert "l_tax" not in read_schema  # untouched column pruned from the scan


def test_small_dims_broadcast(spark, sf_dir):
    df = _q("join_multiway").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_is_single_shuffle(spark, sf_dir):
    """struct_max dedup = one Exchange, map-side partial combine."""
    events = load_table(spark, sf_dir, "events")
    df = dedup_latest(events, "user_id", "ts", tiebreakers=("event_id",))
    plan = explain_str(df, "physical")
    assert plan.count("Exchange") == 1
    assert "partial_max" in plan


def test_as_of_join_is_single_shuffle_no_explosion(spark, sf_dir):
    """Union-sort as-of join: exactly one Exchange (on the key), one Sort,
    zero Join nodes — no version-explosion join."""
    events = load_table(spark, sf_dir, "events")
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"), "user_id", F.col("ts").alias("cts")
    )
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts", "value")
    df = as_of_join(clicks, purchases, [("user_id", "user_id")], "cts", "ts")
    plan = explain_str(df, "physical")
    assert plan.count("Exchange") == 1
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_q1_two_level_exact_integer_aggregation(spark, sf_dir):
    """The headline agg's heavy pass must run as LONG sums (primitive
    codegen), collapse map-side to one row per (partition, group), and
    leave decimal math to the tiny partials stage — two hash exchanges,
    both carrying only partial rows, never lineitem."""
    df = _q("q1_pricing_summary").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert "partial_sum" in plan
    assert plan.count("Exchange hashpartitioning") == 2
    # the per-row pass must NOT sum decimals — decimal appears only in
    # the second-stage aggregate over partials
    first_agg = plan.split("Exchange hashpartitioning")[-1]  # innermost stage
    assert "decimal" not in first_agg.split("HashAggregate")[-1].lower()


def test_q5_fact_never_shuffles_for_joins(spark, sf_dir):
    """Six-way join: every dim side broadcasts; the only hash shuffle is
    the final aggregation — the fact table streams through the joins."""
    df = _q("q5_local_supplier_volume").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4
    assert plan.count("Exchange hashpartitioning") == 1


def test_q18_big_tables_never_shuffle_for_joins(spark, sf_dir):
    """Q18 shape: lineitem shuffles ONCE (the per-order agg); the
    qualifying-order set broadcasts to orders and customer, and the
    top-100 runs as TakeOrderedAndProject, not a full sort."""
    df = _q("q18_large_volume_customer").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # lineitem agg only
    assert "TakeOrderedAndProject" in plan


def test_corpus_clean_pipeline_two_shuffles(spark, sf_dir):
    """C4-style cleaning: stats + filter are scan-local; the only
    shuffles are the fingerprint dedup and the final (lang, split) agg,
    both with map-side partial aggregation."""
    df = REGISTRY["corpus_clean_pipeline"].spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    assert plan.count("Exchange hashpartitioning") == 2
    assert "partial_min" in plan or "partial_count" in plan


def test_brute_force_topk_no_full_corpus_window(spark, sf_dir):
    """Two-level top-k: the global per-query rank must run AFTER the
    salted local prune — the plan's second window sees at most k·n_salt
    rows per query, so no partition holds a query's full corpus scores."""
    df = _q("cosine_topk").spark_fn(spark, sf_dir)
    plan = explain_str(df, "physical")
    # two Window nodes: salted local rank, then global re-rank
    assert plan.count("RunningWindowFunction") + plan.count("Window") >= 2
    # the first (local) partitioning includes the salt expression
    assert "pmod" in plan or "hash" in plan


@pytest.mark.parametrize("name", ["q11_important_parts", "q15_top_supplier"])
def test_scalar_threshold_reuses_agg_exchange(spark, sf_dir, name):
    """q11/q15's scalar threshold consumes the same per-group aggregate
    as the filter branch; under AQE the identical group-by Exchange must
    be computed once (ReusedExchange), i.e. one real fact pass, not two."""
    from flink_playground_spark.queries import EXTRA_REGISTRY

    df = _q(name).spark_fn(spark, sf_dir)
    df.collect()  # AQE reuse materializes in the final adaptive plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in plan


def test_q21_single_fact_pass(spark, sf_dir):
    """The EXISTS/NOT-EXISTS decorrelation must not re-scan the fact
    table: one lineitem scan, per-order logic as windows over one
    order-key shuffle."""
    from flink_playground_spark.queries import EXTRA_REGISTRY

    df = _q("q21_waiting_supplier").spark_fn(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1


def test_runtime_bloom_filter_prunes_before_shuffle(spark, sf_dir):
    """The 100 TB shuffled-join lever: when one side of a shuffle join is
    selective, Catalyst builds a Bloom filter over its join keys and
    injects might_contain into the other side's scan stage — probe rows
    that cannot match die before the shuffle. Size thresholds are left
    at cluster defaults in the engine; here they are lowered so the
    rewrite fires on test data and the plan shape can be asserted."""
    from flink_playground_spark.session import tune

    tune(spark)
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
        # force a shuffled join; broadcast joins get DPP/filter pushdown instead
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy("o_orderpriority").count()
        plan = explain_str(j, "formatted")
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
        # and the result is identical with the filter injected
        assert j.collect()[0]["count"] > 0
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_scd2_build_single_exchange(spark, sf_dir):
    """scd2_build's three window frames (tie-dedup, change detection,
    close-out) share one partitioning and sort: exactly ONE Exchange and
    ONE Sort in the physical plan."""
    import re

    from flink_playground_spark.operators.scd import scd2_build

    events = load_table(spark, sf_dir, "events")
    dim_src = events.filter(F.col("event_type").isin("signup", "purchase")).select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    scd = scd2_build(dim_src, ["user_id"], "ts", ["state"], tiebreaker="event_id")
    plan = explain_str(scd, "physical")
    assert len(re.findall(r"Exchange", plan)) == 1, plan
    assert len(re.findall(r"\bSort \[", plan)) == 1, plan


def test_aqe_splits_skewed_join_partition(spark, sf_dir):
    """The AQE skew lever actually fires: a join with one hot key (~85%
    of the fact side) executes with OptimizeSkewedJoin splitting the hot
    partition — visible as skew=true in the final adaptive plan."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        # thresholds low enough that sf0.01-scale skew trips them
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force shuffle join
        # AQE can only split a skewed reduce partition along MAP-output
        # boundaries: a single-file scan yields one map task, whose hot
        # partition is one indivisible block. Real tables have many input
        # splits; the repartition stands in for that.
        li = load_table(spark, sf_dir, "lineitem").repartition(16)
        # one hot key: ~85% of rows collapse onto suppkey 1
        facts = li.select(
            F.when(F.pmod(F.col("l_orderkey"), F.lit(100)) < 85, F.lit(1))
            .otherwise(F.col("l_suppkey"))
            .alias("k"),
            "l_quantity",
            "l_extendedprice",
            "l_discount",
            "l_tax",
        )
        dim = load_table(spark, sf_dir, "supplier").select(
            F.col("s_suppkey").alias("k"), "s_name"
        )
        j = facts.join(dim, "k")
        assert len(j.collect()) > 0  # execute THIS plan so AQE finalizes it
        final = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final, final[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def _walk_plan(node):
    """Preorder traversal of a physical plan via py4j, descending into
    the AQE wrapper and plan subqueries (where Spark parks the scalar-
    subquery BNLJs)."""
    yield node
    if node.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
        yield from _walk_plan(node.initialPlan())
        return
    ch = node.children()
    for i in range(ch.size()):
        yield from _walk_plan(ch.apply(i))
    # LOUD on purpose: a throwing subqueries() accessor would hide a
    # CartesianProduct parked inside a scalar subquery. The blanket
    # guard's per-query try records the failure in `unplannable`, which
    # is asserted empty — a walk failure is a red test, never a skip.
    sq = node.subqueries()
    for i in range(sq.size()):
        yield from _walk_plan(sq.apply(i))


def _build_side_is_constant(build) -> bool:
    """STRUCTURAL proof that a BNLJ build side is constant-size: walking
    top-down, the first row-bounding node is either a Limit (explicitly
    declared bound) or an Aggregate with NO grouping keys (exactly one
    row). Either way the build side cannot grow with the corpus, so the
    nested loop is the scalar-broadcast plan Spark itself emits for
    scalar subqueries — never a corpus-by-corpus loop. A keyed
    aggregate, or a plain scan, proves nothing (its cardinality follows
    the data) and must be reviewed into the allowlist instead."""
    for b in _walk_plan(build):
        name = b.getClass().getSimpleName()
        if "Limit" in name:
            return True
        if "Aggregate" in name:
            return "keys=[]" in b.simpleString(20)
    return False


def test_no_nested_loop_or_cartesian_anywhere(spark, sf_dir):
    """Blanket guard over EVERY batch registry query: no CartesianProduct
    anywhere, and every BroadcastNestedLoopJoin must have a build side
    that is STRUCTURALLY constant-size (first bounding node top-down is
    a Limit or a grouping-key-free Aggregate — see
    ``_build_side_is_constant``) or be individually reviewed into the
    small allowlist below. Catches the classic silent regression where
    an equi-join degrades to a nested loop after a refactor — without a
    per-query integer census that goes stale on every plan change
    (rounds 4 AND 5 both shipped red because of exactly that)."""
    from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

    # Shapes the structural rule cannot prove, each REVIEWED — the bound
    # exists but lives in the data/query contract, not the plan:
    allowed_unproven = {
        # brute-force probe set: filter(vec_id < 8) scan — ≤8 rows by the
        # query contract; the plan sees only an unbounded-looking Filter.
        "cosine_topk": 1,
        # ADC query table: per-query LUT aggregate keyed by query_id over
        # the ≤8-row probe set (functions/similarity.py pq_topk).
        "ann_pq_topk": 1,
        # same pq_adc_topk shape serving the streaming PQ index: the
        # broadcast build side is the per-query dense LUT keyed by
        # query_id — bounded by the ≤8-row probe contract
        # (streaming/pq_index.py query()), invisible to the plan.
        "streaming_ann_pq_topk": 1,
        # per-user profile vectors: keyed aggregate over the bounded
        # active-user panel (≤ distinct user_id; the query caps its probe
        # side to 5 users before the cross-score).
        "activity_profile_similarity": 1,
        # per-source corpus signatures: keyed aggregate over the ~20
        # distinct sources — cardinality is the source vocabulary, not
        # the corpus.
        "corpus_similarity": 1,
        "streaming_corpus_similarity": 1,
        # ann_recall_report composes the three reviewed shapes above in
        # one plan: the brute-force probe broadcast (cosine_topk's ≤8-row
        # probe contract), the flat-PQ per-query LUT (ann_pq_topk's), and
        # the IVFADC probe-table join (same ≤8-row probe set) — each
        # bound lives in the vec_id < 8 query contract, not the plan.
        "ann_recall_report": 3,
    }
    # Entries allowed to fail PLANNING itself, each with a written
    # reason. Currently EMPTY: every registry entry (including the
    # eager streaming ones, which materialize inside spark_fn and
    # return a plannable result DF) plans cleanly at sf0.001. A query
    # that starts throwing at plan time must NOT silently leave the
    # guard's coverage (round 6's NameError queries would have been
    # skipped, not flagged) — it either gets fixed or gets a reviewed
    # entry here.
    allowed_unplannable: set[str] = set()
    unplannable = {}
    bad = {}
    for name, q in {**REGISTRY, **EXTRA_REGISTRY}.items():
        try:
            df = q.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan()
            nodes = list(_walk_plan(plan))
        except Exception as e:
            if name not in allowed_unplannable:
                unplannable[name] = f"{type(e).__name__}: {e}"[:200]
            continue
        unproven = 0
        cart = 0
        for n in nodes:
            cls = n.getClass().getSimpleName()
            if "CartesianProduct" in cls:
                cart += 1
            elif "BroadcastNestedLoopJoin" in cls:
                build = (
                    n.left()
                    if n.buildSide().toString() == "BuildLeft"
                    else n.right()
                )
                if not _build_side_is_constant(build):
                    unproven += 1
        if cart or unproven > allowed_unproven.get(name, 0):
            bad[name] = {"unproven_bnlj": unproven, "cartesian": cart}
    assert not unplannable, (
        f"registry queries crashed at plan time (guard coverage lost): {unplannable}"
    )
    assert not bad, f"nested-loop/cartesian joins appeared: {bad}"


def test_query_spec_new_ops_roundtrip(spark, sf_dir):
    """Round-3 spec ops (interval_join, sessionize_dynamic,
    resample_locf, tumble offset) execute from persisted JSON and match
    the direct operator calls."""
    import datetime as dt

    from flink_playground_spark.operators.interval import interval_join
    from flink_playground_spark.sources.tables import load_table

    spec = QuerySpec(
        ops=[
            {"op": "scan", "table": "events"},
            {"op": "filter", "expr": "event_type = 'click'"},
            {"op": "select", "exprs": ["event_id AS click_id", "user_id", "ts AS click_ts"]},
            {
                "op": "interval_join",
                "right": {
                    "ops": [
                        {"op": "scan", "table": "events"},
                        {"op": "filter", "expr": "event_type = 'error'"},
                        {"op": "select", "exprs": ["event_id AS err_id", "user_id AS e_user_id", "ts AS err_ts"]},
                    ]
                },
                "on": [["user_id", "e_user_id"]],
                "left_time": "click_ts",
                "right_time": "err_ts",
                "lower": 0,
                "upper": 1800,
            },
            {"op": "select", "exprs": ["click_id", "err_id"]},
        ]
    )
    restored = QuerySpec.from_json(spec.to_json())
    got = {(r.click_id, r.err_id) for r in restored.build(spark, sf_dir).collect()}

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", F.col("ts").alias("click_ts")
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("err_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("err_ts"),
    )
    direct = interval_join(
        clicks, errors, [("user_id", "e_user_id")], "click_ts", "err_ts", 0, 1800
    )
    want = {(r.click_id, r.err_id) for r in direct.select("click_id", "err_id").collect()}
    assert got == want and got

    sess_spec = QuerySpec(
        ops=[
            {"op": "scan", "table": "events"},
            {
                "op": "sessionize_dynamic",
                "keys": ["user_id"],
                "time": "ts",
                "gap_expr": "CASE WHEN event_type IN ('purchase','signup') THEN 7200.0 ELSE 1800.0 END",
                "tiebreakers": ["event_id"],
            },
            {"op": "select", "exprs": ["event_id", "session_id"]},
        ]
    )
    n = QuerySpec.from_json(sess_spec.to_json()).build(spark, sf_dir).count()
    assert n == load_table(spark, sf_dir, "events").count()


def test_iterative_trainers_scan_cached_input_per_round(spark, sf_dir, monkeypatch):
    """k-means, PQ training, and the quality classifier persist their
    scanned input across iteration rounds: the per-round plan must read
    from the cache (InMemoryTableScan/InMemoryRelation), not re-scan
    parquet every Lloyd/gradient round."""
    import flink_playground_spark.functions.classifier as clf
    import flink_playground_spark.functions.similarity as sim
    from flink_playground_spark.queries import EXTRA_REGISTRY

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    def cached(df):
        return "InMemory" in df._jdf.queryExecution().executedPlan().toString()

    kmeans_inputs = []
    orig_assign = sim.ivf_assign
    monkeypatch.setattr(
        sim,
        "ivf_assign",
        lambda df, cents, *a, **kw: (kmeans_inputs.append(cached(df)), orig_assign(df, cents, *a, **kw))[1],
    )
    # the r9/r10 memos would satisfy a repeat build without any Lloyd
    # round — clear them so this test observes the actual per-round scans
    sim._KMEANS_MEMO.clear()
    sim._PQ_TRAIN_MEMO.clear()
    sim.kmeans_centroids(emb, iters=2)
    assert kmeans_inputs == [True, True]

    pq_inputs = []
    orig_pq = sim._pq_assign
    monkeypatch.setattr(
        sim,
        "_pq_assign",
        lambda subs, book, sub_len: (pq_inputs.append(cached(subs)), orig_pq(subs, book, sub_len))[1],
    )
    sim.pq_train(emb, iters=2)
    assert len(pq_inputs) >= 2 and all(pq_inputs)

    clf_inputs = []
    orig_train = clf.train_logreg
    monkeypatch.setattr(
        clf,
        "train_logreg",
        lambda df, *a, **kw: (clf_inputs.append(cached(df)), orig_train(df, *a, **kw))[1],
    )
    _q("quality_classifier").spark_fn(spark, sf_dir).write.mode(
        "overwrite"
    ).format("noop").save()
    assert clf_inputs == [True]
