"""Connected components (operators/graph.py): goldens, a union-find
reference parity check, and the pointer-doubling round bound."""

import random

from pyspark.sql import functions as F

from flink_playground_spark.operators.graph import connected_components, duplicate_clusters


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(df, "src", "dst", **kw)
    return {r["node"]: r["comp"] for r in out.collect()}


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # canonical = min member of each component
    members = {}
    for x in parent:
        members.setdefault(find(x), []).append(x)
    return {x: min(ms) for r, ms in members.items() for x in ms}


def test_two_components_and_min_label(spark):
    got = _cc(spark, [(5, 3), (3, 9), (20, 21)])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}


def test_chain_converges_in_log_rounds(spark):
    # a 65-node path is the worst case for plain label propagation
    # (64 rounds); pointer doubling must finish in O(log n).
    # local_max_edges=None forces the pure loop — the contraction pass
    # would otherwise solve the chain in zero rounds.
    n = 65
    stats = {}
    got = _cc(spark, [(i, i + 1) for i in range(n)], stats=stats, local_max_edges=None)
    assert got == {i: 0 for i in range(n + 1)}
    assert stats["strategy"] == "loop"
    assert stats["iterations"] <= 9, stats


def test_local_contraction_solves_small_graph_in_zero_rounds(spark):
    stats = {}
    got = _cc(spark, [(5, 3), (3, 9), (20, 21)], stats=stats)
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}
    assert stats["strategy"] == "local"
    assert stats["iterations"] == 0


def test_contract_plus_loop_matches_pure_loop(spark):
    # local_max_edges=2 forces many contraction partitions so the
    # cross-partition stitching loop actually runs; the result must be
    # identical to both the pure loop and the union-find reference
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(80)]
    edges = [(u, v) for u, v in edges if u != v]
    stats = {}
    got = _cc(spark, edges, stats=stats, local_max_edges=2)
    assert stats["strategy"] == "contract+loop"
    assert got == _union_find(edges)
    assert got == _cc(spark, edges, local_max_edges=None)


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    edges = [(u, v) for u, v in edges if u != v]
    got = _cc(spark, edges)
    assert got == _union_find(edges)


def test_null_and_self_edges_dropped(spark):
    df = spark.createDataFrame(
        [(1, 2), (None, 3), (4, None), (5, 5)], "src long, dst long"
    )
    out = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    # 3 and 4 only appear on NULL edges; 5 only on a self-loop
    assert out == {1: 1, 2: 1}


def test_duplicate_clusters_canonical_and_sizes(spark):
    pairs = spark.createDataFrame(
        [(10, 11), (11, 12), (30, 31)], "id_a long, id_b long"
    )
    rows = {
        r["doc_id"]: (r["cluster_id"], r["cluster_size"], r["is_canonical"])
        for r in duplicate_clusters(pairs).collect()
    }
    assert rows == {
        10: (10, 3, True),
        11: (10, 3, False),
        12: (10, 3, False),
        30: (30, 2, True),
        31: (30, 2, False),
    }


def test_string_node_ids(spark):
    df = spark.createDataFrame([("b", "c"), ("a", "b")], "src string, dst string")
    out = {r["node"]: r["comp"] for r in connected_components(df).collect()}
    assert out == {"a": "a", "b": "a", "c": "a"}


def test_fixed_point_pagerank_matches_python_and_is_deterministic(spark):
    """Integer fixed-point power iteration == a pure-Python replica on a
    small graph (star + path + isolated pair); two runs identical."""
    from flink_playground_spark.operators.graph import PR_UNIT, pagerank

    edges = [(0, 1), (0, 2), (0, 3), (3, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")

    adj = {}
    for u, v in edges:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    nodes = sorted(adj)
    base = PR_UNIT * 15 // 100
    pr = {v: PR_UNIT for v in nodes}
    for _ in range(10):
        inflow = dict.fromkeys(nodes, 0)
        for u in nodes:
            c = pr[u] // len(adj[u])
            for v in adj[u]:
                inflow[v] += c
        pr = {v: base + (inflow[v] * 85) // 100 for v in nodes}

    got = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert got == pr
    assert got[0] > got[1]  # the star center out-ranks its leaves
    again = {r["node"]: r["rank"] for r in pagerank(df).collect()}
    assert again == got
