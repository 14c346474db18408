"""Distributed connected components over an edge DataFrame.

The missing last step of every near-duplicate pipeline: pair detection
(MinHash/LSH, SimHash, n-gram Jaccard — functions/dedupe.py) emits
*edges*; deduplication needs *clusters* (one canonical document per
connected component). The reference corpus has no graph operator — this
is part of the training-data-pipeline extension surface.

Algorithm: min-label propagation with pointer doubling, the standard
O(log n)-round MapReduce formulation (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14 — the alternating-star
family; label-propagation-with-doubling converges in the same round
bound for the star-shaped outputs we produce):

per round
  1. neighbor-min:   comp(u) <- min(comp(u), min_{v in N(u)} comp(v))
  2. pointer jump:   comp(u) <- min(comp(u), comp(comp(u)))

Step 2 is the doubling: a chain of length L converges in O(log L)
rounds instead of O(L). Every round is two shuffle joins plus an
aggregate — all DataFrame ops, map-side-combined mins, no driver-side
graph state. Lineage is truncated per round with ``localCheckpoint``
(eager) so the iterative plan does not grow unboundedly — the property
that matters for a 100 TB run where one round's plan must not replay
every previous round's shuffles.

Convergence is detected distributedly (count of changed labels == 0);
the driver never holds nodes or edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    stats: dict | None = None,
) -> DataFrame:
    """Return ``(node, component)`` where component is the minimum node id
    reachable from ``node`` in the undirected graph given by ``edges``.

    Node ids may be any orderable type (long, string). NULL-keyed edges
    are dropped (a NULL endpoint identifies nothing). Only nodes that
    appear in ``edges`` are returned — callers union isolated nodes as
    their own singleton components if needed.

    ``stats``, if provided, receives ``{"iterations": n}`` on return.
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).filter(
        F.col("u").isNotNull() & F.col("v").isNotNull() & (F.col("u") != F.col("v"))
    )
    # undirected: keep both directions so one groupBy(u) sees the full
    # neighborhood of every node
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    # fused round 0: with identity labels, the first neighbor-min step is
    # just min(u, min neighbor) — one aggregate over sym instead of a full
    # join round (saves two joins + a convergence check per run)
    comp = sym.groupBy("u").agg(
        F.least(F.col("u"), F.min("v")).alias("comp")
    ).select(F.col("u").alias("node"), "comp")
    comp = comp.localCheckpoint(eager=True)

    rounds = 0
    for rounds in range(1, max_iter + 1):
        # 1. neighbor-min: smallest component label among my neighbors
        nbr = (
            sym.join(comp, sym.v == comp.node, "inner")
            .groupBy("u")
            .agg(F.min("comp").alias("nbr_comp"))
        )
        stepped = (
            comp.join(nbr, comp.node == nbr.u, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.col("nbr_comp")).alias("comp"),
                F.col("comp").alias("prev"),
            )
        )
        # 2. pointer jump: comp(u) <- comp(comp(u)); every label IS a node
        # id, so the mapping lives in the same relation
        ptr = stepped.select(F.col("node").alias("pnode"), F.col("comp").alias("pcomp"))
        jumped = (
            stepped.join(ptr, stepped.comp == ptr.pnode, "left")
            .select(
                "node",
                F.least(F.col("comp"), F.col("pcomp")).alias("comp"),
                "prev",
            )
        )
        jumped = jumped.localCheckpoint(eager=True)
        changed = jumped.filter(F.col("comp") != F.col("prev")).limit(1).count()
        comp = jumped.select("node", "comp")
        if changed == 0:
            break

    if stats is not None:
        stats["iterations"] = rounds
    return comp


def duplicate_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """Near-duplicate pairs -> duplicate clusters with a canonical member.

    Returns ``(doc_id, cluster_id, cluster_size, is_canonical)`` for every
    document that appears in at least one pair; ``cluster_id`` is the
    minimum doc id of the component (the canonical survivor — the
    deterministic keep-one rule), ``is_canonical`` marks it. A dedup
    pipeline anti-joins the corpus against the non-canonical rows.
    """
    comp = connected_components(pairs, id_a, id_b, max_iter=max_iter)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "comp")
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("cluster_id"),
            "cluster_size",
            (F.col("node") == F.col("comp")).alias("is_canonical"),
        )
    )
