"""Similarity search over embedding columns (array<float>).

- ``cosine``: built-in higher-order functions (zip_with + aggregate),
  double math, JVM-side — no UDF.
- ``brute_force_topk``: exact baseline — broadcast the (small) query set,
  score every corpus vector, rank per query. One broadcast join + one
  shuffle for the per-query top-k window.
- ``lsh_topk``: random-hyperplane LSH scale path — deterministic
  hyperplanes derived from xxhash64, candidates = bucket collisions
  (multi-probe via several tables), exact re-scoring of candidates only.
  At 100 TB the bucket join replaces the full cross product.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_fixed(a: Column, b: Column, dim: int) -> Column:
    """``dot`` unrolled for a statically-known vector length.

    ``aggregate``/``zip_with`` lambdas run on Catalyst's expression
    interpreter — per-element virtual calls, no codegen. When ``dim`` is
    known (every embedding table has one), the same left-associative sum
    ``((0.0 + a0*b0) + a1*b1) + ...`` can be emitted as a plain
    arithmetic chain that whole-stage codegen compiles to straight-line
    JVM bytecode. Bit-identical to ``dot`` (same seed, same operand
    order, same double ops) — only the execution engine differs.
    """
    acc: Column = F.lit(0.0)
    for i in range(dim):
        acc = acc + a[i].cast("double") * b[i].cast("double")
    return acc


def norm_fixed(a: Column, dim: int) -> Column:
    """``norm`` unrolled for a statically-known vector length (see
    ``dot_fixed``); bit-identical to ``norm``."""
    acc: Column = F.lit(0.0)
    for i in range(dim):
        x = a[i].cast("double")
        acc = acc + x * x
    return F.sqrt(acc)


def cosine_fixed(a: Column, b: Column, dim: int) -> Column:
    """``cosine`` with all three folds unrolled (codegen path); bit-
    identical to ``cosine`` for vectors of length ``dim``."""
    return dot_fixed(a, b, dim) / (norm_fixed(a, dim) * norm_fixed(b, dim))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_salt: int = 32,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, sim (rounded to 6), rank.

    Two-level rank: corpus scores first rank inside ``(query_id, salt)``
    groups (salt = hash(neighbor_id) % n_salt), keeping ≤ k per group,
    then the survivors (≤ k·n_salt rows per query) re-rank globally.
    A query's global top-k rows are each top-k within their salt group,
    so the result is identical to the single-window rank — but no single
    partition ever holds a query's full corpus scores, removing the
    per-query funnel that capped scale-out when the corpus grows.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    order = [F.desc("sim"), F.asc("neighbor_id")]
    local_w = Window.partitionBy(
        "query_id", F.pmod(F.xxhash64("neighbor_id"), F.lit(n_salt))
    ).orderBy(*order)
    pruned = (
        scored.withColumn("lrank", F.row_number().over(local_w))
        .filter(F.col("lrank") <= k)
        .drop("lrank")
    )
    w = Window.partitionBy("query_id").orderBy(*order)
    return pruned.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
    keep_sim: bool = False,
) -> DataFrame:
    """IVF cell assignment: each vector joins its ``nprobe`` nearest
    centroids (by cosine). Centroids are broadcast (they are few); the
    per-vector argmax is a rank window over (vector, centroid) scores —
    fully codegen'd, one pass over the data. ``keep_sim`` also returns
    the vector↔centroid cosine (``csim``) — the fit signal the streaming
    index's drift monitor aggregates."""
    c = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("cvec"))
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    scored = v.join(F.broadcast(c)).withColumn("csim", cosine(F.col("vec"), F.col("cvec")))
    w = Window.partitionBy("vid").orderBy(F.desc("csim"), F.asc("centroid_id"))
    keep = ["vid", "vec", "centroid_id"] + (["csim"] if keep_sim else [])
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select(*keep)
    )


def kmeans_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Lloyd's k-means as pure DataFrame aggregations (no UDF, no driver
    math): seed = the first ``n_centroids`` corpus vectors (deterministic),
    then ``iters`` rounds of assign-to-nearest (broadcast centroids, rank
    window) and recompute-mean (posexplode → per-(centroid, dim) mean →
    array_sort rebuild). Each round is one corpus scan + one shuffle on
    (centroid_id, pos) — the textbook distributed k-means layout. A cell
    that loses all members drops out (its id simply stops matching).

    The per-dim mean sums components as DECIMAL (exact, so the sum — and
    therefore every centroid, assignment, and downstream similarity — is
    independent of partitioning/aggregation order; a double sum is not),
    then divides in double. Determinism costs nothing measurable here
    (k×dim aggregates) and makes the whole IVF construction replicable
    by the Python reference oracle (functions/reference.py)."""
    cents = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    for _ in range(iters):
        assign = ivf_assign(corpus, cents, id_col, vec_col, nprobe=1)
        exploded = assign.select(
            "centroid_id", F.posexplode(F.col("vec")).alias("pos", "val")
        )
        means = exploded.groupBy("centroid_id", "pos").agg(
            (
                F.sum(F.col("val").cast("double").cast("decimal(30,12)")).cast("double")
                / F.count(F.lit(1))
            ).alias("m")
        )
        cents = (
            means.groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select(
                "centroid_id",
                F.transform(F.col("pm"), lambda s: s["m"]).alias(vec_col),
            )
        )
        # small (n_centroids × dim): materialize so each round's plan
        # doesn't re-run every previous round's corpus scan
        cents = cents.localCheckpoint(eager=True)
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned
    to their nearest centroid cell (centroids = deterministic seed
    refined by ``kmeans_iters`` Lloyd iterations, see
    ``kmeans_centroids``); queries probe their ``nprobe`` nearest cells
    and score only those cells' members. The cell join replaces the full
    cross product — the classic IVF pruning."""
    centroids = kmeans_centroids(corpus, id_col, vec_col, n_centroids, kmeans_iters)
    cells = ivf_assign(corpus, centroids, id_col, vec_col, nprobe=1)
    probes = ivf_assign(queries, centroids, id_col, vec_col, nprobe=nprobe)
    cand = (
        probes.alias("q")
        .join(
            cells.alias("c"),
            (F.col("q.centroid_id") == F.col("c.centroid_id")) & (F.col("q.vid") != F.col("c.vid")),
        )
        .select(
            F.col("q.vid").alias("query_id"),
            F.col("c.vid").alias("neighbor_id"),
            F.col("q.vec").alias("qvec"),
            F.col("c.vec").alias("cvec"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)).select(
        "query_id", "neighbor_id", "sim"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_buckets(df: DataFrame, id_col: str, vec_col: str, tables: int = 4, planes: int = 12) -> DataFrame:
    """(id, table, bucket) rows: one bucket per hash table per vector.

    Hyperplane weights are deterministic pseudo-random values
    ``w(t,p,j) = xxhash64(t,p,j) → ±[0,1)``; the tables×planes dot
    products are computed as codegen'd conditional-sum aggregates over
    the pos-exploded vector (one shuffle on the vector id) — array
    lambdas are interpreted and much slower."""
    comp = df.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.posexplode(F.col(vec_col)).alias("j", "x"),
    )
    aggs = []
    for t in range(tables):
        for p in range(planes):
            w = (
                F.pmod(F.xxhash64(F.lit(t), F.lit(p), F.col("j")), F.lit(2_000_001)) - 1_000_000
            ) / 1_000_000.0
            aggs.append(F.sum(F.col("x").cast("double") * w).alias(f"d_{t}_{p}"))
    dots = comp.groupBy("vid").agg(F.first("vec").alias("vec"), *aggs)
    buckets = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for p in range(planes):
            bit = F.when(F.col(f"d_{t}_{p}") >= 0, F.lit(1)).otherwise(F.lit(0)).cast("long")
            bucket = F.shiftleft(bucket, 1).bitwiseOR(bit)
        buckets.append(F.struct(F.lit(t).alias("table"), bucket.alias("bucket")))
    stacked = dots.select("vid", "vec", F.explode(F.array(*buckets)).alias("tb"))
    return stacked.select("vid", "vec", "tb.table", "tb.bucket")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: int = 4,
    planes: int = 12,
) -> DataFrame:
    """Approximate top-k: candidates from LSH bucket collisions across
    `tables` hash tables, exact cosine on candidates only. Recall is
    checked against brute force in tests."""
    cb = lsh_buckets(corpus, id_col, vec_col, tables, planes)
    qb = lsh_buckets(queries, id_col, vec_col, tables, planes)
    cand = (
        qb.alias("q")
        .join(
            cb.alias("c"),
            (F.col("q.table") == F.col("c.table"))
            & (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("q.vid") != F.col("c.vid")),
        )
        .select(
            F.col("q.vid").alias("query_id"),
            F.col("c.vid").alias("neighbor_id"),
            F.col("q.vec").alias("qvec"),
            F.col("c.vec").alias("cvec"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)).select(
        "query_id", "neighbor_id", "sim"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
