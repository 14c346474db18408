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


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: query_id, neighbor_id, sim (rounded to 6), rank.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cvec"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6))
        .select("query_id", "neighbor_id", "sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF cell assignment: each vector joins its ``nprobe`` nearest
    centroids (by cosine). Centroids are broadcast (they are few); the
    per-vector argmax is a rank window over (vector, centroid) scores —
    fully codegen'd, one pass over the data."""
    c = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("cvec"))
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    scored = v.join(F.broadcast(c)).withColumn("csim", cosine(F.col("vec"), F.col("cvec")))
    w = Window.partitionBy("vid").orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        scored.withColumn("crank", F.row_number().over(w))
        .filter(F.col("crank") <= nprobe)
        .select("vid", "vec", "centroid_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: corpus vectors are assigned
    to their nearest centroid cell (deterministic centroids: the first
    ``n_centroids`` corpus vectors — k-means would be an iterative
    refinement of the same layout); queries probe their ``nprobe``
    nearest cells and score only those cells' members. The cell join
    replaces the full cross product — the classic IVF pruning."""
    centroids = (
        corpus.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
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
