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
    centroids (by cosine). ``keep_sim`` also returns the vector↔centroid
    cosine (``csim``) — the fit signal the streaming index's drift
    monitor aggregates.

    ``nprobe=1`` (the corpus-side path — every vector in the index walks
    through here) is ZERO-SHUFFLE: the centroid table collapses to a
    one-row sorted array, broadcast-crossed into the scan, and the
    argmax folds row-locally over it. The previous rank-window plan
    shuffled corpus × n_centroids scored rows on ``vid`` just to pick a
    per-row maximum — at 100 TB that is a full-corpus exchange (with the
    float vectors in the rows!) for an embarrassingly parallel decision.
    Tie-break (max csim, then min centroid_id) and the cosine expression
    are identical to the window path, so results are bit-equal and the
    Python reference (functions/reference.py) still replicates them.

    ``nprobe>1`` is only ever applied to the (small) query/probe set, so
    the rank window over (vector, centroid) scores stays the right plan
    there."""
    c = centroids.select(F.col("centroid_id"), F.col(vec_col).alias("cvec"))
    v = df.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    keep = ["vid", "vec", "centroid_id"] + (["csim"] if keep_sim else [])
    if nprobe == 1:
        # one-row build side: the scalar-broadcast BNLJ class the plan
        # guard allowlists (constant-size, never corpus-by-corpus)
        carr = c.agg(
            F.array_sort(F.collect_list(F.struct("centroid_id", "cvec"))).alias("cents")
        )
        scored = F.transform(
            F.col("cents"),
            lambda cc: F.struct(
                cosine(F.col("vec"), cc["cvec"]).alias("csim"),
                cc["centroid_id"].alias("centroid_id"),
            ),
        )
        # fold seeded with element 1; the array is centroid_id-ASC, so
        # replace-only-on-strictly-better == (csim DESC, centroid_id ASC)
        best = F.aggregate(
            F.slice(scored, F.lit(2), F.greatest(F.size(scored) - 1, F.lit(0))),
            F.try_element_at(scored, F.lit(1)),
            lambda acc, cand: F.when(
                (cand["csim"] > acc["csim"])
                | ((cand["csim"] == acc["csim"]) & (cand["centroid_id"] < acc["centroid_id"])),
                cand,
            ).otherwise(acc),
        )
        return (
            v.crossJoin(F.broadcast(carr))
            .withColumn("b", best)
            .filter(F.col("b").isNotNull())
            .select(
                "vid",
                "vec",
                F.col("b.centroid_id").alias("centroid_id"),
                *([F.col("b.csim").alias("csim")] if keep_sim else []),
            )
        )
    scored = v.join(F.broadcast(c)).withColumn("csim", cosine(F.col("vec"), F.col("cvec")))
    w = Window.partitionBy("vid").orderBy(F.desc("csim"), F.asc("centroid_id"))
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
    # each Lloyd round re-reads the vectors: persist the projection for
    # the loop (every round's cents is eagerly materialized below, so
    # the unpersist after the loop is safe — the returned table has no
    # remaining lineage into it)
    proj = corpus.select(id_col, vec_col).persist()
    cents = (
        proj.orderBy(id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col))
    )
    for _ in range(iters):
        assign = ivf_assign(proj, cents, id_col, vec_col, nprobe=1)
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
    proj.unpersist()
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


def _sub_slices(vec_col: str, dim: int, m: int):
    """Explode helper: one struct per subspace with its slice of the
    vector. ``F.slice`` is 1-based; the result keeps the subspace id so
    all ``m`` codebooks train in ONE corpus scan per Lloyd round."""
    sub_len = dim // m
    return F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(s).alias("sub"),
                    F.slice(F.col(vec_col), s * sub_len + 1, sub_len).alias("subvec"),
                )
                for s in range(m)
            ]
        )
    )


def _l2_sq_fixed(a: Column, b: Column, n: int) -> Column:
    """Unrolled squared L2 distance (codegen chain, fixed fold order —
    replicable by the Python reference)."""
    acc: Column = F.lit(0.0)
    for i in range(n):
        d = a[i].cast("double") - b[i].cast("double")
        acc = acc + d * d
    return acc


def pq_train(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
) -> DataFrame:
    """Product-quantization codebooks: ``(sub, code, codeword)`` — one
    k-codeword codebook per subspace, all ``m`` trained together.

    PQ (Jégou et al., "Product Quantization for Nearest Neighbor
    Search", TPAMI 2011) is THE 100 TB embedding-index family: a D-dim
    float vector compresses to ``m`` one-byte codes (here 64 floats →
    8 codes, 32×), and query scoring becomes table lookups instead of
    float-array math. Training = k-means per subspace; this runs all
    subspaces in one scan per Lloyd round (explode to (sub, subvec),
    assignment keyed by (sub, vid), means keyed by (sub, code, pos)) —
    shuffle volume per round is corpus × 1, not corpus × m.

    Determinism (what makes the bit-exact Python oracle possible): seeds
    are the ``k`` lowest vector ids' subvectors; assignment ties break
    on code ASC; per-dim means sum as DECIMAL(30,12) (order-free) and
    divide in double — the same discipline as ``kmeans_centroids``.
    """
    sub_len = dim // m
    # persisted for the Lloyd loop: every round re-scans the subvector
    # table; the final book is eagerly checkpointed, so unpersist after
    # the loop is safe
    subs = corpus.select(F.col(id_col).alias("vid"), _sub_slices(vec_col, dim, m).alias("s")).select(
        "vid", "s.sub", "s.subvec"
    ).persist()
    seed_w = Window.partitionBy(F.lit(1)).orderBy("vid")
    seeds = (
        corpus.orderBy(id_col)
        .limit(k)
        .select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
        .withColumn("code", F.row_number().over(seed_w) - 1)
    )
    book = seeds.select(
        "code", _sub_slices("vec", dim, m).alias("s")
    ).select("s.sub", "code", F.transform("s.subvec", lambda x: x.cast("double")).alias("codeword"))
    for _ in range(iters):
        assign = _pq_assign(subs, book, sub_len)
        means = (
            assign.select("sub", "code", F.posexplode("subvec").alias("pos", "val"))
            .groupBy("sub", "code", "pos")
            .agg(
                (
                    F.sum(F.col("val").cast("double").cast("decimal(30,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("mval")
            )
        )
        book = (
            means.groupBy("sub", "code")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "mval"))).alias("pm"))
            .select("sub", "code", F.transform("pm", lambda s: s["mval"]).alias("codeword"))
        )
        # small (m × k × sub_len): cut the lineage so round r+1's plan
        # does not re-run every earlier round's corpus scan
        book = book.localCheckpoint(eager=True)
    subs.unpersist()
    return book


def _pq_assign(subs: DataFrame, book: DataFrame, sub_len: int) -> DataFrame:
    """Nearest codeword per (vid, sub), ZERO-SHUFFLE: the (sub, code,
    codeword) book collapses to a one-row sorted array (m × k entries —
    constant, the scalar-broadcast BNLJ class), broadcast-crossed into
    the subvector scan; each row filters its subspace's codewords and
    folds the argmin locally. The previous rank-window plan shuffled
    corpus × m × k scored rows on (vid, sub) to pick per-row minima —
    the dominant exchange of every pq_train Lloyd round and of
    pq_encode. Distance math (unrolled L2) and tie-break (d2 ASC, code
    ASC) are unchanged, so codes are bit-equal and the Python reference
    still replicates them."""
    barr = book.agg(
        F.array_sort(F.collect_list(F.struct("sub", "code", "codeword"))).alias("bk")
    )
    cands = F.filter(F.col("bk"), lambda b: b["sub"] == F.col("sub"))
    scored = F.transform(
        cands,
        lambda b: F.struct(
            _l2_sq_fixed(F.col("subvec"), b["codeword"], sub_len).alias("d2"),
            b["code"].alias("code"),
        ),
    )
    # candidates are code-ASC (array_sort on (sub, code, ...)); fold
    # replaces only on strictly smaller d2 == (d2 ASC, code ASC)
    best = F.aggregate(
        F.slice(scored, F.lit(2), F.greatest(F.size(scored) - 1, F.lit(0))),
        F.try_element_at(scored, F.lit(1)),
        lambda acc, cand: F.when(cand["d2"] < acc["d2"], cand).otherwise(acc),
    )
    return (
        subs.crossJoin(F.broadcast(barr))
        .withColumn("b", best)
        .filter(F.col("b").isNotNull())
        .select("vid", "sub", "subvec", F.col("b.code").alias("code"))
    )


def pq_encode(
    corpus: DataFrame,
    book: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
) -> DataFrame:
    """Compress each vector to its code array: ``(vid, codes)`` with
    ``codes[sub]`` = nearest codeword in subspace ``sub``. This is the
    stored index — m small ints per vector instead of ``dim`` floats."""
    sub_len = dim // m
    subs = corpus.select(F.col(id_col).alias("vid"), _sub_slices(vec_col, dim, m).alias("s")).select(
        "vid", "s.sub", "s.subvec"
    )
    assign = _pq_assign(subs, book, sub_len)
    return (
        assign.groupBy("vid")
        .agg(F.array_sort(F.collect_list(F.struct("sub", "code"))).alias("sc"))
        .select("vid", F.transform("sc", lambda s: s["code"]).alias("codes"))
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    iters: int = 2,
    n_salt: int = 8,
) -> DataFrame:
    """Approximate top-k by asymmetric distance computation (ADC) over
    PQ codes: ``sim ≈ cosine(query, reconstructed corpus vector)``.

    The scan never touches corpus floats — only the m-byte code arrays.
    Per query a lookup table ``lut[sub][code] = dot(q_sub, codeword)``
    (m·k doubles) is prebuilt; because reconstruction concatenates
    subspace codewords, ``|x̂|² = Σ_sub |codeword|²`` is exact from a
    query-independent norm table. Scoring a pair is m array lookups +
    adds — the FAISS IVFADC inner loop as codegen'd Spark expressions.
    Ranking reuses the two-level salted top-k (no per-query funnel).
    """
    book = pq_train(corpus, id_col, vec_col, dim, m, n_codes, iters)
    codes = pq_encode(corpus, book, id_col, vec_col, dim, m)
    sub_len = dim // m

    # per-(query, sub, code) dot + per-(sub, code) codeword norm²
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    lut = (
        q.select("query_id", "qvec", _sub_slices("qvec", dim, m).alias("s"))
        .select("query_id", "qvec", "s.sub", "s.subvec")
        .join(F.broadcast(book), "sub")
        .withColumn("lutval", dot_fixed(F.col("subvec"), F.col("codeword"), sub_len))
        .withColumn("cwn2", dot_fixed(F.col("codeword"), F.col("codeword"), sub_len))
    )
    # each query's m×k table as a MAP keyed by sub*n_codes + code — NOT a
    # positionally-indexed array: pq_train can drop a codeword whose cell
    # loses all members during Lloyd rounds, and a hole in a flattened
    # array would shift every later entry (crash or silently score with
    # the wrong codeword). Key lookup is hole-proof and matches the
    # (sub, code)-keyed Python reference.
    qtab = (
        lut.groupBy("query_id")
        .agg(
            F.map_from_entries(
                F.collect_list(
                    F.struct(
                        (F.col("sub") * n_codes + F.col("code")).alias("i"),
                        F.struct("lutval", "cwn2").alias("v"),
                    )
                )
            ).alias("t"),
            F.first(norm_fixed(F.col("qvec"), dim)).alias("qnorm"),
        )
    )
    paired = codes.join(F.broadcast(qtab), F.col("query_id") != F.col("vid"))
    raw: Column = F.lit(0.0)
    n2: Column = F.lit(0.0)
    for s in range(m):
        e = F.element_at(F.col("t"), F.lit(s * n_codes) + F.col("codes")[s])
        raw = raw + e["lutval"]
        n2 = n2 + e["cwn2"]
    scored = paired.select(
        "query_id",
        F.col("vid").alias("neighbor_id"),
        F.round(raw / (F.col("qnorm") * F.sqrt(n2)), 6).alias("sim"),
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
