"""Python reference oracles (functions/reference.py + xxh64_ref.py):
the hash-seeded queries that have no SQL oracle must match a bit-exact
Python replica of their math — turning the former rows-only checks into
full value checks (r2 VERDICT #5)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_playground_spark.functions.xxh64_ref import Long, hash_bytes, spark_xxhash64


def test_xxh64_published_vectors():
    """Core XXH64 against the published xxhsum test vectors (seed 0)."""
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999
    assert hash_bytes(b"a", 0) == 0xD24EC4F1A98C6E5B
    assert hash_bytes(b"abc", 0) == 0x44BC2CF5AD770999
    assert hash_bytes(b"Nobody inspects the spammish repetition", 0) == 0xFBCEA83C8A378BF1


def test_xxh64_matches_spark_expression(spark):
    """spark_xxhash64 == F.xxhash64 for int, long, string and chained
    multi-column operands, including negative ints, empty and >32-byte
    strings (stripe loop) and non-ASCII UTF-8."""
    rows = [
        (1, 7, "hello"),
        (2, -3, "a much longer string that exceeds thirty-two bytes for the stripe loop"),
        (3, 0, ""),
        (4, 2**31 - 1, "αβγ unicode"),
        (5, -(2**31), "x" * 33),
    ]
    df = spark.createDataFrame(rows, "id int, i int, s string")
    got = {
        r.id: r
        for r in df.select(
            "id",
            F.xxhash64("i").alias("hi"),
            F.xxhash64("s").alias("hs"),
            F.xxhash64("i", "s").alias("his"),
            F.xxhash64(F.col("i").cast("long")).alias("hl"),
            F.xxhash64(F.lit(0), F.lit(1), F.col("i")).alias("h3"),
        ).collect()
    }
    for id_, i, s in rows:
        r = got[id_]
        assert r.hi == spark_xxhash64(i)
        assert r.hs == spark_xxhash64(s)
        assert r.his == spark_xxhash64(i, s)
        assert r.hl == spark_xxhash64(Long(i))
        assert r.h3 == spark_xxhash64(0, 1, i)


def test_simhash_neardup_matches_reference(spark, sf_dir):
    from flink_playground_spark.functions.reference import simhash_neardup_ref
    from flink_playground_spark.queries import EXTRA_REGISTRY

    got = EXTRA_REGISTRY["simhash_neardup"].spark_fn(spark, sf_dir).toPandas()
    ref = simhash_neardup_ref(sf_dir)
    assert sorted(map(tuple, got[["id_a", "id_b", "hamming"]].values.tolist())) == sorted(
        map(tuple, ref.values.tolist())
    )


def test_embedding_neardup_lsh_matches_reference(spark, sf_dir):
    """Value equality including the rounded cosine — the double
    accumulation order and HALF_UP rounding are replicated exactly."""
    from flink_playground_spark.functions.reference import embedding_neardup_lsh_ref
    from flink_playground_spark.queries import EXTRA_REGISTRY

    got = EXTRA_REGISTRY["embedding_neardup_lsh"].spark_fn(spark, sf_dir).toPandas()
    ref = embedding_neardup_lsh_ref(sf_dir)
    assert sorted(map(tuple, got[["id_a", "id_b", "sim"]].values.tolist())) == sorted(
        map(tuple, ref.values.tolist())
    )


def test_ann_topk_matches_reference(spark, sf_dir):
    """Full value equality for BOTH ANN branches: xxh64-hyperplane LSH
    buckets and the Lloyd-refined IVF geometry (exact-decimal means make
    the centroids aggregation-order-independent, so the Python replica
    reproduces every sim and rank bit-for-bit)."""
    from flink_playground_spark.functions.reference import ann_topk_ref
    from flink_playground_spark.queries import EXTRA_REGISTRY

    got = EXTRA_REGISTRY["ann_topk"].spark_fn(spark, sf_dir).toPandas()
    ref = ann_topk_ref(sf_dir)
    cols = ["method", "query_id", "neighbor_id", "sim", "rank"]
    assert sorted(map(tuple, got[cols].values.tolist())) == sorted(
        map(tuple, ref[cols].values.tolist())
    )


def test_corpus_similarity_matches_reference_and_estimate_calibrated(spark, sf_dir):
    from flink_playground_spark.functions.reference import corpus_similarity_ref
    from flink_playground_spark.queries import EXTRA_REGISTRY

    got = EXTRA_REGISTRY["corpus_similarity"].spark_fn(spark, sf_dir).toPandas()
    ref = corpus_similarity_ref(sf_dir)
    cols = ["src_a", "src_b", "est_jaccard", "exact_jaccard"]
    assert sorted(map(tuple, got[cols].values.tolist())) == sorted(
        map(tuple, ref[cols].values.tolist())
    )
    # K=64 MinHash estimate: mean |est - exact| well inside 1/sqrt(K)
    err = (got["est_jaccard"] - got["exact_jaccard"]).abs()
    assert err.mean() < 0.125, f"estimate uncalibrated: mean err {err.mean()}"
