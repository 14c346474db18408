"""ANN serving lifecycle: streaming ingest → drift watch → rebuild.

The operational loop around the incremental IVF index
(streaming/ann_index.py): vector waves upsert into bucketed cell state
under a frozen geometry; every ingest records its fit to the drift log;
when a shifted domain arrives the drift ratio crosses the threshold and
``retrain()`` rebuilds the geometry over current state in one call —
the decision (rebuild cost vs degraded recall) stays with the operator,
the engine's job is to make the drift visible.

Run: ``python examples/pipeline_ann_serving.py``
"""

import pathlib
import sys
import tempfile

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.functions.similarity import brute_force_topk
from flink_playground_spark.streaming.ann_index import StreamingIVFIndex

SF_DIR = "/root/testdata/sf0.01"


def clustered(df, axis_base, id_off):
    """Deterministic tight clusters derived from the embeddings table
    (center = 3·e_axis, noise = 0.1× the stored vector)."""
    return df.select(
        (F.col("vec_id") + id_off).alias("vec_id"),
        F.expr(
            "transform(embedding, (x, i) -> CAST(0.1*x + "
            f"IF(i = {axis_base} + pmod(CAST(vec_id/2 AS BIGINT), 8), 3.0, 0.0)"
            " AS DOUBLE))"
        ).alias("embedding"),
    )


def recall(idx, spark, queries, corpus):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(corpus, queries, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in idx.query(spark, queries, k=5, nprobe=4).collect()
    }
    return len(exact & approx) / len(exact)


def main() -> None:
    spark = get_spark("ann-serving")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    domain_a = clustered(emb.filter(F.col("vec_id") < 200), 0, 0)
    domain_b = clustered(emb.filter(F.col("vec_id") >= 200), 32, 100000)

    idx = StreamingIVFIndex(
        tempfile.mkdtemp(prefix="fps_ann_"), n_centroids=16, kmeans_iters=2
    )
    idx.ingest(domain_a.filter(F.col("vec_id") % 2 == 0))  # trains geometry
    idx.ingest(domain_a.filter(F.col("vec_id") % 2 == 1))  # same domain
    print("after in-domain waves: needs_retrain =", idx.needs_retrain(spark))

    idx.ingest(domain_b)  # the corpus drifts
    print("after shifted wave:   needs_retrain =", idx.needs_retrain(spark))
    idx.drift_report(spark).orderBy("wave").show(truncate=False)

    # pin the snapshot: retrain() rewrites the cell buckets, and a lazy
    # plan over the old files would die mid-read
    corpus = (
        idx.cells.read(spark)
        .select(F.col("vid").alias("vec_id"), F.col("vec").alias("embedding"))
        .localCheckpoint(eager=True)
    )
    queries = domain_b.filter(F.col("vec_id") < 100240)
    stale = recall(idx, spark, queries, corpus)
    idx.retrain(spark)
    fresh = recall(idx, spark, queries, corpus)
    print(f"shifted-domain recall@5: stale geometry {stale:.2f} -> retrained {fresh:.2f}")
    print("post-retrain needs_retrain =", idx.needs_retrain(spark))
    spark.stop()


if __name__ == "__main__":
    main()
