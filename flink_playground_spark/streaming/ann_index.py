"""Incremental ANN index: IVF cell assignments over a vector stream.

The batch ``ivf_topk`` (functions/similarity.py) trains centroids and
assigns the whole corpus per call; a serving system separates the two
lifecycles the way every production ANN deployment does:

- CENTROIDS train once (here: on the first wave, Lloyd-refined) and
  freeze — they are the index GEOMETRY, and changing them means
  reassigning everything, i.e. an offline rebuild, not an ingest;
- ASSIGNMENTS stream: each arriving vector joins its nearest frozen
  centroid and upserts into bucketed cell state (keep-latest on the
  vector id — re-ingesting a vector moves it to its current cell).
  Per-batch work ∝ wave × centroids; nothing re-reads old vectors.

Queries probe ``nprobe`` cells against the CURRENT state — candidates
come from the cell join, never a cross product, and their cosines are
the exact scores (same ``cosine`` as the batch path), so every returned
similarity matches the brute-force value bit-for-bit even though the
candidate SET is approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flink_playground_spark.functions.similarity import (
    cosine,
    ivf_assign,
    kmeans_centroids,
)
from flink_playground_spark.streaming.state_store import BucketedKeyState


class StreamingIVFIndex:
    """Maintain IVF cell state over vector waves; query any time."""

    def __init__(
        self,
        path: str,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
        n_centroids: int = 16,
        kmeans_iters: int = 2,
        n_buckets: int = 8,
    ):
        import os

        self.id_col = id_col
        self.vec_col = vec_col
        self.n_centroids = n_centroids
        self.kmeans_iters = kmeans_iters
        self.centroids_path = f"{path}/centroids"
        self.cells = BucketedKeyState(f"{path}/cells", ["vid"], n_buckets)
        self._trained = os.path.isdir(self.centroids_path)

    def _centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.centroids_path)

    def ingest(self, batch: DataFrame) -> None:
        """Assign a vector wave to frozen centroids and upsert the cells.
        The first wave also trains (then freezes) the centroids."""
        spark = batch.sparkSession
        if not self._trained:
            kmeans_centroids(
                batch, self.id_col, self.vec_col, self.n_centroids, self.kmeans_iters
            ).write.mode("overwrite").parquet(self.centroids_path)
            self._trained = True
        assigned = ivf_assign(
            batch, self._centroids(spark), self.id_col, self.vec_col, nprobe=1
        )
        # (vid, vec, centroid_id); __seq lets keep-latest resolve
        # re-ingestion deterministically (later merge wins)
        import time

        stamped = assigned.withColumn("__seq", F.lit(int(time.time() * 1e6)))
        self.cells.merge_keep_latest(stamped, "__seq")

    def query(
        self, spark: SparkSession, queries: DataFrame, k: int = 5, nprobe: int = 4
    ) -> DataFrame:
        """Approximate top-k neighbors from the current cell state; the
        returned sims are exact cosines of the candidates."""
        state = self.cells.read(spark)
        probes = ivf_assign(
            queries, self._centroids(spark), self.id_col, self.vec_col, nprobe=nprobe
        )
        cand = (
            probes.alias("q")
            .join(
                state.alias("c"),
                (F.col("q.centroid_id") == F.col("c.centroid_id"))
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
        scored = cand.withColumn(
            "sim", F.round(cosine(F.col("qvec"), F.col("cvec")), 6)
        ).select("query_id", "neighbor_id", "sim")
        w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
        return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
