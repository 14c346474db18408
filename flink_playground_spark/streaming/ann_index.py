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

STALENESS: frozen geometry silently degrades when the ingest
distribution drifts — new vectors land far from every centroid, cells
bloat unevenly, recall drops with no error anywhere. Each ingest
therefore records the wave's FIT (mean cosine distance of its vectors
to their assigned centroid, a per-wave aggregate of the assignment the
ingest computes anyway — zero extra passes). ``drift_report`` exposes
the series; ``needs_retrain`` compares the latest wave's drift against
the geometry's own training fit (ratio > threshold ⇒ stale);
``retrain`` is the explicit offline rebuild: re-run Lloyd over the
CURRENT state, swap the geometry, reassign every stored vector once,
and reset the fit baseline. The trigger is exposed, not automatic —
rebuild cost is a capacity decision, the engine's job is to make the
drift visible and the rebuild one call.
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
        self.metrics_path = f"{path}/metrics"
        self.cells = BucketedKeyState(f"{path}/cells", ["vid"], n_buckets)
        self._trained = os.path.isdir(self.centroids_path)
        self._wave = None  # lazily counted from the metrics log on reattach

    def _centroids(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.centroids_path)

    def _next_wave(self, spark: SparkSession) -> int:
        import os

        if self._wave is None:
            self._wave = (
                spark.read.parquet(self.metrics_path).count()
                if os.path.isdir(self.metrics_path)
                else 0
            )
        w, self._wave = self._wave, self._wave + 1
        return w

    def _record(self, assigned: DataFrame, phase: str, wave: int) -> None:
        """Append one (wave, phase, n, mean_drift) row: the wave's mean
        cosine DISTANCE to its assigned centroid. One tiny aggregate of
        the assignment DataFrame the caller already computed."""
        m = assigned.agg(
            F.count("*").alias("n"),
            F.avg(1.0 - F.col("csim")).alias("mean_drift"),
        ).select(
            F.lit(wave).alias("wave"),
            F.lit(phase).alias("phase"),
            "n",
            "mean_drift",
        )
        m.coalesce(1).write.mode("append").parquet(self.metrics_path)

    def ingest(self, batch: DataFrame) -> None:
        """Assign a vector wave to frozen centroids and upsert the cells.
        The first wave also trains (then freezes) the centroids. Every
        wave appends its fit to the drift log."""
        spark = batch.sparkSession
        first = not self._trained
        if first:
            kmeans_centroids(
                batch, self.id_col, self.vec_col, self.n_centroids, self.kmeans_iters
            ).write.mode("overwrite").parquet(self.centroids_path)
            self._trained = True
        assigned = ivf_assign(
            batch, self._centroids(spark), self.id_col, self.vec_col, nprobe=1,
            keep_sim=True,
        ).localCheckpoint(eager=True)  # one assignment pass feeds state AND metrics
        self._record(assigned, "train" if first else "ingest", self._next_wave(spark))
        # (vid, vec, centroid_id); __seq lets keep-latest resolve
        # re-ingestion deterministically (later merge wins)
        import time

        stamped = assigned.drop("csim").withColumn(
            "__seq", F.lit(int(time.time() * 1e6))
        )
        # fold-only: the IVF index never diffs its state
        self.cells.merge_keep_latest(stamped, "__seq", return_contents=False)

    def drift_report(self, spark: SparkSession) -> DataFrame:
        """Per-wave fit series: (wave, phase, n, mean_drift, baseline,
        ratio). ``baseline`` is the most recent train/retrain fit at or
        before the wave — the geometry each wave was assigned under."""
        # bounded global window: one metrics row per ingest wave;
        # single_group pins the bound and silences the warning
        from flink_playground_spark.operators.windows import single_group

        m = (
            Window.partitionBy(single_group("wave"))
            .orderBy("wave")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        base = F.last(
            F.when(F.col("phase").isin("train", "retrain"), F.col("mean_drift")),
            ignorenulls=True,
        ).over(m)
        return (
            spark.read.parquet(self.metrics_path)
            .withColumn("baseline", base)
            # try_divide: a perfectly-fit geometry has baseline 0.0 and
            # under ANSI x/0 throws; NULL ratio is handled (and still
            # triggers) in needs_retrain via the absolute floor
            .withColumn("ratio", F.try_divide(F.col("mean_drift"), F.col("baseline")))
        )

    def needs_retrain(
        self,
        spark: SparkSession,
        threshold: float = 1.5,
        min_delta: float = 0.05,
    ) -> bool:
        """True when the latest wave's mean drift exceeds ``threshold`` ×
        the current geometry's training fit AND the absolute degradation
        exceeds ``min_delta`` (cosine-distance units). The floor keeps a
        snug geometry (baseline ≈ 0, where held-out noise inflates the
        ratio) from triggering a full rebuild over an immaterial absolute
        change. One-row collect of a bounded (per-wave) log."""
        last = (
            self.drift_report(spark).orderBy(F.desc("wave")).limit(1).collect()
        )
        if not last or last[0]["baseline"] is None:
            return False
        r = last[0]
        delta = r["mean_drift"] - r["baseline"]
        if delta <= min_delta:
            return False
        # a perfectly-fit geometry (baseline 0.0 — Spark's /0 yields a
        # NULL ratio, and an fp-epsilon-negative baseline flips its
        # sign) must not mask drift: past the absolute floor, a
        # degenerate baseline alone is staleness
        if r["ratio"] is None or r["baseline"] <= 0:
            return True
        return r["ratio"] > threshold

    def retrain(self, spark: SparkSession) -> None:
        """Offline geometry rebuild: Lloyd over the CURRENT state, swap
        centroids, reassign every stored vector once, reset the fit
        baseline. Cost is one full pass over state — the documented
        rebuild lifecycle, now one call instead of a new index."""
        state = self.cells.read(spark)
        if state is None:
            raise RuntimeError("retrain before any ingest")
        corpus = state.select(
            F.col("vid").alias(self.id_col), F.col("vec").alias(self.vec_col)
        )
        kmeans_centroids(
            corpus, self.id_col, self.vec_col, self.n_centroids, self.kmeans_iters
        ).write.mode("overwrite").parquet(self.centroids_path)
        assigned = ivf_assign(
            corpus, self._centroids(spark), self.id_col, self.vec_col, nprobe=1,
            keep_sim=True,
        ).localCheckpoint(eager=True)
        self._record(assigned, "retrain", self._next_wave(spark))
        import time

        stamped = assigned.drop("csim").withColumn(
            "__seq", F.lit(int(time.time() * 1e6))
        )
        # fold-only: the IVF index never diffs its state
        self.cells.merge_keep_latest(stamped, "__seq", return_contents=False)

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
