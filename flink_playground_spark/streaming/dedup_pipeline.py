"""End-to-end incremental near-dup pipeline: doc waves → fingerprint
index → this wave's new pairs → incremental duplicate clusters, fused
in ONE per-wave fold — the composition a training-data pipeline
actually runs inside ``foreachBatch`` (r11 verdict Next #1).

The pieces existed separately: the streaming pair indexes
(StreamingPhashIndex / StreamingHammingIndex for image+audio 64-bit
fingerprints, StreamingFrameSetIndex for video frame-hash sets,
streaming/neardup.py for MinHash text) emit PAIRS per wave, and
StreamingDupClusters folds pair waves into the CLUSTER mapping dedup
acts on. What was missing is the composed operator — and the crash
points composition creates: a wave's work now spans TWO independent
transactional ledgers (the index's commit and the cluster ledger's),
and a crash can land between them.

The fold per wave ``b``:

1. whole-wave replay probe: if the CLUSTER ledger committed ``b``, the
   entire wave (both stages) already happened — skip before any work.
   (The cluster ingest is the LAST commit of the wave, so it is the
   composition's commit point.)
2. ``index.ingest(wave, b)`` — itself replay-safe: if the index
   committed ``b`` but the cluster ledger did not (the crash-between-
   ledgers case), the ingest skips internally and loses nothing.
3. ``index.pairs_for_batch(b)`` — the wave's pairs, read back from the
   pair ledger rather than returned in memory, PRECISELY so step 2's
   skip path still has them: every pair row carries the wave that
   emitted it (``since_batch``, stable under compaction's min-fold
   because a pair is emitted in exactly one wave).
4. ``clusters.ingest(pairs, b)`` — the commit point. A crash anywhere
   before it redelivers the wave; steps 2–3 reproduce the identical
   pair set (the index's ledgers are already committed and immutable),
   so the cluster fold converges to the same mapping.

Scale shape: nothing new moves — step 3 is a columnar filter over the
pair ledger (wave-sized output), and the index/cluster stages keep
their own proven per-wave bounds (work ∝ wave × touched state, write
IO ∝ wave). The composition adds one probe and one ledger filter per
wave, not a new shuffle.

Takedown composes too: ``forget(docs)`` prunes the pair index
surgically (raw per-doc facts), then cascades into the cluster mapping
with the SURVIVING pair set (``StreamingDupClusters.forget`` relabels
exactly the touched components in one atomic rewrite).

Reference intent: the reference's dedup job (WithDeduplicateJoinJob
.java:88-104) deduplicates a changelog stream end-to-end inside one
pipeline; this operator is that composition for content-level near-dup
at training-data scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_playground_spark.streaming.cc_index import StreamingDupClusters


class StreamingNearDupPipeline:
    """Compose any per-wave pair index with the incremental cluster
    fold. ``index`` must expose the shared streaming-index surface:
    ``ingest(df, batch_id)``, ``committed(batch_id)``,
    ``pairs_for_batch(spark, batch_id)``, ``pairs(spark)``,
    ``forget(spark, docs)`` and ``ops_metrics()`` — which
    StreamingPhashIndex/StreamingHammingIndex and
    StreamingFrameSetIndex all do."""

    def __init__(self, workdir: str, index):
        self.index = index
        self.clusters = StreamingDupClusters(f"{workdir}/clusters")

    def ingest(self, wave: DataFrame, batch_id: int) -> None:
        """Fold one doc wave through both stages (see module docstring
        for the crash protocol). ``wave`` is whatever the index eats:
        (doc, sh) fingerprints for the Hamming index, (doc, shingle)
        frame-hash rows for the frameset index."""
        spark = wave.sparkSession
        if self.clusters.committed(batch_id):
            return  # whole wave already folded (cluster ledger = commit point)
        self.index.ingest(wave, batch_id)
        pairs = self.index.pairs_for_batch(spark, batch_id)
        self.clusters.ingest(pairs, batch_id, src="id_a", dst="id_b")

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Every near-dup pair emitted so far (the index's view)."""
        return self.index.pairs(spark)

    def mapping(self, spark: SparkSession) -> DataFrame:
        """Current (node, comp) duplicate-cluster assignment over every
        doc that appeared in a pair; comp = min doc id (canonical)."""
        return self.clusters.mapping(spark)

    def forget(self, spark: SparkSession, docs) -> dict:
        """Takedown across BOTH stages: surgical prune of the pair
        index, then the cluster-relabel cascade from the surviving pair
        set. Returns the per-stage removal stats."""
        stats = dict(self.index.forget(spark, docs))
        stats["clusters"] = self.clusters.forget(
            spark, docs, surviving_edges=self.index.pairs(spark)
        )
        return stats

    def ops_metrics(self) -> dict:
        """Day-2 snapshot of every ledger in the composition — the one
        call a dashboard makes per pipeline."""
        return {"index": self.index.ops_metrics(), "clusters": self.clusters.ops_metrics()}
