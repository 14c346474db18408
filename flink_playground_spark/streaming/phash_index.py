"""Incremental perceptual-hash image near-dup index.

The batch query (queries.phash_image_neardup) answers "which image
pairs in this corpus sit within Hamming 3". This index answers the
pipeline question: *as image batches arrive, which of them duplicate
anything seen so far* — the streaming counterpart the text families
already have (streaming/neardup.py for MinHash, substring_dedup.py for
exact substrings). Every qualifying pair is emitted exactly once, in
the wave where its later member arrives, so the drained pair set equals
the batch answer — which is exactly how the oracle checks it.

Incrementality is real, not nominal:

- Per-wave compute: the wave's fingerprints band into 4 rows/doc
  (dedupe.simhash_chunks — the same 4x16 pigeonhole grid as the batch
  path) and join ONLY against state rows in the buckets the wave
  touches (a semi-join on (band, bucket) prunes the scan); candidates
  are verified with an exact bit_count. Work ∝ wave docs x touched-
  bucket occupancy, independent of corpus age.
- Per-wave state IO: both the band state and the emitted-pair log are
  ``AppendDeltaState`` ledgers (streaming/txn_state.py) — a wave
  commits one immutable delta dir whose bytes are ∝ the wave's rows,
  never rewriting prior state, with the writers map skipping
  re-delivered (writer, batch) pairs so an at-least-once foreachBatch
  redelivery cannot double-emit.
- State size: 4 x (band, bucket, doc, 8-byte hash) rows per doc —
  ~48B/doc regardless of image payload size. Pixels never enter state.

Bucket-cap contract (same as streaming/neardup.py): buckets whose
ACCUMULATED distinct-doc count crosses ``max_bucket`` are appended to
an overflow ledger (``<work>/bucket_overflow``) and excluded from every
later candidate join — drained == batch whenever no bucket crosses the
cap mid-stream (the tested regime); on a corpus that does overflow,
pairs emitted before the crossing are never retracted and the ledger
names every such bucket so the divergence is auditable.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.functions.dedupe import (
    DEFAULT_MAX_BUCKET,
    simhash_chunks,
)
from flink_playground_spark.streaming.txn_state import AppendDeltaState

_PAIR_COLS = ("id_a", "id_b", "hamming")


class StreamingPhashIndex:
    """Keyed on 64-bit perceptual hashes: feed ``ingest`` one wave of
    (doc, sh) fingerprints at a time (image -> hash happens upstream,
    e.g. multimodal.perceptual_hash), read ``pairs`` for every near-dup
    pair emitted so far."""

    def __init__(
        self,
        workdir: str,
        max_hamming: int = 3,
        max_bucket: int | None = DEFAULT_MAX_BUCKET,
    ):
        self.workdir = workdir
        self.max_hamming = max_hamming
        self.max_bucket = max_bucket
        self._bands = AppendDeltaState(f"{workdir}/bands", keys=["band", "bucket", "doc"])
        self._pairs = AppendDeltaState(f"{workdir}/pairs", keys=["id_a", "id_b"])
        self._overflow_dir = f"{workdir}/bucket_overflow"

    # -- internals ---------------------------------------------------------

    def _overflow(self, spark: SparkSession) -> DataFrame | None:
        if not glob.glob(f"{self._overflow_dir}/*.parquet"):
            return None
        return spark.read.parquet(self._overflow_dir)

    def _verify(self, cand: DataFrame) -> DataFrame:
        ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
        return (
            cand.distinct()
            .withColumn("hamming", ham.cast("int"))
            .filter(F.col("hamming") <= self.max_hamming)
            .select(*_PAIR_COLS)
            .distinct()
        )

    # -- API ----------------------------------------------------------------

    def ingest(self, fp: DataFrame, batch_id: int) -> None:
        """Fold one wave of (doc, sh) fingerprints: emit every pair the
        wave completes (new x new within the wave, new x state across
        waves), then append the wave's bands. Replay-safe: a re-delivered
        batch_id is skipped before any write."""
        spark = fp.sparkSession
        banded = simhash_chunks(fp.select("doc", "sh")).localCheckpoint(eager=True)
        touched = banded.select("band", "bucket").distinct()
        prior = self._bands.read(spark)
        if prior is not None:
            prior = prior.join(F.broadcast(touched), ["band", "bucket"], "left_semi")

        if self.max_bucket is not None:
            # accumulated occupancy of the touched buckets only
            occ_src = banded.select("band", "bucket", "doc")
            if prior is not None:
                occ_src = occ_src.unionByName(prior.select("band", "bucket", "doc"))
            over = (
                occ_src.groupBy("band", "bucket")
                .agg(F.count_distinct("doc").alias("n"))
                .filter(F.col("n") > self.max_bucket)
                .select("band", "bucket")
            )
            known_over = self._overflow(spark)
            if known_over is not None:
                over = over.unionByName(known_over.select("band", "bucket")).distinct()
            # the overflow set is BOUNDED BY DESIGN (it is the loud
            # exception list, not data) — materialize it on the driver
            # before overwriting the ledger, so the rewrite never reads
            # the files it is replacing
            over_rows = over.collect()
            if over_rows:
                over = spark.createDataFrame(over_rows, over.schema)
                over.write.mode("overwrite").parquet(self._overflow_dir)
                banded = banded.join(F.broadcast(over), ["band", "bucket"], "left_anti")
                if prior is not None:
                    prior = prior.join(F.broadcast(over), ["band", "bucket"], "left_anti")

        a, b = banded.alias("a"), banded.alias("b")
        new_new = a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        ).select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        pairs = self._verify(new_new)
        if prior is not None:
            p = prior.alias("p")
            new_old = a.join(
                p,
                (F.col("a.band") == F.col("p.band"))
                & (F.col("a.bucket") == F.col("p.bucket"))
                & (F.col("a.doc") != F.col("p.doc")),
            ).select(
                F.least("a.doc", "p.doc").alias("id_a"),
                F.greatest("a.doc", "p.doc").alias("id_b"),
                F.col("a.sh").alias("sh_a"),
                F.col("p.sh").alias("sh_b"),
            )
            pairs = pairs.unionByName(self._verify(new_old))
        # the two sources are disjoint (state never contains this wave's
        # docs), so one distinct per source suffices; appends are
        # replay-skipped per (writer, batch)
        self._pairs.append(pairs, writer_id="pairs", batch_id=batch_id)
        self._bands.append(banded, writer_id="bands", batch_id=batch_id)

    def pairs(self, spark: SparkSession) -> DataFrame:
        """Every near-dup pair emitted so far (drained == the batch
        answer under the bucket-cap contract above)."""
        out = self._pairs.read(spark)
        if out is None:
            return spark.createDataFrame([], "id_a long, id_b long, hamming int")
        return out.select(*_PAIR_COLS)

    def overflow_buckets(self, spark: SparkSession) -> DataFrame:
        """The loud ledger: (band, bucket) excluded from candidate joins."""
        out = self._overflow(spark)
        if out is None:
            return spark.createDataFrame([], "band int, bucket long")
        return out


def state_bytes(workdir: str) -> int:
    """Total bytes of committed band-state deltas (test hook for the
    per-wave write-IO contract)."""
    return sum(
        os.path.getsize(p)
        for p in glob.glob(f"{workdir}/bands/d*/**/*.parquet", recursive=True)
    )
