"""Streaming exact-substring dedup: an incremental first-occurrence
gram ledger over document waves.

The batch operator (functions/dedupe.py ``exact_substring_dedup``, Lee
et al. 2021 semantics) needs the whole corpus to know each L-gram's
first occurrence. At ingestion time the same question is answered
incrementally: every wave folds its grams' ``min(struct(doc, pos))``
and occurrence counts into a bucketed state ledger — MIN and SUM are
order-free merges, so the drained ledger equals the batch firsts no
matter how waves arrive (out-of-doc-order waves are pinned in
tests/test_chunkdedup.py). ``rewrite`` then excises, from any document
set, every span whose gram first occurred elsewhere in the INGESTED
corpus — byte-for-byte the batch answer once everything has been
ingested.

Per-wave cost is flat in stream history: ``ingest`` shingles only its
own wave (work ∝ wave bytes) and merges through
``BucketedKeyState.merge_aggregate`` — IO ∝ touched buckets, never a
re-scan of previously ingested documents (the round-2 streaming
contract every ledger here follows; cf. streaming/decontam.py,
streaming/chunkdedup.py).

State stores the EXACT gram (collision-free, matching the batch spec);
at 100 TB you would key on ``xxhash64(gram)`` and verify survivors with
one residual equality join — the same note as the batch operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.functions.dedupe import (
    _gram_positions,
    _spans_against_firsts,
    rebuild_without_spans,
)
from flink_playground_spark.streaming.state_store import BucketedKeyState


class StreamingSubstringLedger:
    """First-occurrence L-gram ledger: ``(g, fd, fp, n)`` keyed state."""

    def __init__(
        self,
        path: str,
        id_col: str = "doc_id",
        text_col: str = "text",
        min_len: int = 40,
        n_buckets: int = 8,
    ):
        self.id_col = id_col
        self.text_col = text_col
        self.min_len = min_len
        self.state = BucketedKeyState(f"{path}/grams", ["g"], n_buckets)

    def ingest(self, batch: DataFrame) -> None:
        """Fold one wave's grams into the ledger. Work ∝ wave bytes."""
        partials = (
            _gram_positions(batch, self.id_col, self.text_col, self.min_len)
            .groupBy(F.col("__g").alias("g"))
            .agg(
                F.min(F.struct("__d", "__p")).getField("__d").alias("fd"),
                F.min(F.struct("__d", "__p")).getField("__p").alias("fp"),
                F.count(F.lit(1)).alias("n"),
            )
        )
        self.state.merge_aggregate(
            partials,
            [
                F.min(F.struct("fd", "fp")).getField("fd").alias("fd"),
                F.min(F.struct("fd", "fp")).getField("fp").alias("fp"),
                F.sum("n").alias("n"),
            ],
        )

    def firsts(self, spark: SparkSession) -> DataFrame | None:
        """Current ledger as the batch-shaped firsts relation
        ``(__g, __f struct, __n)``, or None before the first ingest."""
        cur = self.state.read(spark)
        if cur is None:
            return None
        return cur.select(
            F.col("g").alias("__g"),
            F.struct(
                F.col("fd").alias("__d"), F.col("fp").alias("__p")
            ).alias("__f"),
            F.col("n").alias("__n"),
        )

    def rewrite(self, docs: DataFrame) -> DataFrame:
        """Excise from ``docs`` every duplicated span per the CURRENT
        ledger (a position is duplicated iff its gram was ingested more
        than once and this position is not the recorded first). After
        the full corpus has been ingested, ``rewrite(corpus)`` is
        byte-identical to the batch ``exact_substring_dedup``."""
        first = self.firsts(docs.sparkSession)
        if first is None:  # nothing ingested: nothing is duplicated
            return docs.select(
                self.id_col,
                self.text_col,
                F.lit(0).cast("long").alias("removed_chars"),
            )
        pos = _gram_positions(docs, self.id_col, self.text_col, self.min_len)
        spans = _spans_against_firsts(pos, first, self.id_col, self.min_len)
        return rebuild_without_spans(docs, spans, self.id_col, self.text_col)
