"""Incremental (streaming) near-duplicate detection.

The batch MinHash-LSH dedup (functions.dedupe) answers "which pairs in
this corpus are near-dups". The streaming variant answers the pipeline
question: *as documents arrive, which of them duplicate anything seen so
far* — each micro-batch's docs are banded, joined against the
accumulated bucket state (old ∪ new), candidates verified with exact
shingle Jaccard, and confirmed pairs appended to the result. Every
qualifying pair is emitted exactly once (in the batch where its later
member arrives), so the drained stream equals the batch answer — which
is exactly how the oracle checks it.

State = corpus texts + band buckets in parquet dirs (compacted per
batch; at cluster scale: Delta/Iceberg MERGE, signatures only).
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_playground_spark.functions.dedupe import minhash_signatures, ngram_jaccard_pairs


def _bands(sig_df: DataFrame, bands: int, rows: int) -> DataFrame:
    return sig_df.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(F.array_join(F.slice("sig", b * rows + 1, rows), ",")).alias(
                            "bucket"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "bb.band", "bb.bucket")


def streaming_neardup(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 128,
    bands: int = 32,
    n: int = 3,
    threshold: float = 0.8,
    work_dir: str | None = None,
) -> DataFrame:
    """Drain ``doc_stream`` (availableNow) through incremental near-dup
    detection; returns the accumulated (id_a, id_b, jaccard) pairs."""
    spark = doc_stream.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="fps_neardup_")
    corpus_path, buckets_path, out_path = f"{work}/corpus", f"{work}/buckets", f"{work}/pairs"
    state = {"has": False, "emitted": False}
    rows = k // bands

    def fold(batch: DataFrame, epoch_id: int) -> None:
        sess = batch.sparkSession
        new_docs = batch.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
        new_bands = _bands(
            minhash_signatures(new_docs, "doc_id", "text", k, n), bands, rows
        )
        if state["has"]:
            all_docs = sess.read.parquet(corpus_path).unionByName(new_docs)
            all_bands = sess.read.parquet(buckets_path).unionByName(new_bands)
        else:
            all_docs, all_bands = new_docs, new_bands
        # candidates: a NEW doc colliding with any doc seen so far
        cand = (
            new_bands.alias("n")
            .join(
                all_bands.alias("a"),
                (F.col("n.band") == F.col("a.band"))
                & (F.col("n.bucket") == F.col("a.bucket"))
                & (F.col("n.doc") != F.col("a.doc")),
            )
            .select(
                F.least(F.col("n.doc"), F.col("a.doc")).alias("id_a"),
                F.greatest(F.col("n.doc"), F.col("a.doc")).alias("id_b"),
            )
            .distinct()
        )
        # drop pairs whose BOTH members are old (already emitted earlier)
        new_ids = new_docs.select(F.col("doc_id").alias("id_new")).distinct()
        cand = cand.join(
            new_ids, (cand.id_a == new_ids.id_new) | (cand.id_b == new_ids.id_new), "left_semi"
        )
        exact = ngram_jaccard_pairs(all_docs, "doc_id", "text", n, threshold)
        confirmed = cand.join(exact, ["id_a", "id_b"]).select("id_a", "id_b", "jaccard")
        confirmed.write.mode("append").parquet(out_path)
        state["emitted"] = True
        # compact state
        for path, df in ((corpus_path, all_docs), (buckets_path, all_bands)):
            tmp = f"{path}_tmp_{uuid.uuid4().hex[:6]}"
            df.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(path, ignore_errors=True)
            shutil.move(tmp, path)
        state["has"] = True

    q = doc_stream.writeStream.foreachBatch(fold).trigger(availableNow=True).start()
    q.awaitTermination()
    if not state["emitted"]:
        raise RuntimeError("document stream produced no data")
    return spark.read.parquet(out_path).dropDuplicates(["id_a", "id_b"])


def replay_documents_stream(spark: SparkSession, sf_dir: str, files_per_batch: int = 1) -> DataFrame:
    """documents replayed as a stream. To exercise multi-batch state, copy
    the table into parity-split files and feed them one per micro-batch."""
    from flink_playground_spark.sources.tables import load_table

    work = tempfile.mkdtemp(prefix="fps_docsrc_")
    docs = load_table(spark, sf_dir, "documents")
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode("overwrite").parquet(f"{work}/a")
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode("overwrite").parquet(f"{work}/b")
    src = f"{work}/src"
    import os, glob

    os.makedirs(src)
    for i, part in enumerate(("a", "b")):
        f = glob.glob(f"{work}/{part}/*.parquet")[0]
        shutil.copy(f, f"{src}/wave{i}.parquet")
    return (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", str(files_per_batch))
        .parquet(src)
    )
