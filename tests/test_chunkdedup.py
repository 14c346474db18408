"""Streaming chunk-level dedup: drained stream == batch answer; state IO
bucketed."""

from __future__ import annotations

from flink_playground_spark.queries import EXTRA_REGISTRY
from flink_playground_spark.streaming.chunkdedup import streaming_chunk_dedup
from flink_playground_spark.streaming.neardup import replay_documents_stream


def _rows(pdf):
    return sorted(map(tuple, pdf.values))


def test_streaming_chunk_dedup_equals_batch(spark, sf_dir, tmp_path):
    stream = replay_documents_stream(spark, sf_dir, waves=3)
    secs: list = []
    got = streaming_chunk_dedup(
        stream, work_dir=str(tmp_path / "state"), batch_seconds=secs
    ).toPandas()
    want = EXTRA_REGISTRY["chunk_dedup"].spark_fn(spark, sf_dir).toPandas()
    cols = ["chunk_fp", "n_tokens", "n_occurrences", "n_docs", "canonical_doc"]
    assert _rows(got[cols]) == _rows(want[cols])
    assert len(secs) == 3


def test_streaming_chunk_dedup_state_reattach(spark, sf_dir, tmp_path):
    """Running the second half of the corpus against state left by the
    first half gives the same final answer — state survives operator
    restarts (the ingestion-pipeline resume story)."""
    work = str(tmp_path / "state")
    from flink_playground_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)

    # use the foreachBatch fold directly via one-wave streams
    import glob
    import shutil
    import tempfile

    def one_wave_stream(df):
        w = tempfile.mkdtemp(prefix="fps_wave_")
        part = f"{w}/p"
        df.coalesce(1).write.mode("overwrite").parquet(part)
        src = f"{w}/src"
        import os

        os.makedirs(src)
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], f"{src}/wave.parquet")
        return spark.readStream.schema(df.schema).parquet(src)

    streaming_chunk_dedup(one_wave_stream(half_a), work_dir=work)
    got = streaming_chunk_dedup(one_wave_stream(half_b), work_dir=work).toPandas()
    want = EXTRA_REGISTRY["chunk_dedup"].spark_fn(spark, sf_dir).toPandas()
    cols = ["chunk_fp", "n_tokens", "n_occurrences", "n_docs", "canonical_doc"]
    assert _rows(got[cols]) == _rows(want[cols])
