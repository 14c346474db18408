"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested; the actual media decoding is STUBBED —
the container has no image/audio libraries — behind
``register_decoder``/``NotImplementedError``, with a deterministic fake
("fake/utf8" format) driving tests and oracles.

At scale: binary payloads stay columnar in parquet; ``mapInPandas``
streams Arrow batches through Python once (no shuffle), and downstream
aggregation happens on the extracted metadata columns, not the blobs.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# decoded-metadata schema shared by all decoders
META_SCHEMA = (
    "byte_len bigint, checksum bigint, width int, height int, valid boolean"
)

_DECODERS: dict[str, Callable[[bytes], dict]] = {}


def register_decoder(fmt: str, fn: Callable[[bytes], dict]) -> None:
    _DECODERS[fmt] = fn


def _fake_decode(blob: bytes) -> dict:
    """Deterministic stand-in for an image decoder: 'dimensions' derived
    from the payload, crc32 checksum. Replace with PIL/ffmpeg decoding
    when the libraries exist."""
    n = len(blob)
    return {
        "byte_len": n,
        "checksum": zlib.crc32(blob),
        "width": (n % 64) + 1,
        "height": (n % 48) + 1,
        "valid": n > 0,
    }


register_decoder("fake/utf8", _fake_decode)


def attach_blob(df: DataFrame, text_col: str = "text", fmt: str = "fake/utf8") -> DataFrame:
    """Synthesize an opaque media column + typed metadata from text (the
    corpus has no real media; the plumbing is format-agnostic)."""
    return df.withColumn("blob", F.encode(F.col(text_col), "utf-8")).withColumn(
        "media_format", F.lit(fmt)
    )


def decode_metadata(df: DataFrame, blob_col: str = "blob", fmt_col: str = "media_format") -> DataFrame:
    """mapInPandas decode: Arrow batches in, metadata columns appended.
    Unknown formats raise NotImplementedError (stub boundary)."""
    keep_cols = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", " + META_SCHEMA

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for blob, fmt in zip(pdf[blob_col], pdf[fmt_col]):
                decoder = _DECODERS.get(fmt)
                if decoder is None:
                    raise NotImplementedError(
                        f"no decoder for media format {fmt!r}; register one via register_decoder"
                    )
                metas.append(decoder(bytes(blob)))
            meta_df = pd.DataFrame(metas)
            yield pd.concat([pdf[keep_cols].reset_index(drop=True), meta_df], axis=1)

    return df.mapInPandas(decode, schema=out_schema)


def extract_features(df: DataFrame, blob_col: str = "blob", bins: int = 16) -> DataFrame:
    """Feature extraction over opaque media: a ``bins``-bucket byte
    histogram per blob (deterministic stand-in for an image embedding;
    swap the inner function for a real model). Arrow-batched mapInPandas;
    appends ``features array<double>``."""
    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", features array<double>"

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for blob in pdf[blob_col]:
                b = bytes(blob)
                hist = [0] * bins
                for byte in b:
                    hist[byte * bins // 256] += 1
                n = max(len(b), 1)
                feats.append([h / n for h in hist])
            yield pdf[keep_cols].assign(features=feats)

    return df.mapInPandas(featurize, schema=out_schema)


def resize_stub(df: DataFrame, width: int, height: int, blob_col: str = "blob") -> DataFrame:
    """Resize plumbing: real image resampling needs an imaging library
    (absent here — STUB). The deterministic fake truncates/pads the
    payload to width*height bytes so the batch shapes, schema, and
    downstream plumbing are real and tested."""
    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", resized binary, resized_w int, resized_h int"
    target = width * height

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = [
                (bytes(b) * (target // max(len(bytes(b)), 1) + 1))[:target] for b in pdf[blob_col]
            ]
            yield pdf[keep_cols].assign(resized=out, resized_w=width, resized_h=height)

    return df.mapInPandas(resize, schema=out_schema)


def frame_sample(df: DataFrame, every_n: int = 4, frame_size: int = 64, blob_col: str = "blob") -> DataFrame:
    """Video frame sampling plumbing: treat the blob as a sequence of
    fixed-size 'frames' and keep every ``every_n``-th (real codecs —
    ffmpeg — are absent; STUB with deterministic slicing). One output row
    per sampled frame (explode-shaped mapInPandas)."""
    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", frame_no int, frame binary"

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar explode: per-row sampled frame numbers, then one
            # pandas repeat + one concat — no per-row iterrows()
            blobs = [bytes(b) for b in pdf[blob_col]]
            frame_nos = [
                list(range(0, max(len(b) // frame_size, 1), every_n)) for b in blobs
            ]
            counts = [len(f) for f in frame_nos]
            if sum(counts) == 0:
                continue
            flat_nos = [i for nos in frame_nos for i in nos]
            flat_frames = [
                b[i * frame_size : (i + 1) * frame_size]
                for b, nos in zip(blobs, frame_nos)
                for i in nos
            ]
            out = pdf[keep_cols].loc[pdf.index.repeat(counts)].reset_index(drop=True)
            out["frame_no"] = flat_nos
            out["frame"] = flat_frames
            yield out

    return df.mapInPandas(sample, schema=out_schema)
