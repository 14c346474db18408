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
