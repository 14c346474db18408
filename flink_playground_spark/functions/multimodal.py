"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas`` operators.

The Spark-side machinery (schemas, batch iteration, partition-preserving
transforms) is real and tested. Decoding is REAL for the formats the
Python standard library can parse — ``image/ppm`` (P6 header + RGB
pixels), ``image/bmp`` (BITMAPINFOHEADER), ``audio/wav`` (RIFF via the
stdlib ``wave`` module) — and STUBBED behind
``register_decoder``/``NotImplementedError`` for formats that need
external codecs (JPEG/PNG/ffmpeg are absent in this container), with a
deterministic fake ("fake/utf8") driving the format-agnostic tests and
oracles. The shared META_SCHEMA maps per media type: images use
(width, height) literally; audio reports sample_rate as ``width`` and
channel count as ``height`` (documented convention, one schema for the
whole column). ``resize_nearest`` is a real nearest-neighbor resampler
for decoded P6 pixels.

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


def _ppm_header(blob: bytes) -> tuple[int, int, int]:
    """Parse a binary-PPM (P6) header: magic, whitespace/comment-separated
    width, height, maxval. Returns (width, height, pixel_offset)."""
    if blob[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":  # comment to end of line
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        vals.append(int(blob[i:j]))
        i = j
    return vals[0], vals[1], i + 1  # single whitespace after maxval


def _ppm_decode(blob: bytes) -> dict:
    """REAL decoder: binary PPM (P6). Pure header+length parsing."""
    try:
        w, h, off = _ppm_header(blob)
        valid = len(blob) - off >= 3 * w * h
    except (ValueError, IndexError):
        w = h = 0
        valid = False
    return {
        "byte_len": len(blob),
        "checksum": zlib.crc32(blob),
        "width": w,
        "height": h,
        "valid": valid,
    }


def _bmp_decode(blob: bytes) -> dict:
    """REAL decoder: BMP with a BITMAPINFOHEADER (the common layout) —
    width/height live at fixed little-endian offsets 18/22."""
    import struct

    valid = len(blob) >= 26 and blob[:2] == b"BM"
    w = h = 0
    if valid:
        w, h = struct.unpack_from("<ii", blob, 18)
        h = abs(h)  # top-down bitmaps store negative height
        valid = w > 0 and h > 0
    return {
        "byte_len": len(blob),
        "checksum": zlib.crc32(blob),
        "width": w,
        "height": h,
        "valid": valid,
    }


def _wav_decode(blob: bytes) -> dict:
    """REAL decoder: RIFF/WAVE via the stdlib ``wave`` module. Audio has
    no pixel dims; by documented convention width=sample_rate,
    height=channels."""
    import io
    import wave as wave_mod

    try:
        with wave_mod.open(io.BytesIO(blob), "rb") as w:
            rate, chans = w.getframerate(), w.getnchannels()
        valid = True
    except (wave_mod.Error, EOFError):
        rate = chans = 0
        valid = False
    return {
        "byte_len": len(blob),
        "checksum": zlib.crc32(blob),
        "width": rate,
        "height": chans,
        "valid": valid,
    }


register_decoder("image/ppm", _ppm_decode)
register_decoder("image/bmp", _bmp_decode)
register_decoder("audio/wav", _wav_decode)


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


def resize_nearest(df: DataFrame, width: int, height: int, blob_col: str = "blob") -> DataFrame:
    """REAL nearest-neighbor resize for binary-PPM (P6) blobs: decode the
    pixel grid with numpy, index-sample rows/columns to the target size,
    re-emit a valid P6. Non-PPM blobs pass through with ``resized`` NULL
    (valid=false is visible from decode_metadata) — mixed-format columns
    keep flowing. Arrow-batched mapInPandas, vectorized per blob."""
    import numpy as np

    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", resized binary, resized_w int, resized_h int"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = f"P6\n{width} {height}\n255\n".encode()
        ys = (np.arange(height) * 1.0 / height)
        xs = (np.arange(width) * 1.0 / width)
        for pdf in batches:
            out = []
            for b in pdf[blob_col]:
                blob = bytes(b)
                try:
                    w, h, off = _ppm_header(blob)
                    px = np.frombuffer(
                        blob, dtype=np.uint8, count=3 * w * h, offset=off
                    ).reshape(h, w, 3)
                except (ValueError, IndexError):
                    out.append(None)
                    continue
                ri = np.minimum((ys * h).astype(int), h - 1)
                ci = np.minimum((xs * w).astype(int), w - 1)
                out.append(header + px[np.ix_(ri, ci)].tobytes())
            yield pdf[keep_cols].assign(
                resized=out, resized_w=width, resized_h=height
            )

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


def _pooled_gray_sums(px, grid_h: int, grid_w: int):
    """Integer gray-sum pooling: (h, w, 3) uint8 pixels -> per-cell
    (sum, count) over a grid_h x grid_w partition of the image, using
    floor boundaries (row i covers [i*h//grid_h, (i+1)*h//grid_h)).
    Gray is the CHANNEL SUM r+g+b — no division anywhere, so every
    quantity is an exact integer and the hash is bit-reproducible on
    any platform. Returns (sums, counts) as Python-int lists (immune to
    int64 overflow on pathologically large frames)."""
    import numpy as np

    h, w = px.shape[0], px.shape[1]
    gray = px.astype(np.int64).sum(axis=2)
    rb = [i * h // grid_h for i in range(grid_h)] + [h]
    cb = [j * w // grid_w for j in range(grid_w)] + [w]
    sums, counts = [], []
    for i in range(grid_h):
        row = gray[rb[i] : rb[i + 1]]
        for j in range(grid_w):
            cell = row[:, cb[j] : cb[j + 1]]
            sums.append(int(cell.sum()))
            counts.append(cell.size)
    return sums, counts


def _ahash64(blob: bytes) -> int | None:
    """aHash: 8x8 pooled gray grid, bit = cell mean > global mean.
    Comparison is cross-multiplied (cell_sum * total_cnt >
    total_sum * cell_cnt) — exact integer math, no float means. Images
    smaller than the grid (or undecodable) hash to None."""
    import numpy as np

    try:
        w, h, off = _ppm_header(blob)
    except (ValueError, IndexError):
        return None
    if w < 8 or h < 8 or len(blob) - off < 3 * w * h:
        return None
    px = np.frombuffer(blob, dtype=np.uint8, count=3 * w * h, offset=off).reshape(h, w, 3)
    sums, counts = _pooled_gray_sums(px, 8, 8)
    total_sum, total_cnt = sum(sums), sum(counts)
    hv = 0
    for b, (s, c) in enumerate(zip(sums, counts)):
        if s * total_cnt > total_sum * c:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def _dhash64(blob: bytes) -> int | None:
    """dHash: 8x9 pooled gray grid, bit = left cell mean > right
    neighbor's (gradient direction survives resizing better than
    absolute brightness). Same exact-integer comparison as aHash."""
    import numpy as np

    try:
        w, h, off = _ppm_header(blob)
    except (ValueError, IndexError):
        return None
    if w < 9 or h < 8 or len(blob) - off < 3 * w * h:
        return None
    px = np.frombuffer(blob, dtype=np.uint8, count=3 * w * h, offset=off).reshape(h, w, 3)
    sums, counts = _pooled_gray_sums(px, 8, 9)
    hv = 0
    for i in range(8):
        for j in range(8):
            a, b = i * 9 + j, i * 9 + j + 1
            if sums[a] * counts[b] > sums[b] * counts[a]:
                hv |= 1 << (i * 8 + j)
    return hv - (1 << 64) if hv >= 1 << 63 else hv


_PHASHERS: dict[str, Callable[[bytes], int | None]] = {"ahash": _ahash64, "dhash": _dhash64}


def perceptual_hash(df: DataFrame, blob_col: str = "blob", kind: str = "ahash") -> DataFrame:
    """Perceptual image hash over a binary-PPM column: appends
    ``phash bigint`` (signed 64, NULL for undecodable / sub-grid
    images). Feed the result to ``dedupe.hamming_band_pairs`` for
    banded near-duplicate detection — the image analogue of SimHash.

    aHash/dHash pool the image to a tiny gray grid, so the hash is
    invariant to resizing (any resample that preserves region means)
    and robust to small local edits — the first dedup pass a multimodal
    training corpus needs (catch re-encoded/resized copies before
    embedding-level near-dup). All-integer math: bit-exact against the
    pure-Python reference.

    At scale: ONE Arrow-batched mapInPandas pass over the blobs, no
    shuffle; downstream banding sees only (id, 8-byte hash) — the blobs
    never move again."""
    hasher = _PHASHERS[kind]
    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", phash bigint"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [hasher(bytes(b)) for b in pdf[blob_col]]
            yield pdf[keep_cols].assign(phash=pd.array(hashes, dtype="Int64"))

    return df.mapInPandas(compute, schema=out_schema)


# ---------------------------------------------------------------------------
# Deterministic synthetic image corpus (the testdata has no real media):
# shared INPUT spec for the phash_image_neardup query and its oracle —
# the computation under test (hash + pairing) is implemented twice, the
# input generator once.
# ---------------------------------------------------------------------------

_SM64_MASK = (1 << 64) - 1


def _splitmix64(x: int) -> int:
    """SplitMix64 finalizer (public domain, Steele et al.) — the
    deterministic bit source for synthetic image patterns."""
    x = (x + 0x9E3779B97F4A7C15) & _SM64_MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _SM64_MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _SM64_MASK
    return x ^ (x >> 31)


def _splitmix64_bits(start: int, count: int):
    """LSBs of ``_splitmix64(start + t)`` for ``t in range(count)`` as a
    uint8 numpy array — the vectorized bit source the synth generators
    share. np.uint64 arithmetic wraps mod 2^64 exactly like the masked
    scalar version (pinned by test_synth_numpy_byte_parity)."""
    import numpy as np

    x = np.arange(start, start + count, dtype=np.uint64)
    x = x + np.uint64(0x9E3779B97F4A7C15)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    x = x ^ (x >> np.uint64(31))
    return (x & np.uint64(1)).astype(np.uint8)


_SYNTH_DIMS = ((32, 32), (16, 16), (24, 24))


def synth_block_image(doc_id: int) -> bytes:
    """One P6 blob per document: class ``doc_id // 3`` defines a binary
    8x8 block pattern (bit t = LSB of splitmix64(class*64+t)); member
    ``doc_id % 3`` renders it at 32x32 / 16x16 / 24x24; member 2 also
    flips ``class % 4`` blocks (positions (class + 17*t) % 64). Every
    dimension is a multiple of 8, so mean-pooling is exact per block:
    members 0/1 hash IDENTICALLY despite different resolutions, and
    member 2 sits at a planted Hamming distance of exactly ``class % 4``
    — a ground-truth resized-copy corpus for perceptual-hash dedup."""
    import numpy as np

    cls, member = doc_id // 3, doc_id % 3
    bits = _splitmix64_bits(cls * 64, 64)
    if member == 2:
        for t in range(cls % 4):
            bits[(cls + 17 * t) % 64] ^= 1
    w, h = _SYNTH_DIMS[member]
    # vectorized render, byte-identical to the per-pixel loop (round 13;
    # pinned by test_synth_numpy_byte_parity): pixel (y, x) reads block
    # bit (y*8//h)*8 + (x*8//w), scaled to 0/255, replicated to 3 channels
    grid = (bits * np.uint8(255)).reshape(8, 8)
    ridx = (np.arange(h) * 8) // h
    cidx = (np.arange(w) * 8) // w
    rows = np.repeat(grid[np.ix_(ridx, cidx)][:, :, None], 3, axis=2)
    return f"P6\n{w} {h}\n255\n".encode() + rows.tobytes()


def _wav_pcm16(blob: bytes):
    """Decode a RIFF/WAVE blob to a mono-folded int16 sample array via
    the stdlib wave module (the real decoder — no fake). Returns None
    for undecodable blobs or non-16-bit payloads."""
    import io
    import wave as wave_mod

    import numpy as np

    try:
        with wave_mod.open(io.BytesIO(blob), "rb") as w:
            if w.getsampwidth() != 2:
                return None
            chans = w.getnchannels()
            frames = w.readframes(w.getnframes())
    except (wave_mod.Error, EOFError):
        return None
    samples = np.frombuffer(frames, dtype="<i2")
    if chans > 1:  # fold to mono by channel SUM (integer, exact)
        n = len(samples) // chans
        samples = samples[: n * chans].reshape(n, chans).astype(np.int64).sum(axis=1)
    return samples


def _audiohash64(blob: bytes) -> int | None:
    """Energy-envelope audio fingerprint: fold to mono, partition the
    samples into 64 time windows (floor boundaries), bit = window energy
    above the track's mean energy — the audio analogue of aHash, and
    like it invariant to resampling that preserves the envelope (a
    re-encoded/resampled copy of a track keeps its loud/quiet shape).
    Cross-multiplied integer comparison, no floats: bit-exact against
    the pure-Python reference. Tracks shorter than 64 samples (or
    undecodable) hash to None."""
    import numpy as np

    samples = _wav_pcm16(blob)
    if samples is None or len(samples) < 64:
        return None
    sq = samples.astype(np.int64) ** 2
    n = len(sq)
    bounds = [i * n // 64 for i in range(64)] + [n]
    sums = [int(sq[bounds[i] : bounds[i + 1]].sum()) for i in range(64)]
    counts = [bounds[i + 1] - bounds[i] for i in range(64)]
    total_sum, total_cnt = sum(sums), n
    hv = 0
    for b in range(64):
        if sums[b] * total_cnt > total_sum * counts[b]:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def audio_fingerprint(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Appends ``afp bigint`` — the 64-bit energy-envelope fingerprint —
    to a WAV binary column. Same shape as perceptual_hash: ONE Arrow
    mapInPandas pass, no shuffle; near-dup via dedupe.hamming_band_pairs
    on (id, 8-byte hash) rows only."""
    keep_cols = list(df.columns)
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", afp bigint"

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hashes = [_audiohash64(bytes(b)) for b in pdf[blob_col]]
            yield pdf[keep_cols].assign(afp=pd.array(hashes, dtype="Int64"))

    return df.mapInPandas(compute, schema=out_schema)


_SYNTH_AUDIO_SEG = (32, 16, 24)  # samples per segment for members 0/1/2


def synth_envelope_wav(doc_id: int) -> bytes:
    """One real RIFF/WAVE (16-bit PCM mono) per document, the audio
    counterpart of synth_block_image: class ``doc_id // 3`` defines a
    binary 64-segment loudness envelope (bit t = LSB of
    splitmix64(2^32 + class*64 + t) — offset so image and audio patterns
    differ); member ``doc_id % 3`` renders each segment as a constant-
    amplitude square wave of 32/16/24 samples (total a multiple of 64,
    so the 64 analysis windows align with segments exactly); member 2
    flips ``class % 4`` segments. Members 0/1 fingerprint identically
    at different durations; member 2 sits at Hamming exactly
    ``class % 4``."""
    import io
    import wave as wave_mod

    import numpy as np

    cls, member = doc_id // 3, doc_id % 3
    bits = _splitmix64_bits((1 << 32) + cls * 64, 64)
    if member == 2:
        for t in range(cls % 4):
            bits[(cls + 17 * t) % 64] ^= 1
    seg = _SYNTH_AUDIO_SEG[member]
    # vectorized render, byte-identical to the per-sample loop (round
    # 13; pinned by test_synth_numpy_byte_parity): segment amplitude
    # 12000/2000, sign alternating per sample, int16 little-endian
    amps = np.where(bits.astype(bool), np.int32(12000), np.int32(2000))
    sign = np.where(np.arange(seg) % 2 == 0, np.int32(1), np.int32(-1))
    pcm = (amps[:, None] * sign[None, :]).astype("<i2").tobytes()
    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(bytes(pcm))
    return buf.getvalue()


def _raw_ahash64(frame: bytes, w: int, h: int) -> int | None:
    """aHash over a RAW w x h x 3 RGB frame (no container header) —
    the per-frame kernel for video dedup. Same exact integer pooling
    as _ahash64."""
    import numpy as np

    if w < 8 or h < 8 or len(frame) < 3 * w * h:
        return None
    px = np.frombuffer(frame, dtype=np.uint8, count=3 * w * h).reshape(h, w, 3)
    sums, counts = _pooled_gray_sums(px, 8, 8)
    total_sum, total_cnt = sum(sums), sum(counts)
    hv = 0
    for b, (s, c) in enumerate(zip(sums, counts)):
        if s * total_cnt > total_sum * c:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def frame_phash(
    df: DataFrame,
    every_n: int = 2,
    frame_w: int = 8,
    frame_h: int = 8,
    blob_col: str = "blob",
) -> DataFrame:
    """Video fingerprinting: sample every ``every_n``-th fixed-size frame
    and perceptual-hash it, FUSED in one Arrow pass. Output one row per
    sampled frame: original non-blob columns + ``frame_no int, fhash
    bigint`` (NULL for short frames). A video's near-dup signature is
    its DISTINCT fhash set — scene content, not frame count, so
    re-timed/re-sampled copies keep their signature.

    Sampling mirrors ``frame_sample``'s contract exactly (same frame_no
    grid, same tail-slice semantics — pinned by a test), but the fusion
    is the scale-relevant part: composing frame_sample ∘ hash replicates
    the FULL source blob onto every sampled frame row across two Arrow
    boundaries (at the 10x fixture: 1.2M rows x ~4.6KB video = ~5.5GB
    serialized twice, 87s); fused, neither blobs nor frame payloads ever
    leave Python — only (id, frame_no, 8-byte hash) rows do."""
    import numpy as np

    keep_cols = [c for c in df.columns if c != blob_col]
    out_schema = ", ".join(
        f"`{c}` {df.schema[c].dataType.simpleString()}" for c in keep_cols
    ) + ", frame_no int, fhash bigint"
    fs = 3 * frame_w * frame_h
    pows = (np.uint64(1) << np.arange(64, dtype=np.uint64))

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = [bytes(b) for b in pdf[blob_col]]
            frame_nos = [
                list(range(0, max(len(b) // fs, 1), every_n)) for b in blobs
            ]
            counts = [len(f) for f in frame_nos]
            if sum(counts) == 0:
                continue
            flat_nos = [i for nos in frame_nos for i in nos]
            flat_frames = [
                b[i * fs : (i + 1) * fs]
                for b, nos in zip(blobs, frame_nos)
                for i in nos
            ]
            if frame_w == 8 and frame_h == 8 and all(len(f) == fs for f in flat_frames):
                # vectorized fast path: an 8x8 frame IS the pooled grid,
                # so the whole batch hashes in a handful of numpy ops —
                # bit-identical to _raw_ahash64 (same integer compare,
                # gray*64 > total_gray, cell counts all 1)
                px = np.frombuffer(b"".join(flat_frames), dtype=np.uint8).reshape(-1, 64, 3)
                gray = px.sum(axis=2, dtype=np.int64)
                total = gray.sum(axis=1, keepdims=True)
                bits = (gray * 64 > total).astype(np.uint64)
                hv = (bits * pows).sum(axis=1, dtype=np.uint64).view(np.int64)
                hashes = pd.array(hv, dtype="Int64")
            else:
                hashes = pd.array(
                    [_raw_ahash64(f, frame_w, frame_h) for f in flat_frames],
                    dtype="Int64",
                )
            out = pdf[keep_cols].loc[pdf.index.repeat(counts)].reset_index(drop=True)
            out["frame_no"] = flat_nos
            out["fhash"] = hashes
            yield out

    return df.mapInPandas(compute, schema=out_schema)


_SYNTH_SCENE_DUR = (2, 4, 3)  # frames per scene for members 0/1/2


def synth_scene_video(doc_id: int) -> bytes:
    """One raw 'video' per document (concatenated 8x8x3 RGB frames, the
    container format frame_sample models): class ``doc_id // 3`` defines
    16 scenes, each an 8x8 binary block pattern (bit t of scene s = LSB
    of splitmix64(2^33 + (class*16+s)*64 + t)); member ``doc_id % 3``
    holds every scene for 2/4/3 frames (a re-timed copy — every duration
    >= the default frame-sampling stride, so each scene survives
    sampling); member 2 replaces scene ``class % 16`` with the class's
    alternate pattern (slot 16). Members 0/1 have IDENTICAL distinct
    frame-hash sets; member 2 shares 15 of 16 scenes: Jaccard 15/17."""
    import numpy as np

    cls, member = doc_id // 3, doc_id % 3
    # 16 scenes + 1 alternate, all 17×64 bits from one vectorized
    # splitmix pass; byte-identical to the per-pixel loop (round 13;
    # pinned by test_synth_numpy_byte_parity)
    bits = _splitmix64_bits((1 << 33) + cls * 17 * 64, 17 * 64).reshape(17, 64)
    px = np.repeat((bits * np.uint8(255))[:, :, None], 3, axis=2)
    scenes = [px[s].tobytes() for s in range(17)]
    order = list(range(16))
    if member == 2:
        order[cls % 16] = 16  # the alternate scene
    dur = _SYNTH_SCENE_DUR[member]
    return b"".join(scenes[s] * dur for s in order)
