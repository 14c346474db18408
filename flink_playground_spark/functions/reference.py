"""Python reference oracles for hash-seeded queries.

DuckDB cannot express ``xxhash64``-seeded constructions (SimHash
fingerprints, LSH hyperplanes), which left ``simhash_neardup`` and
``embedding_neardup_lsh`` as rows-only checks in rounds 1-2. These
references replicate the exact math — xxh64 (xxh64_ref.py), IEEE-double
accumulation in Spark's evaluation order, BigDecimal-HALF_UP rounding —
in plain Python over the same parquet, so tools/check.py can do full
value comparison (r2 VERDICT #5).

Determinism notes (why value-equality is sound here):

- every per-vector sum folds sequentially over the posexploded index
  order within one partition partial, so left-to-right Python float
  accumulation reproduces it bit-for-bit;
- ``F.round(x, 6)`` is BigDecimal.valueOf(double).setScale(6, HALF_UP);
  ``Decimal(repr(x))`` parses the same shortest round-trip decimal;
- SimHash banding (4x16-bit pigeonhole) is exact for Hamming <= 3, so a
  brute-force pair scan is the same answer.
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from flink_playground_spark.functions.xxh64_ref import spark_xxhash64

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def spark_round(x: float, scale: int = 6) -> float:
    """Spark's ``round(double, scale)``: HALF_UP on the shortest
    round-trip decimal representation."""
    return float(Decimal(repr(float(x))).quantize(Decimal(f"1e-{scale}"), ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# simhash_neardup: functions/dedupe.py simhash_fingerprints + simhash_pairs
# ---------------------------------------------------------------------------


def simhash_fingerprint_ref(text: str, bits: int = 64) -> int:
    """Signed 64-bit SimHash identical to simhash_fingerprints()."""
    counts = [0] * bits
    for tok in _TOKEN_RE.findall(text.lower()):
        h = spark_xxhash64(tok)  # signed; >> is arithmetic in both langs
        for i in range(bits):
            counts[i] += 1 if (h >> i) & 1 == 1 else -1
    sh = 0
    for i in range(bits):
        if counts[i] > 0:
            sh |= 1 << i
    return sh - (1 << 64) if sh >= 1 << 63 else sh


def simhash_neardup_ref(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(id_a, id_b, hamming) — equals simhash_pairs(documents) exactly:
    the 4x16-bit banding is a complete candidate generator for
    Hamming <= 3, so the brute-force scan is the same set."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    fps = [
        (int(doc_id), simhash_fingerprint_ref(text))
        for doc_id, text in zip(docs["doc_id"], docs["text"])
    ]
    fps.sort()
    out = []
    mask = (1 << 64) - 1
    for i in range(len(fps)):
        ida, sa = fps[i]
        for j in range(i + 1, len(fps)):
            idb, sb = fps[j]
            ham = ((sa & mask) ^ (sb & mask)).bit_count()
            if ham <= max_hamming:
                out.append((ida, idb, ham))
    return pd.DataFrame(out, columns=["id_a", "id_b", "hamming"]).astype(
        {"id_a": "int64", "id_b": "int64", "hamming": "int32"}
    )


# ---------------------------------------------------------------------------
# embedding_neardup_lsh: functions/similarity.py lsh_buckets + exact cosine
# ---------------------------------------------------------------------------


def _hyperplane_w(t: int, p: int, j: int) -> float:
    """w(t,p,j) = (pmod(xxhash64(t,p,j), 2000001) - 1e6) / 1e6 — Python %
    on a positive modulus equals Spark's pmod for signed longs."""
    return (spark_xxhash64(t, p, j) % 2_000_001 - 1_000_000) / 1_000_000.0


def lsh_bucket_ref(vec, tables: int, planes: int) -> list[tuple[int, int]]:
    """(table, bucket) per hash table for one float32 vector, matching
    lsh_buckets(): sequential double accumulation over j ascending."""
    out = []
    for t in range(tables):
        bucket = 0
        for p in range(planes):
            acc = 0.0
            for j, x in enumerate(vec):
                acc += float(x) * _hyperplane_w(t, p, j)
            bucket = (bucket << 1) | (1 if acc >= 0 else 0)
        out.append((t, bucket))
    return out


def cosine_ref(a, b) -> float:
    """cosine() / cosine_fixed(): left-fold double accumulation."""
    dot = 0.0
    for x, y in zip(a, b):
        dot += float(x) * float(y)
    na = 0.0
    for x in a:
        na += float(x) * float(x)
    nb = 0.0
    for y in b:
        nb += float(y) * float(y)
    return dot / (math.sqrt(na) * math.sqrt(nb))


def embedding_neardup_lsh_ref(
    sf_dir: str, tables: int = 8, planes: int = 4, threshold: float = 0.4
) -> pd.DataFrame:
    """(id_a, id_b, sim) — equals the embedding_neardup_lsh query: bucket
    collisions across tables, exact cosine on candidates, round 6,
    sim >= threshold."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, vec in vecs.items():
        for tb in lsh_bucket_ref(vec, tables, planes):
            buckets.setdefault(tb, []).append(vid)
    cand = set()
    for members in buckets.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                cand.add((members[i], members[j]))
    out = []
    for ida, idb in sorted(cand):
        sim = spark_round(cosine_ref(vecs[ida], vecs[idb]), 6)
        if sim >= threshold:
            out.append((ida, idb, sim))
    return pd.DataFrame(out, columns=["id_a", "id_b", "sim"]).astype(
        {"id_a": "int64", "id_b": "int64", "sim": "float64"}
    )
