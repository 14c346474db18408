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
    # token-less documents produce NO fingerprint row in Spark (the
    # explode drops them); fingerprint 0 here would fabricate pairs
    fps = [
        (int(doc_id), simhash_fingerprint_ref(text))
        for doc_id, text in zip(docs["doc_id"], docs["text"])
        if _TOKEN_RE.search(text.lower())
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


def _emb_lsh_pairs_ref(
    vecs: dict, tables: int, planes: int, threshold: float
) -> pd.DataFrame:
    """(id_a, id_b, sim) over a {vid: vector} dict: bucket collisions
    across tables, exact cosine on candidates, round 6, sim >=
    threshold — the shared pair core of embedding_neardup_lsh_ref and
    streaming_embedding_update_ref."""
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


def _emb_vecs_ref(sf_dir: str) -> dict:
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    return {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}


def embedding_neardup_lsh_ref(
    sf_dir: str, tables: int = 8, planes: int = 4, threshold: float = 0.4
) -> pd.DataFrame:
    """(id_a, id_b, sim) — equals the embedding_neardup_lsh query: bucket
    collisions across tables, exact cosine on candidates, round 6,
    sim >= threshold."""
    return _emb_lsh_pairs_ref(_emb_vecs_ref(sf_dir), tables, planes, threshold)


def streaming_embedding_capped_ref(
    sf_dir: str,
    tables: int = 8,
    planes: int = 4,
    threshold: float = 0.4,
    max_bucket: int = 48,
    waves: int = 3,
) -> pd.DataFrame:
    """(id_a, id_b, sim) — the drained answer of StreamingCosineLSHIndex
    with the bucket cap ARMED (queries.py streaming_embedding_neardup_
    capped), under the documented cap semantics: per wave, a touched
    bucket whose accumulated distinct-doc occupancy (stored docs ∪ wave
    docs) first crosses ``max_bucket`` overflows from that wave on —
    the wave's rows in overflowed buckets are excluded BEFORE candidate
    generation and never stored, pairs emitted before the crossing are
    never retracted, and stored rows of earlier waves stay (they are
    excluded from candidate joins, not rewritten). An independent
    simulation of that contract (dict-of-sets wave fold, not the
    ledger machinery) — the first ORACLE-grade pin of the cap protocol
    (the other families pin it in unit tests only)."""
    vecs = _emb_vecs_ref(sf_dir)
    committed: dict[tuple[int, int], list[int]] = {}
    overflowed: set[tuple[int, int]] = set()
    pairs: dict[tuple[int, int], float] = {}
    for w in range(waves):
        wave_ids = sorted(v for v in vecs if v % waves == w)
        wave_buckets: dict[tuple[int, int], list[int]] = {}
        for vid in wave_ids:
            for tb in lsh_bucket_ref(vecs[vid], tables, planes):
                wave_buckets.setdefault(tb, []).append(vid)
        # crossing detection over touched, not-yet-overflowed buckets
        for tb, members in wave_buckets.items():
            if tb in overflowed:
                continue
            if len(set(committed.get(tb, ())) | set(members)) > max_bucket:
                overflowed.add(tb)
        # candidates from surviving buckets: within-wave + wave x state
        for tb, members in wave_buckets.items():
            if tb in overflowed:
                continue
            cohort = sorted(members)
            for i in range(len(cohort)):
                for j in range(i + 1, len(cohort)):
                    pairs.setdefault((cohort[i], cohort[j]), 0.0)
            for m in cohort:
                for s in committed.get(tb, ()):
                    if s != m:
                        pairs.setdefault((min(m, s), max(m, s)), 0.0)
            committed.setdefault(tb, []).extend(cohort)
    out = []
    for ida, idb in sorted(pairs):
        sim = spark_round(cosine_ref(vecs[ida], vecs[idb]), 6)
        if sim >= threshold:
            out.append((ida, idb, sim))
    return pd.DataFrame(out, columns=["id_a", "id_b", "sim"]).astype(
        {"id_a": "int64", "id_b": "int64", "sim": "float64"}
    )


def streaming_embedding_update_ref(
    sf_dir: str, tables: int = 8, planes: int = 4, threshold: float = 0.4
) -> pd.DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) — the drained
    answer of the EMBEDDING pipeline AFTER the update wave (queries.py
    streaming_embedding_update_pipeline): vectors with vec_id % 11 == 7
    carry the embedding of vec_id - 1 (when it exists), everything else
    their own. Same pair core as embedding_neardup_lsh_ref over the
    POST-update vectors + the shared union-find tail — updates are
    implementation, the drained state is pure batch semantics over the
    final corpus."""
    vecs = _emb_vecs_ref(sf_dir)
    post = {
        vid: (vecs[vid - 1] if vid % 11 == 7 and (vid - 1) in vecs else v)
        for vid, v in vecs.items()
    }
    pairs = _emb_lsh_pairs_ref(post, tables, planes, threshold)
    return _unionfind_clusters(pairs[["id_a", "id_b"]])


# ---------------------------------------------------------------------------
# ann_topk: functions/similarity.py lsh_topk + ivf_topk (queries.py ann_topk)
# ---------------------------------------------------------------------------


def _topk_ref(cand_sims: dict, k: int) -> list[tuple[int, int, float, int]]:
    """(query, neighbor, sim, rank): row_number over (sim DESC,
    neighbor ASC) per query, rank <= k — the exact window in
    lsh_topk/ivf_topk."""
    out = []
    for q in sorted(cand_sims):
        ranked = sorted(cand_sims[q].items(), key=lambda it: (-it[1], it[0]))
        for rank, (nb, sim) in enumerate(ranked[:k], start=1):
            out.append((q, nb, sim, rank))
    return out


def _decimal_mean_ref(vals: list[float]) -> float:
    """kmeans_centroids' per-dim mean: each double is cast to
    decimal(30,12) (HALF_UP on the shortest round-trip repr — Spark's
    double→decimal cast), summed exactly, cast back to double, divided
    by the count in double. Order-independent by construction."""
    q = Decimal("1e-12")
    s = Decimal(0)
    for v in vals:
        s += Decimal(repr(float(v))).quantize(q, ROUND_HALF_UP)
    return float(s) / len(vals)


def _ivf_assign_ref(vecs: dict, cents: dict, nprobe: int) -> dict:
    """vid -> list of nprobe nearest centroid ids (csim DESC, id ASC) —
    ivf_assign()'s rank window."""
    out = {}
    for vid, vec in vecs.items():
        scored = sorted(
            ((cid, cosine_ref(vec, cv)) for cid, cv in cents.items()),
            key=lambda it: (-it[1], it[0]),
        )
        out[vid] = [cid for cid, _ in scored[:nprobe]]
    return out


def kmeans_centroids_ref(
    vecs: dict, n_centroids: int, iters: int
) -> dict:
    """kmeans_centroids(): seeds = the n_centroids lowest vector ids,
    then `iters` rounds of assign-to-nearest + exact-decimal per-dim
    mean. Empty cells drop out."""
    seed_ids = sorted(vecs)[:n_centroids]
    cents = {vid: [float(x) for x in vecs[vid]] for vid in seed_ids}
    for _ in range(iters):
        members: dict[int, list] = {}
        for vid, cids in _ivf_assign_ref(vecs, cents, 1).items():
            members.setdefault(cids[0], []).append(vecs[vid])
        cents = {
            cid: [
                _decimal_mean_ref([float(v[d]) for v in vs])
                for d in range(len(vs[0]))
            ]
            for cid, vs in members.items()
        }
    return cents


def ann_topk_ref(
    sf_dir: str,
    k: int = 5,
    tables: int = 8,
    planes: int = 4,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    probe_below: int = 8,
) -> pd.DataFrame:
    """(method, query_id, neighbor_id, sim, rank) — equals the ann_topk
    query exactly: union of the hyperplane-LSH and IVF candidate paths,
    exact cosine on candidates, round 6, per-query top-k."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    probes = {vid: v for vid, v in vecs.items() if vid < probe_below}

    def collect(cand_pairs):
        sims: dict[int, dict[int, float]] = {}
        for q, nb in cand_pairs:
            sims.setdefault(q, {})[nb] = spark_round(
                cosine_ref(probes[q], vecs[nb]), 6
            )
        return sims

    # LSH branch: bucket collisions across tables
    buckets: dict[tuple[int, int], list[int]] = {}
    for vid, vec in vecs.items():
        for tb in lsh_bucket_ref(vec, tables, planes):
            buckets.setdefault(tb, []).append(vid)
    lsh_cand = set()
    for vid, vec in probes.items():
        for tb in lsh_bucket_ref(vec, tables, planes):
            for nb in buckets.get(tb, ()):
                if nb != vid:
                    lsh_cand.add((vid, nb))
    lsh_rows = _topk_ref(collect(lsh_cand), k)

    # IVF branch: probe nprobe cells of the Lloyd-refined geometry
    cents = kmeans_centroids_ref(vecs, n_centroids, kmeans_iters)
    cells = _ivf_assign_ref(vecs, cents, 1)
    inv: dict[int, list[int]] = {}
    for vid, cids in cells.items():
        inv.setdefault(cids[0], []).append(vid)
    ivf_cand = set()
    for vid in probes:
        for cid in _ivf_assign_ref({vid: probes[vid]}, cents, nprobe)[vid]:
            for nb in inv.get(cid, ()):
                if nb != vid:
                    ivf_cand.add((vid, nb))
    ivf_rows = _topk_ref(collect(ivf_cand), k)

    rows = [("lsh", *r) for r in lsh_rows] + [("ivf", *r) for r in ivf_rows]
    return pd.DataFrame(
        rows, columns=["method", "query_id", "neighbor_id", "sim", "rank"]
    ).astype(
        {
            "method": "string",
            "query_id": "int64",
            "neighbor_id": "int64",
            "sim": "float64",
            "rank": "int32",
        }
    )


# ---------------------------------------------------------------------------
# corpus_similarity: per-source shingle sets, corpus-level MinHash vs exact
# ---------------------------------------------------------------------------


def _shingle_hashes_ref(text: str, n: int = 3) -> set[int]:
    """shingle_index(): xxhash64 of the space-joined lowercase-token
    n-gram."""
    toks = _TOKEN_RE.findall(text.lower())
    return {
        spark_xxhash64(" ".join(toks[i : i + n]))
        for i in range(len(toks) - n + 1)
    }


def corpus_similarity_ref(sf_dir: str, k: int = 64) -> pd.DataFrame:
    """(src_a, src_b, est_jaccard, exact_jaccard) — equals the
    corpus_similarity query: per-source shingle sets, K-permutation
    corpus MinHash signatures (min over xxhash64(shingle, i)), exact
    Jaccard, round 6."""
    from flink_playground_spark.functions.xxh64_ref import Long

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    sets: dict[str, set[int]] = {}
    for r in docs.itertuples():
        sets.setdefault(str(r.source), set()).update(_shingle_hashes_ref(r.text))
    # a source with no >=3-token documents has no shingles and no
    # signature — Spark's aggregate drops it, so drop it here too
    sets = {src: shs for src, shs in sets.items() if shs}
    sigs = {
        src: [min(spark_xxhash64(Long(sh), i) for sh in shs) for i in range(k)]
        for src, shs in sets.items()
    }
    out = []
    for sa in sorted(sets):
        for sb in sorted(sets):
            if sa >= sb:
                continue
            inter = len(sets[sa] & sets[sb])
            union = len(sets[sa] | sets[sb])
            est = sum(1 for i in range(k) if sigs[sa][i] == sigs[sb][i]) / k
            out.append((sa, sb, est, spark_round(inter / union, 6)))
    return pd.DataFrame(
        out, columns=["src_a", "src_b", "est_jaccard", "exact_jaccard"]
    ).astype(
        {
            "src_a": "string",
            "src_b": "string",
            "est_jaccard": "float64",
            "exact_jaccard": "float64",
        }
    )


# ---------------------------------------------------------------------------
# doc_centrality: operators/graph.py pagerank over ngram_jaccard_pairs
# ---------------------------------------------------------------------------


def doc_centrality_ref(
    sf_dir: str,
    n: int = 3,
    threshold: float = 0.5,
    damping_pct: int = 85,
    iterations: int = 10,
) -> pd.DataFrame:
    """(doc_id, rank) — equals pagerank(ngram_jaccard_pairs(documents,
    t=0.5)) bit-exactly: the pair set replays the engine's rounded-
    Jaccard filter (round6(inter/union) >= t, same spark_round), and the
    fixed-point power iteration uses the same integer div/damping math,
    which is aggregation-order-free by construction."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    sh: dict[int, set] = {}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = _TOKEN_RE.findall(text.lower())
        grams = {tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)}
        if grams:
            sh[int(doc_id)] = grams
    ids = sorted(sh)
    adj: dict[int, set] = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if inter == 0:
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            if spark_round(inter / union, 6) >= threshold:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
    nodes = sorted(adj)
    unit = 1_000_000
    base = unit * (100 - damping_pct) // 100
    pr = {v: unit for v in nodes}
    for _ in range(iterations):
        inflow = dict.fromkeys(nodes, 0)
        for u in nodes:
            c = pr[u] // len(adj[u])
            for v in adj[u]:
                inflow[v] += c
        pr = {v: base + (inflow[v] * damping_pct) // 100 for v in nodes}
    return pd.DataFrame(
        {"doc_id": nodes, "rank": [pr[v] for v in nodes]}
    ).astype({"doc_id": "int64", "rank": "int64"})


# ---------------------------------------------------------------------------
# ann_pq_topk: functions/similarity.py pq_train/pq_encode/pq_topk
# ---------------------------------------------------------------------------


def _l2_sq_ref(a, b) -> float:
    """_l2_sq_fixed(): left-fold (x - c)^2 accumulation in double."""
    acc = 0.0
    for x, c in zip(a, b):
        d = float(x) - float(c)
        acc += d * d
    return acc


def _dot_ref(a, b) -> float:
    """dot_fixed(): left-fold double accumulation."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def pq_train_ref(vecs: dict, dim: int, m: int, k: int, iters: int) -> dict:
    """pq_train(): (sub, code) -> codeword. Seeds = the k lowest vector
    ids' subvector slices; Lloyd rounds assign by unrolled L2 (tie ->
    code ASC) and recompute exact-decimal per-dim means; a codeword that
    loses all members drops out."""
    sub_len = dim // m
    seed_ids = sorted(vecs)[:k]
    book = {
        (s, c): [float(x) for x in vecs[vid][s * sub_len : (s + 1) * sub_len]]
        for c, vid in enumerate(seed_ids)
        for s in range(m)
    }
    for _ in range(iters):
        members: dict[tuple[int, int], list] = {}
        for vid in vecs:
            for s in range(m):
                sv = vecs[vid][s * sub_len : (s + 1) * sub_len]
                best = min(
                    (c for (ss, c) in book if ss == s),
                    key=lambda c: (_l2_sq_ref(sv, book[(s, c)]), c),
                )
                members.setdefault((s, best), []).append(sv)
        book = {
            sc: [
                _decimal_mean_ref([float(v[d]) for v in vs])
                for d in range(len(vs[0]))
            ]
            for sc, vs in members.items()
        }
    return book


def pq_encode_ref(vecs: dict, book: dict, dim: int, m: int) -> dict:
    """pq_encode(): vid -> [code per sub]."""
    sub_len = dim // m
    out = {}
    for vid in vecs:
        codes = []
        for s in range(m):
            sv = vecs[vid][s * sub_len : (s + 1) * sub_len]
            codes.append(
                min(
                    (c for (ss, c) in book if ss == s),
                    key=lambda c: (_l2_sq_ref(sv, book[(s, c)]), c),
                )
            )
        out[vid] = codes
    return out


def pq_topk_ref(
    sf_dir: str,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    iters: int = 2,
    probe_below: int = 8,
) -> pd.DataFrame:
    """(query_id, neighbor_id, sim, rank) — equals the ann_pq_topk query
    exactly: ADC lookup-table scoring over PQ codes, cosine vs the
    reconstructed vector, round 6, per-query top-k."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    probes = {vid: v for vid, v in vecs.items() if vid < probe_below}
    sub_len = dim // m

    book = pq_train_ref(vecs, dim, m, n_codes, iters)
    codes = pq_encode_ref(vecs, book, dim, m)
    return _pq_adc_ref(probes, book, codes, dim, m, k)


def _pq_adc_ref(
    probes: dict, book: dict, codes: dict, dim: int, m: int, k: int
) -> pd.DataFrame:
    """pq_adc_topk(): ADC lookup-table scoring + per-query top-k —
    shared by the batch (pq_topk_ref) and streaming-index references."""
    sub_len = dim // m
    sims: dict[int, dict[int, float]] = {}
    for q, qvec in probes.items():
        lut, cwn2 = {}, {}
        for (s, c), cw in book.items():
            qs = qvec[s * sub_len : (s + 1) * sub_len]
            lut[(s, c)] = _dot_ref(qs, cw)
            cwn2[(s, c)] = _dot_ref(cw, cw)
        qn = 0.0
        for x in qvec:
            qn += float(x) * float(x)
        qnorm = math.sqrt(qn)
        for vid, vcodes in codes.items():
            if vid == q:
                continue
            raw = 0.0
            n2 = 0.0
            for s in range(m):
                raw += lut[(s, vcodes[s])]
                n2 += cwn2[(s, vcodes[s])]
            sims.setdefault(q, {})[vid] = spark_round(raw / (qnorm * math.sqrt(n2)), 6)

    rows = _topk_ref(sims, k)
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim", "rank"]).astype(
        {"query_id": "int64", "neighbor_id": "int64", "sim": "float64", "rank": "int32"}
    )


def ivfpq_topk_ref(
    sf_dir: str,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    iters: int = 2,
    probe_below: int = 8,
) -> pd.DataFrame:
    """ivfpq_topk(): coarse Lloyd cells + residual-PQ ADC (IVFADC).
    Mirrors every fold of the Spark plan: kmeans_centroids_ref geometry,
    nprobe=1 cell argmax, residual = float(x) − centroid[d] elementwise,
    pq_train_ref/pq_encode_ref over residuals, and the decomposed cosine
      (dot(q,c) + Σ_s lut) / (|q| · sqrt((|c|² + 2·Σ_s cdot) + Σ_s cwn2))
    with all three Σ folding s ASC from 0.0, HALF_UP round 6."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    sub_len = dim // m

    cents = kmeans_centroids_ref(vecs, n_centroids, kmeans_iters)
    cell = {vid: cids[0] for vid, cids in _ivf_assign_ref(vecs, cents, 1).items()}
    resid = {
        vid: [float(x) - cents[cell[vid]][d] for d, x in enumerate(vecs[vid])]
        for vid in vecs
    }
    book = pq_train_ref(resid, dim, m, n_codes, iters)
    codes = pq_encode_ref(resid, book, dim, m)
    inv: dict[int, list[int]] = {}
    for vid, cid in cell.items():
        inv.setdefault(cid, []).append(vid)
    # FAISS-style precomputed table: dot(centroid_sub, codeword) per
    # (cell, sub, code), plus |centroid|² — both bounded, both the exact
    # dot_fixed fold
    cdot = {
        (cid, s, c): _dot_ref(cents[cid][s * sub_len : (s + 1) * sub_len], cw)
        for cid in cents
        for (s, c), cw in book.items()
    }
    cn2 = {cid: _dot_ref(cents[cid], cents[cid]) for cid in cents}

    probes = {vid: v for vid, v in vecs.items() if vid < probe_below}
    sims: dict[int, dict[int, float]] = {}
    for q, qvec in probes.items():
        lut, cwn2 = {}, {}
        for (s, c), cw in book.items():
            lut[(s, c)] = _dot_ref(qvec[s * sub_len : (s + 1) * sub_len], cw)
            cwn2[(s, c)] = _dot_ref(cw, cw)
        qn = 0.0
        for x in qvec:
            qn += float(x) * float(x)
        qnorm = math.sqrt(qn)
        for cid in _ivf_assign_ref({q: qvec}, cents, nprobe)[q]:
            qc = _dot_ref(qvec, cents[cid])
            for vid in inv.get(cid, ()):
                if vid == q or vid not in codes:
                    continue
                vc = codes[vid]
                raw = 0.0
                cds = 0.0
                n2 = 0.0
                for s in range(m):
                    raw += lut[(s, vc[s])]
                    n2 += cwn2[(s, vc[s])]
                    cds += cdot[(cid, s, vc[s])]
                sims.setdefault(q, {})[vid] = spark_round(
                    (qc + raw) / (qnorm * math.sqrt((cn2[cid] + 2.0 * cds) + n2)), 6
                )

    rows = _topk_ref(sims, k)
    return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "sim", "rank"]).astype(
        {"query_id": "int64", "neighbor_id": "int64", "sim": "float64", "rank": "int32"}
    )


def streaming_pq_index_ref(
    sf_dir: str,
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    k: int = 5,
    iters: int = 2,
    probe_below: int = 8,
) -> pd.DataFrame:
    """(query_id, neighbor_id, sim, rank) — equals the
    streaming_ann_pq_topk query exactly: codebooks train on wave 0
    (vec_id % 3 == 0) ONLY, every wave encodes against that frozen
    book, queries ADC-score the full code state
    (streaming/pq_index.py StreamingPQIndex)."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    wave0 = {vid: v for vid, v in vecs.items() if vid % 3 == 0}
    book = pq_train_ref(wave0, dim, m, n_codes, iters)
    codes = pq_encode_ref(vecs, book, dim, m)
    probes = {vid: v for vid, v in vecs.items() if vid < probe_below}
    return _pq_adc_ref(probes, book, codes, dim, m, k)


# ---------------------------------------------------------------------------
# bpe_token_stats: functions/bpe.py learn_bpe + bpe_token_counts
# ---------------------------------------------------------------------------


def _bpe_apply_ref(syms: list[str], left: str, right: str) -> list[str]:
    """_apply_merge(): left-to-right non-overlapping fold."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def bpe_token_stats_ref(
    sf_dir: str,
    n_merges: int = 12,
    min_freq: int = 1,
    max_words: int | None = None,
) -> pd.DataFrame:
    """(token, n) — equals the bpe_token_stats query exactly: integer
    word-frequency BPE, ties to the lexicographically smallest pair.
    ``max_words`` mirrors learn_bpe's vocabulary cap bit-for-bit: merge
    LEARNING sees only the top-N words by (-freq, word); token COUNTING
    still covers the full corpus (bpe.py caps only the driver collect —
    encoding is distributed)."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    freqs: dict[str, int] = {}
    for text in docs.text:
        for w in str(text).strip().split(" "):
            if w:
                freqs[w] = freqs.get(w, 0) + 1
    learn_freqs = freqs
    if max_words is not None:
        kept = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]
        learn_freqs = dict(kept)
    vocab = {w: [*w] for w in learn_freqs}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + learn_freqs[w]
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_freq:
            break
        left, right = best[0]
        merges.append((left, right))
        vocab = {w: _bpe_apply_ref(s, left, right) for w, s in vocab.items()}
    # token counting covers the FULL corpus vocabulary (bpe_token_counts
    # encodes every distinct word); applying the merge list to a fresh
    # word is the same left-to-right fold as the incremental application
    # above, so the uncapped path is bit-identical to the old shape.
    counts: dict[str, int] = {}
    for w, f in freqs.items():
        syms = [*w]
        for left, right in merges:
            syms = _bpe_apply_ref(syms, left, right)
        for t in syms:
            counts[t] = counts.get(t, 0) + f
    return pd.DataFrame(
        sorted(counts.items()), columns=["token", "n"]
    ).astype({"token": "string", "n": "int64"})


# ---------------------------------------------------------------------------
# quality_classifier: functions/classifier.py train_logreg + predict_logreg
# ---------------------------------------------------------------------------


def _dec12(x: float) -> Decimal:
    """Spark's double -> DECIMAL(30,12) cast: HALF_UP quantization of
    the shortest round-trip repr."""
    return Decimal(repr(float(x))).quantize(Decimal("1e-12"), ROUND_HALF_UP)


def quality_classifier_ref(sf_dir: str, iters: int = 8, lr: float = 1.0) -> pd.DataFrame:
    """(doc_id, prob, pred) — equals the quality_classifier query
    exactly: same features, 9dp-rounded sigmoid, DECIMAL(30,12)
    gradient sums, double driver updates, 6dp prediction."""
    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "n_chars"]
    )
    rows = []
    for r in docs.itertuples():
        toks = [t for t in str(r.text).strip().split(" ") if t]
        f1 = float(r.n_chars) / 1000.0
        f2 = len(toks) / 100.0
        f3 = (len(set(toks)) / len(toks)) if toks else 0.0
        y = 1.0 if r.lang == "en" else 0.0
        rows.append((int(r.doc_id), f1, f2, f3, y))
    n = len(rows)
    w = [0.0, 0.0, 0.0, 0.0]

    def sigma9(z: float) -> float:
        return spark_round(1.0 / (1.0 + math.exp(-z)), 9)

    for _ in range(iters):
        sums = [Decimal(0)] * 4
        for _, f1, f2, f3, y in rows:
            z = w[0] + w[1] * f1 + w[2] * f2 + w[3] * f3
            err = sigma9(z) - y
            sums[0] += _dec12(err)
            sums[1] += _dec12(err * f1)
            sums[2] += _dec12(err * f2)
            sums[3] += _dec12(err * f3)
        w = [wi - lr * float(s) / n for wi, s in zip(w, sums)]

    out = []
    for doc_id, f1, f2, f3, _ in rows:
        z = w[0] + w[1] * f1 + w[2] * f2 + w[3] * f3
        prob = spark_round(1.0 / (1.0 + math.exp(-z)), 6)
        out.append((doc_id, prob, 1 if prob >= 0.5 else 0))
    return pd.DataFrame(out, columns=["doc_id", "prob", "pred"]).astype(
        {"doc_id": "int64", "prob": "float64", "pred": "int32"}
    )


# ---------------------------------------------------------------------------
# embedding_pca: functions/pca.py corpus_moments + principal_components +
# pca_project (one-scan scatter matrix, driver-side eigensolve)
# ---------------------------------------------------------------------------


def pca_project_ref(
    sf_dir: str, dim: int = 64, n_components: int = 2, iters: int = 8
) -> pd.DataFrame:
    """(vec_id, pc1, pc2) — equals the embedding_pca query exactly:
    exact-DECIMAL(30,12) raw moments (order-free, so this sequential
    accumulation matches Spark's map-side-combined aggregate bit for
    bit), the same float expression for the centered scatter matrix,
    the same driver-side power iteration (left-fold matrix-vector
    products, 9dp-rounded iterates, re-orthogonalization, first-nonzero-
    positive sign), 6dp left-fold projections."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    vecs = [(int(r.vec_id), [float(x) for x in r.embedding]) for r in emb.itertuples()]
    n = len(vecs)

    # 12dp-quantized coordinates as exact scaled integers — identical
    # to pca.corpus_moments' transform(cast DECIMAL(30,12)) + scaleb(12)
    quants = [[int(_dec12(x[d]).scaleb(12)) for d in range(dim)] for _, x in vecs]
    sums = [0] * dim
    msums = {(d, e): 0 for d in range(dim) for e in range(d, dim)}
    for q in quants:
        for d in range(dim):
            sums[d] += q[d]
            for e in range(d, dim):
                msums[(d, e)] += q[d] * q[e]
    mean = [float(Decimal(sums[d]).scaleb(-12)) / n for d in range(dim)]
    scatter = [[0.0] * dim for _ in range(dim)]
    for d in range(dim):
        for e in range(d, dim):
            c = float(Decimal(msums[(d, e)]).scaleb(-24)) - n * mean[d] * mean[e]
            scatter[d][e] = c
            scatter[e][d] = c

    def score(x, v):
        s = 0.0
        for d in range(dim):
            s = s + (x[d] - mean[d]) * v[d]
        return s

    def r9(x):
        return spark_round(x, 9)

    comps: list[list[float]] = []
    for _ in range(n_components):
        v = [0.0] * dim
        v[0] = 1.0
        accepted = False
        for _ in range(iters):
            u = [0.0] * dim
            for d in range(dim):
                s = 0.0
                for e in range(dim):
                    s = s + scatter[d][e] * v[e]
                u[d] = s
            for w in comps:
                uw = sum(a * b for a, b in zip(u, w))
                u = [a - uw * b for a, b in zip(u, w)]
            norm = math.sqrt(sum(x * x for x in u))
            if norm < 1e-12:
                break
            v = [r9(x / norm) for x in u]
            accepted = True
        if not accepted:
            v = [0.0] * dim  # rank-deficient: zero component, not the raw seed
        for x in v:
            if x != 0.0:
                if x < 0:
                    v = [-y for y in v]
                break
        comps.append(v)

    rows = [
        (vid, *(spark_round(score(x, c), 6) for c in comps)) for vid, x in vecs
    ]
    cols = ["vec_id"] + [f"pc{i + 1}" for i in range(n_components)]
    return pd.DataFrame(rows, columns=cols).astype(
        {"vec_id": "int64", **{f"pc{i + 1}": "float64" for i in range(n_components)}}
    )


# ---------------------------------------------------------------------------
# semantic_clusters: queries.py semantic_clusters (kmeans_centroids +
# ivf_assign keep_sim + decimal-mean cohesion)
# ---------------------------------------------------------------------------


def semantic_clusters_ref(
    sf_dir: str, n_centroids: int = 16, iters: int = 2
) -> pd.DataFrame:
    """(cluster_id, n_members, exemplar_vid, avg_cohesion) — equals the
    semantic_clusters query exactly: Lloyd centroids
    (kmeans_centroids_ref), nearest-cell assignment with the vector's
    cosine against its centroid (ivf_assign keep_sim tie-break: csim
    DESC, centroid_id ASC), per-cluster exact-decimal mean of csim
    rounded at 6 (the quantization-fit signal the drift monitors use)."""
    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    cents = kmeans_centroids_ref(vecs, n_centroids, iters)
    members: dict[int, list[tuple[int, float]]] = {}
    for vid, vec in vecs.items():
        cid, csim = min(
            ((cid, cosine_ref(vec, cv)) for cid, cv in cents.items()),
            key=lambda it: (-it[1], it[0]),
        )
        members.setdefault(cid, []).append((vid, csim))
    rows = [
        (
            cid,
            len(mem),
            min(v for v, _ in mem),
            spark_round(_decimal_mean_ref([s for _, s in mem]), 6),
        )
        for cid, mem in sorted(members.items())
    ]
    return pd.DataFrame(
        rows, columns=["cluster_id", "n_members", "exemplar_vid", "avg_cohesion"]
    ).astype(
        {
            "cluster_id": "int64",
            "n_members": "int64",
            "exemplar_vid": "int64",
            "avg_cohesion": "float64",
        }
    )


# ---------------------------------------------------------------------------
# ann_recall_report: queries.py ann_recall_report (per-method recall@k of
# every ANN family vs the exact brute-force top-k)
# ---------------------------------------------------------------------------


def ann_recall_report_ref(sf_dir: str, k: int = 5, probe_below: int = 8) -> pd.DataFrame:
    """(method, returned, matched, recall_at_k) — equals the
    ann_recall_report query exactly: exact top-k = brute_force_topk's
    rank rule (sim rounded 6 DESC, neighbor_id ASC, self excluded);
    approx sets from the existing bit-exact references (ann_topk_ref
    lsh/ivf, pq_topk_ref, ivfpq_topk_ref); recall = matched pairs /
    total exact pairs, HALF_UP round 6."""
    emb = pd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vecs = {int(r.vec_id): list(r.embedding) for r in emb.itertuples()}
    probes = {vid: v for vid, v in vecs.items() if vid < probe_below}
    exact: set[tuple[int, int]] = set()
    for qid, qv in probes.items():
        scored = sorted(
            (
                (spark_round(cosine_ref(qv, cv), 6), nb)
                for nb, cv in vecs.items()
                if nb != qid
            ),
            key=lambda it: (-it[0], it[1]),
        )
        exact.update((qid, nb) for _, nb in scored[:k])

    ann = ann_topk_ref(sf_dir)
    parts = [
        ("lsh", ann[ann.method == "lsh"]),
        ("ivf", ann[ann.method == "ivf"]),
        ("pq", pq_topk_ref(sf_dir)),
        ("ivfpq", ivfpq_topk_ref(sf_dir)),
    ]
    rows = []
    for name, df in parts:
        pairs = {(int(q), int(n)) for q, n in zip(df.query_id, df.neighbor_id)}
        matched = len(pairs & exact)
        rows.append(
            (name, len(pairs), matched, spark_round(matched / len(exact), 6))
        )
    return pd.DataFrame(
        rows, columns=["method", "returned", "matched", "recall_at_k"]
    ).astype(
        {
            "method": "object",
            "returned": "int64",
            "matched": "int64",
            "recall_at_k": "float64",
        }
    )


# ---------------------------------------------------------------------------
# phash_image_neardup: functions/multimodal.py perceptual_hash +
# functions/dedupe.py hamming_band_pairs. The INPUT generator
# (synth_block_image) is shared by design; the hash below is an
# INDEPENDENT pure-Python implementation (no numpy, no pooling code
# shared with the operator).
# ---------------------------------------------------------------------------


def ahash64_ref(blob: bytes) -> int | None:
    """Reference aHash: parse the P6 header by hand, pool gray sums with
    plain loops, cross-multiplied integer mean comparison.

    SPEC (r12, ADVICE): the 8x8 pooling grid partitions pixels by the
    FLOOR boundaries cell i = [i*n//8, (i+1)*n//8) on each axis — this
    is the intended specification of the hash for ALL dims, including
    non-multiples of 8, not merely a mirror of the current operator. A
    future operator that pools differently on ragged dims is WRONG and
    must be fixed operator-side; re-aligning this reference to it would
    silently re-absorb the change (the same floor-boundary spec governs
    audiohash64_ref and raw_ahash64_ref)."""
    if blob[:2] != b"P6":
        return None
    vals, i = [], 2
    while len(vals) < 3:
        while i < len(blob) and blob[i : i + 1].isspace():
            i += 1
        if blob[i : i + 1] == b"#":
            while i < len(blob) and blob[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(blob) and not blob[j : j + 1].isspace():
            j += 1
        vals.append(int(blob[i:j]))
        i = j
    w, h, off = vals[0], vals[1], i + 1
    if w < 8 or h < 8 or len(blob) - off < 3 * w * h:
        return None
    sums = [0] * 64
    counts = [0] * 64
    # cell index ((j+1)*8 - 1) // n is the exact inverse of the
    # operator's floor boundaries [i*n//8, (i+1)*n//8) — the SAME grid
    # partition for any n, computed by a different (closed-form) route,
    # so parity holds on non-multiple-of-grid dims too (r11, ADVICE)
    for y in range(h):
        gi = ((y + 1) * 8 - 1) // h
        base = off + 3 * y * w
        for x in range(w):
            gj = ((x + 1) * 8 - 1) // w
            p = base + 3 * x
            sums[gi * 8 + gj] += blob[p] + blob[p + 1] + blob[p + 2]
            counts[gi * 8 + gj] += 3  # count in channel-samples; the
            # operator counts pixels — ratios differ by the constant 3
            # on BOTH sides of the cross-multiplication, so the bits
            # are identical
    total_sum, total_cnt = sum(sums), sum(counts)
    hv = 0
    for b in range(64):
        if sums[b] * total_cnt > total_sum * counts[b]:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def phash_image_neardup_ref(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(id_a, id_b, hamming) — equals the banded Spark query exactly:
    4x16 banding is complete for Hamming <= 3, so brute force over all
    doc pairs is the same set."""
    from flink_playground_spark.functions.multimodal import synth_block_image

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    fps = sorted(
        (int(d), ahash64_ref(synth_block_image(int(d)))) for d in docs["doc_id"]
    )
    fps = [(d, s) for d, s in fps if s is not None]
    mask = (1 << 64) - 1
    out = []
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
# audio_fingerprint_neardup: functions/multimodal.py audio_fingerprint +
# functions/dedupe.py hamming_band_pairs. Input generator
# (synth_envelope_wav) shared by design; the fingerprint below is an
# INDEPENDENT pure-Python implementation (struct unpack + loops, no
# numpy, no code shared with the operator).
# ---------------------------------------------------------------------------


def audiohash64_ref(blob: bytes) -> int | None:
    """Reference energy-envelope fingerprint: stdlib wave decode, plain
    loops, cross-multiplied integer mean comparison."""
    import io
    import struct
    import wave as wave_mod

    try:
        with wave_mod.open(io.BytesIO(blob), "rb") as w:
            if w.getsampwidth() != 2:
                return None
            chans = w.getnchannels()
            frames = w.readframes(w.getnframes())
    except (wave_mod.Error, EOFError):
        return None
    raw = list(struct.unpack(f"<{len(frames) // 2}h", frames))
    if chans > 1:
        n = len(raw) // chans
        raw = [sum(raw[i * chans : (i + 1) * chans]) for i in range(n)]
    n = len(raw)
    if n < 64:
        return None
    sums = [0] * 64
    counts = [0] * 64
    # ((i+1)*64 - 1) // n inverts the operator's floor boundaries
    # [b*n//64, (b+1)*n//64) — same window partition for ANY n, not
    # just multiples of 64 (r11, ADVICE)
    for i, s in enumerate(raw):
        b = ((i + 1) * 64 - 1) // n
        sums[b] += s * s
        counts[b] += 1
    total_sum = sum(sums)
    hv = 0
    for b in range(64):
        if sums[b] * n > total_sum * counts[b]:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def audio_fingerprint_neardup_ref(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(id_a, id_b, hamming) — brute force over all doc pairs; equals the
    banded Spark query exactly (4x16 banding complete for Hamming <= 3)."""
    from flink_playground_spark.functions.multimodal import synth_envelope_wav

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    fps = sorted(
        (int(d), audiohash64_ref(synth_envelope_wav(int(d)))) for d in docs["doc_id"]
    )
    fps = [(d, s) for d, s in fps if s is not None]
    mask = (1 << 64) - 1
    out = []
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
# video_scene_neardup: functions/multimodal.py frame_phash +
# dedupe prefix-filter Jaccard. Input generator (synth_scene_video)
# shared by design; the frame hash + set scan below are INDEPENDENT
# pure Python.
# ---------------------------------------------------------------------------


def raw_ahash64_ref(frame: bytes, w: int = 8, h: int = 8) -> int | None:
    """Reference raw-frame aHash: plain loops over w x h x 3 bytes."""
    if w < 8 or h < 8 or len(frame) < 3 * w * h:
        return None
    sums = [0] * 64
    counts = [0] * 64
    # same closed-form cell index as ahash64_ref: inverts the
    # operator's floor boundaries for any w/h (r11, ADVICE)
    for y in range(h):
        gi = ((y + 1) * 8 - 1) // h
        for x in range(w):
            gj = ((x + 1) * 8 - 1) // w
            p = 3 * (y * w + x)
            sums[gi * 8 + gj] += frame[p] + frame[p + 1] + frame[p + 2]
            counts[gi * 8 + gj] += 3
    total_sum, total_cnt = sum(sums), sum(counts)
    hv = 0
    for b in range(64):
        if sums[b] * total_cnt > total_sum * counts[b]:
            hv |= 1 << b
    return hv - (1 << 64) if hv >= 1 << 63 else hv


def streaming_neardup_pipeline_ref(sf_dir: str) -> pd.DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) — the drained
    end-to-end pipeline answer: batch near-dup pairs (the same brute-
    force Hamming scan as ``phash_image_neardup_ref``) clustered by an
    independent pure-Python union-find with the min-id canonical rule.
    The streaming composition must drain to exactly this — waves, crash
    points and ledger folds are implementation, not semantics."""
    return _unionfind_clusters(phash_image_neardup_ref(sf_dir))


def _unionfind_clusters(pairs: pd.DataFrame) -> pd.DataFrame:
    """(id_a, id_b) pairs → (doc_id, cluster_id, cluster_size,
    is_canonical) via pure-Python union-find, min-id canonical rule —
    the independent cluster tail both pipeline refs share."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["id_a"].tolist(), pairs["id_b"].tolist()):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra  # attach larger root under smaller: root stays min
    comp = {n: find(n) for n in parent}
    sizes: dict[int, int] = {}
    for c in comp.values():
        sizes[c] = sizes.get(c, 0) + 1
    rows = [(n, c, sizes[c], n == c) for n, c in sorted(comp.items())]
    return pd.DataFrame(
        rows, columns=["doc_id", "cluster_id", "cluster_size", "is_canonical"]
    ).astype(
        {"doc_id": "int64", "cluster_id": "int64", "cluster_size": "int64",
         "is_canonical": "bool"}
    )


def streaming_update_pipeline_ref(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """(doc_id, cluster_id, cluster_size, is_canonical) — the drained
    answer of the Hamming pipeline AFTER the update wave (queries.py
    streaming_update_pipeline): docs with doc_id % 11 == 7 carry the
    image of doc_id - 1, everything else its own. Brute-force Hamming
    pairs over the POST-update fingerprints + the shared union-find
    tail — updates are implementation, the drained state is pure batch
    semantics over the final corpus. Input generator
    (synth_block_image) shared by design; the hash and the clustering
    are independent reimplementations."""
    from flink_playground_spark.functions.multimodal import synth_block_image

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    fps = []
    for d in sorted(int(x) for x in docs["doc_id"]):
        src = d - 1 if d % 11 == 7 and d >= 1 else d
        sh = ahash64_ref(synth_block_image(src))
        if sh is not None:
            fps.append((d, sh))
    mask = (1 << 64) - 1
    out = []
    for i in range(len(fps)):
        ida, sa = fps[i]
        for j in range(i + 1, len(fps)):
            idb, sb = fps[j]
            if ((sa & mask) ^ (sb & mask)).bit_count() <= max_hamming:
                out.append((ida, idb))
    return _unionfind_clusters(pd.DataFrame(out, columns=["id_a", "id_b"]))


def video_scene_neardup_ref(
    sf_dir: str, threshold: float = 0.8, every_n: int = 2, frame_size: int = 192
) -> pd.DataFrame:
    """(id_a, id_b, jaccard) — brute force over all doc pairs' distinct
    sampled-frame-hash sets; equals the prefix-filtered Spark query
    exactly (prefix filtering is recall-lossless)."""
    from flink_playground_spark.functions.multimodal import synth_scene_video

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    sigs = []
    for d in sorted(int(x) for x in docs["doc_id"]):
        blob = synth_scene_video(d)
        hs = {
            raw_ahash64_ref(blob[i * frame_size : (i + 1) * frame_size])
            for i in range(0, max(len(blob) // frame_size, 1), every_n)
        }
        hs.discard(None)
        if hs:
            sigs.append((d, hs))
    out = []
    for i in range(len(sigs)):
        ida, sa = sigs[i]
        for j in range(i + 1, len(sigs)):
            idb, sb = sigs[j]
            inter = len(sa & sb)
            if inter == 0:
                continue
            jac = spark_round(inter / (len(sa) + len(sb) - inter), 6)
            if jac >= threshold:
                out.append((ida, idb, jac))
    return pd.DataFrame(out, columns=["id_a", "id_b", "jaccard"]).astype(
        {"id_a": "int64", "id_b": "int64", "jaccard": "float64"}
    )
