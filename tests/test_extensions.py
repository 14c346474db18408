"""Golden tests for the training-data-pipeline extensions: planted
near-duplicates must be found; approximate methods are checked against
exact baselines (recall), stub boundaries raise cleanly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_playground_spark.functions.dedupe import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from flink_playground_spark.functions.multimodal import attach_blob, decode_metadata
from flink_playground_spark.functions.similarity import brute_force_topk, lsh_topk
from flink_playground_spark.functions.text import lang_id
from flink_playground_spark.sources.memory import from_rows

BASE = (
    "the quick brown fox jumps over the lazy dog while the hunter watches "
    "from a distance and the wind carries the scent of rain across the field"
)
NEAR = BASE.replace("lazy dog", "sleepy dog")  # one token changed
FAR = "completely different content about spark query engines and shuffles"


@pytest.fixture()
def docs(spark):
    rows = [
        (1, BASE),
        (2, NEAR),          # near-dup of 1
        (3, BASE),          # exact dup of 1
        (4, FAR),
        (5, "unrelated tiny text"),
    ]
    return from_rows(spark, rows, ["doc_id", "text"], [int, str])


def test_exact_duplicates_found(spark, docs):
    groups = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(groups) == 1
    assert groups[0].canonical_id == 1 and groups[0].n_dups == 2


def test_ngram_jaccard_finds_planted_pair(spark, docs):
    pairs = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert (1, 2) in pairs  # near-dup
    assert (1, 3) in pairs  # exact dup (jaccard 1.0)
    assert not any({a, b} & {4, 5} for a, b in pairs)


def test_minhash_lsh_matches_exact(spark, docs):
    got = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    want = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5).collect()}
    assert got == want  # LSH recall = 1.0 on planted dups at this scale


def test_simhash_detects_near_dups(spark, docs):
    pairs = {(r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs, "doc_id", "text", max_hamming=8).collect()}
    assert (1, 3) in pairs and pairs[(1, 3)] == 0  # identical text -> distance 0
    assert (1, 2) in pairs  # near-dup within a few bits
    assert (1, 4) not in pairs and (1, 5) not in pairs


def test_lang_id_markers(spark):
    rows = [
        (1, "the cat and the dog went to the market"),
        (2, "der hund und die katze sind nicht da"),
        (3, "el perro y la casa es un lugar"),
        (4, "xyzzy qwerty asdf"),
    ]
    df = from_rows(spark, rows, ["doc_id", "text"], [int, str])
    got = {r.doc_id: r.pred for r in df.select("doc_id", lang_id("text").alias("pred")).collect()}
    assert got == {1: "en", 2: "de", 3: "es", 4: "und"}


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, tables=8, planes=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.3, f"LSH recall {recall} collapsed"  # approximate, but not broken
    # every returned neighbor's sim must equal the exact score
    exact_sims = {(r.query_id, r.neighbor_id): r.sim for r in exact}
    for r in approx:
        if (r.query_id, r.neighbor_id) in exact_sims:
            assert r.sim == exact_sims[(r.query_id, r.neighbor_id)]


def test_multimodal_decode_and_stub_boundary(spark, docs):
    decoded = decode_metadata(attach_blob(docs, "text")).collect()
    assert all(r.valid for r in decoded)
    assert all(r.byte_len == len(r.text.encode()) for r in decoded)
    # unknown format must raise NotImplementedError at the stub boundary
    bad = attach_blob(docs, "text", fmt="image/jpeg")
    with pytest.raises(Exception, match="NotImplementedError|no decoder"):
        decode_metadata(bad).collect()


def test_embedding_neardup_lsh_subset_of_exact(spark, sf_dir):
    """LSH candidates re-scored exactly: every returned pair must appear
    in the exact all-pairs answer (no false positives), with usable recall."""
    from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY

    exact = {
        (r.id_a, r.id_b): r.sim
        for r in REGISTRY["embedding_neardup"].spark_fn(spark, sf_dir).collect()
    }
    approx = {
        (r.id_a, r.id_b): r.sim
        for r in EXTRA_REGISTRY["embedding_neardup_lsh"].spark_fn(spark, sf_dir).collect()
        if r.id_a < 600 and r.id_b < 600
    }
    assert set(approx) <= set(exact)
    assert all(exact[p] == s for p, s in approx.items())  # same exact sims
    if exact:
        assert len(approx) / len(exact) >= 0.5


def test_ivf_topk_recall_and_exact_sims(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 5)
    from flink_playground_spark.functions.similarity import brute_force_topk, ivf_topk

    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.2, f"IVF recall {recall} collapsed"
    sims = {(r.query_id, r.neighbor_id): r.sim for r in exact}
    assert all(sims[p] == r.sim for r in approx for p in [(r.query_id, r.neighbor_id)] if p in sims)


def test_ivfpq_topk_recall_and_cell_pruning(spark, sf_dir):
    """IVFADC (coarse cells + residual PQ): every returned neighbor
    must come from one of the query's nprobe probed cells (the pruning
    that makes the 100 TB scan affordable), ranks are 1..k with non-null
    sims, and recall@5 vs brute force stays usable. Value-exactness vs
    the Python reference is covered by the ann_ivfpq_topk OK-PYREF
    gate (tests/test_queries_oracle.py + tools/check.py)."""
    from flink_playground_spark.functions.similarity import (
        brute_force_topk,
        ivf_assign,
        ivfpq_topk,
        kmeans_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    out = ivfpq_topk(
        emb, queries, dim=64, m=8, n_codes=16, k=5,
        n_centroids=16, nprobe=4, kmeans_iters=2, iters=2,
    ).collect()
    assert out and all(1 <= r.rank <= 5 and r.sim is not None for r in out)

    # cell pruning: the deterministic geometry is reproducible, so
    # recompute it and check neighbors ⊆ probed cells' members
    cents = kmeans_centroids(emb, n_centroids=16, iters=2)
    cell = {
        r.vid: r.centroid_id
        for r in ivf_assign(emb, cents, nprobe=1).select("vid", "centroid_id").collect()
    }
    probed: dict[int, set] = {}
    for r in ivf_assign(queries, cents, nprobe=4).select("vid", "centroid_id").collect():
        probed.setdefault(r.vid, set()).add(r.centroid_id)
    assert all(cell[r.neighbor_id] in probed[r.query_id] for r in out)

    exact = brute_force_topk(emb, queries, k=5).collect()
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in out}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.15, f"IVFPQ recall {recall} collapsed"


def test_pq_topk_recall_and_code_compression(spark, sf_dir):
    """Product-quantization ADC: every corpus vector compresses to m=8
    codes in [0, 16); scoring touches only codes, yet recall@5 vs brute
    force stays usable (mean 0.275 at sf0.001 — random uniform vectors
    are PQ's worst case; floor at 0.15). Value-exactness vs the Python
    reference is covered by the ann_pq_topk OK-PYREF gate."""
    from flink_playground_spark.functions.similarity import (
        brute_force_topk,
        pq_encode,
        pq_topk,
        pq_train,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8)
    book = pq_train(emb, dim=64, m=8, k=16, iters=1)
    codes = pq_encode(emb, book, dim=64, m=8).collect()
    assert len(codes) == emb.count()
    assert all(len(r.codes) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r.codes)

    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = pq_topk(emb, queries, dim=64, m=8, n_codes=16, k=5, iters=2).collect()
    assert {r.query_id for r in approx} == {r.query_id for r in exact}
    assert all(1 <= r.rank <= 5 for r in approx)
    exact_set = {(r.query_id, r.neighbor_id) for r in exact}
    approx_set = {(r.query_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.15, f"PQ recall {recall} collapsed"


def test_pq_topk_survives_dropped_codeword(spark):
    """A codeword whose cell loses every member during Lloyd rounds is
    dropped from the book (duplicate vectors among the k seed ids force
    this: the tie-break sends all members to the lower code). The
    per-query LUT is keyed by (sub, code), so the hole must neither
    crash the ADC scan (INVALID_ARRAY_INDEX with positional indexing)
    nor silently shift later codewords' dots onto the wrong codes."""
    from flink_playground_spark.functions.similarity import pq_topk, pq_train
    from flink_playground_spark.sources.memory import from_rows

    def vec(axis, scale):
        v = [0.1] * 8
        v[axis] = scale
        return v

    rows = [
        (0, vec(0, 5.0)),
        (1, vec(0, 5.0)),  # duplicate seed: code 1 starves, gets dropped
        (2, vec(1, 5.0)),
        (3, vec(2, 5.0)),
        (4, vec(3, 5.0)),
        (5, vec(4, 5.0)),
        (6, vec(4, 5.0)),  # duplicate pair outside the seeds
        (7, vec(5, 5.0)),
        (8, vec(6, 5.0)),
        (9, vec(7, 5.0)),
    ]
    corpus = from_rows(spark, rows, ["vec_id", "embedding"], ["bigint", "array<float>"])
    book = pq_train(corpus, dim=8, m=2, k=4, iters=2)
    got = {(r.sub, r.code) for r in book.collect()}
    assert len(got) < 8, f"expected a dropped codeword, book kept {sorted(got)}"

    queries = corpus.filter(F.col("vec_id").isin(0, 5))
    out = pq_topk(corpus, queries, dim=8, m=2, n_codes=4, k=9, iters=2).collect()
    assert {r.query_id for r in out} == {0, 5}
    assert all(r.sim is not None for r in out)
    # the exact duplicate shares the query's codes, so its ADC sim must
    # equal the query's best sim (ties may rank a lower id first)
    best = {q: max(r.sim for r in out if r.query_id == q) for q in (0, 5)}
    dup_sim = {
        (r.query_id, r.neighbor_id): r.sim for r in out
    }
    assert dup_sim.get((0, 1)) == best[0]
    assert dup_sim.get((5, 6)) == best[5]


def test_l2_fold_parity_codegen_numpy_pyref(spark):
    """The three squared-L2 implementations — `_l2_sq_fixed` (unrolled
    codegen Column chain), `_pq_assign`'s dim-at-a-time numpy fold, and
    the Python reference `_l2_sq_ref` — must agree BIT-FOR-BIT: the
    bit-exact PQ oracle depends on all paths accumulating
    ((0 + d0²) + d1²) + ... in the same left-fold order. Values are
    chosen non-associative-hostile (wide magnitude spread) so a fold
    in any other order differs in the last ulp."""
    from flink_playground_spark.functions.reference import _l2_sq_ref
    from flink_playground_spark.functions.similarity import _l2_sq_fixed, _pq_assign
    from flink_playground_spark.sources.memory import from_rows

    vecs = [
        [1e8, -3.1, 7e-9, 2.5],
        [0.1, 0.2, 0.3, 0.4],
        [-1e7, 1e-6, 123456.789, -0.000321],
    ]
    cw = [1e8 - 0.7, 2.9, -7e-9, 1e5]
    rows = [(i, 0, v) for i, v in enumerate(vecs)]
    subs = from_rows(
        spark, rows, ["vid", "sub", "subvec"], ["bigint", "int", "array<double>"]
    )
    # codegen chain
    codegen = {
        r["vid"]: r["d"]
        for r in subs.select(
            "vid",
            _l2_sq_fixed(F.col("subvec"), F.array(*[F.lit(x) for x in cw]), 4).alias(
                "d"
            ),
        ).collect()
    }
    # numpy fold inside _pq_assign (single-codeword book, keep_d2)
    numpy_d2 = {
        r["vid"]: r["d2"]
        for r in _pq_assign(subs, {(0, 0): cw}, 4, keep_d2=True).collect()
    }
    for i, v in enumerate(vecs):
        ref = _l2_sq_ref(v, cw)
        assert codegen[i] == ref, f"codegen fold != pyref for vec {i}"
        assert numpy_d2[i] == ref, f"numpy fold != pyref for vec {i}"


def test_ivf_kmeans_refinement_improves_recall(spark):
    """Lloyd refinement improves recall@5 over the raw first-N seed at
    sf0.1 (2000 vectors; measured 0.760 → 0.787 over 30 queries). On
    uniform random embeddings the gain comes from balancing the Voronoi
    cells, not from finding clusters — at tiny scale (sf0.01) it is noise,
    so this test pins the sf0.1 corpus."""
    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 30)
    from flink_playground_spark.functions.similarity import brute_force_topk, ivf_topk

    exact_set = {
        (r.query_id, r.neighbor_id) for r in brute_force_topk(emb, queries, k=5).collect()
    }

    def recall(iters):
        approx = ivf_topk(
            emb, queries, k=5, n_centroids=16, nprobe=4, kmeans_iters=iters
        ).collect()
        return len(exact_set & {(r.query_id, r.neighbor_id) for r in approx}) / len(exact_set)

    r_seed, r_kmeans = recall(0), recall(2)
    assert r_kmeans >= r_seed, f"k-means hurt recall: seed={r_seed} kmeans={r_kmeans}"
    assert r_kmeans >= 0.5, f"IVF+kmeans recall {r_kmeans} collapsed"
    print(f"recall@5 seed={r_seed:.3f} kmeans(2)={r_kmeans:.3f}")


def test_multimodal_feature_resize_frame_ops(spark, docs):
    from flink_playground_spark.functions.multimodal import (
        attach_blob,
        extract_features,
        frame_sample,
        resize_stub,
    )

    blobs = attach_blob(docs, "text")
    feats = extract_features(blobs).collect()
    assert all(len(r.features) == 16 for r in feats)
    assert all(abs(sum(r.features) - 1.0) < 1e-9 for r in feats if len(r.text.encode()) > 0)

    resized = resize_stub(blobs, 8, 4).collect()
    assert all(len(bytes(r.resized)) == 32 and r.resized_w == 8 for r in resized)

    frames = frame_sample(blobs, every_n=2, frame_size=16).collect()
    import math

    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, 0)
        by_doc[r.doc_id] += 1
    for r in docs.collect():
        n = len(r.text.encode())
        want = math.ceil(max(n // 16, 1) / 2)
        assert by_doc[r.doc_id] == want


def test_sketch_aggregates_within_error_bounds(spark):
    """The 100 TB sketch path (approx_count_distinct = HLL++,
    approx_percentile = KLL-ish): at sf0.1 both must land within their
    documented error bounds of the exact answers the oracle-checked
    queries compute — the evidence that swapping exact → sketch at scale
    is a bounded-accuracy decision, not a leap."""
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
    row = li.agg(
        F.count_distinct("l_partkey").alias("exact_d"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_d"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("exact_p"),
        F.expr("approx_percentile(l_extendedprice, 0.95, 10000)").alias("approx_p"),
    ).collect()[0]
    assert abs(row["approx_d"] - row["exact_d"]) / row["exact_d"] < 0.05
    assert abs(row["approx_p"] - row["exact_p"]) / row["exact_p"] < 0.01


def test_bm25_matches_python_reference(spark):
    """bm25_topk equals a straightforward Python BM25 (same rational idf)
    on a crafted corpus, including document-length normalization."""
    import math

    docs = [
        (1, "spark spark spark flink"),
        (2, "spark flink flink duck duck duck duck duck duck duck duck"),
        (3, "duck goose"),
        (4, "goose goose goose goose"),
    ]
    terms = ["spark", "duck"]
    k1, b = 1.2, 0.75
    toks = {d: t.split() for d, t in docs}
    dl = {d: len(t) for d, t in toks.items()}
    n = len(docs)
    avg_mul = {d: dl[d] * n / sum(dl.values()) for d in dl}
    dfreq = {t: sum(1 for d in toks if t in toks[d]) for t in terms}
    want = {}
    for d in toks:
        s = 0.0
        for t in terms:
            tf = toks[d].count(t)
            if not tf:
                continue
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * ((1.0 - b) + b * avg_mul[d]))
        if s:  # retrieval returns only docs matching >= 1 query term
            want[d] = round(s, 6)
    order = sorted(want, key=lambda d: (-want[d], d))

    from flink_playground_spark.functions.tfidf import bm25_topk

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.score, r.rank) for r in bm25_topk(df, "doc_id", "text", terms, k=4).collect()}
    assert [d for d in sorted(got, key=lambda d: got[d][1])] == order
    for d, (score, _) in got.items():
        assert math.isclose(score, want[d], rel_tol=0, abs_tol=5e-7), (d, score, want[d])


def test_leakage_safe_split_keeps_pairs_together(spark, sf_dir):
    """Every near-duplicate pair lands in the same split — the property a
    doc-keyed split violates and the group-keyed split guarantees."""
    from pyspark.sql import functions as F

    from flink_playground_spark.functions.dedupe import minhash_lsh_pairs
    from flink_playground_spark.operators.graph import connected_components
    from flink_playground_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", k=128, bands=32, threshold=0.8)
    cc = connected_components(pairs, "id_a", "id_b").select(
        F.col("node").alias("doc_id"), F.col("comp").alias("group_key")
    )
    split = cc.withColumn(
        "split",
        F.when(
            F.substring(F.md5(F.col("group_key").cast("string")), 1, 1).isin(*"0123456789ab"),
            "train",
        ).otherwise("test"),
    ).select("doc_id", "split")
    straddling = (
        pairs.join(split.withColumnRenamed("doc_id", "id_a").withColumnRenamed("split", "sa"), "id_a")
        .join(split.withColumnRenamed("doc_id", "id_b").withColumnRenamed("split", "sb"), "id_b")
        .filter(F.col("sa") != F.col("sb"))
    )
    assert pairs.count() > 0  # the corpus does contain near-dups
    assert straddling.count() == 0

    # and the doc-keyed split DOES straddle at least one pair here,
    # which is exactly why the group key matters
    doc_split = F.when(
        F.substring(F.md5(F.col("v").cast("string")), 1, 1).isin(*"0123456789ab"), "train"
    ).otherwise("test")
    naive = (
        pairs.withColumn("sa", F.substring(F.md5(F.col("id_a").cast("string")), 1, 1).isin(*"0123456789ab"))
        .withColumn("sb", F.substring(F.md5(F.col("id_b").cast("string")), 1, 1).isin(*"0123456789ab"))
        .filter(F.col("sa") != F.col("sb"))
    )
    assert naive.count() > 0


def test_real_media_decoders_ppm_bmp_wav(spark):
    """REAL decoders for stdlib-parseable formats: P6 PPM (header with a
    comment), BMP (BITMAPINFOHEADER incl. top-down negative height), WAV
    (RIFF via the wave module), plus truncated-blob invalidity — decoded
    through the same Arrow mapInPandas path as the stub formats."""
    import io
    import struct
    import wave as wave_mod

    from flink_playground_spark.functions.multimodal import decode_metadata

    def ppm(w, h, comment=False):
        head = b"P6\n" + (b"# c\n" if comment else b"") + f"{w} {h}\n255\n".encode()
        return head + bytes((x * 7) % 256 for x in range(3 * w * h))

    def bmp(w, h):
        info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0)
        px = bytes(3 * abs(w) * abs(h))
        head = struct.pack("<2sIHHI", b"BM", 54 + len(px), 0, 0, 54)
        return head + info + px

    def wav(rate, chans):
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as f:
            f.setnchannels(chans)
            f.setsampwidth(2)
            f.setframerate(rate)
            f.writeframes(b"\x00\x01" * 32 * chans)
        return buf.getvalue()

    rows = [
        (1, ppm(5, 3), "image/ppm", 5, 3, True),
        (2, ppm(4, 4, comment=True), "image/ppm", 4, 4, True),
        (3, ppm(8, 8)[:20], "image/ppm", 8, 8, False),  # truncated pixels
        (4, bmp(6, 2), "image/bmp", 6, 2, True),
        (5, bmp(6, -2), "image/bmp", 6, 2, True),  # top-down height
        (6, wav(16000, 1), "audio/wav", 16000, 1, True),
        (7, wav(44100, 2), "audio/wav", 44100, 2, True),
        (8, b"RIFFjunk", "audio/wav", 0, 0, False),
    ]
    df = spark.createDataFrame(
        [(i, blob, fmt) for i, blob, fmt, *_ in rows],
        "id int, blob binary, media_format string",
    )
    got = {r["id"]: r for r in decode_metadata(df).collect()}
    for i, blob, fmt, w, h, valid in rows:
        r = got[i]
        assert (r["width"], r["height"], r["valid"]) == (w, h, valid), (i, dict(r.asDict()))
        assert r["byte_len"] == len(blob)


def test_resize_nearest_real_ppm(spark):
    """Real nearest-neighbor resampling: a 4x4 P6 quadrant image resized
    to 2x2 keeps one source pixel per quadrant; output is a valid P6 the
    decoder reads back at the target dims; non-PPM rows pass through
    NULL."""
    from flink_playground_spark.functions.multimodal import (
        decode_metadata,
        resize_nearest,
    )

    q = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    px = bytearray()
    for y in range(4):
        for x in range(4):
            px += bytes(q[(y // 2) * 2 + (x // 2)])
    blob = b"P6\n4 4\n255\n" + bytes(px)
    df = spark.createDataFrame(
        [(1, blob, "image/ppm"), (2, b"not a ppm", "fake/utf8")],
        "id int, blob binary, media_format string",
    )
    out = {r["id"]: r for r in resize_nearest(df, 2, 2).collect()}
    resized = bytes(out[1]["resized"])
    assert resized.startswith(b"P6\n2 2\n255\n")
    body = resized[len(b"P6\n2 2\n255\n"):]
    assert [tuple(body[i : i + 3]) for i in range(0, 12, 3)] == q
    assert out[2]["resized"] is None
    # the resized blob round-trips through the real decoder
    rd = decode_metadata(
        spark.createDataFrame([(1, resized, "image/ppm")], "id int, blob binary, media_format string")
    ).collect()[0]
    assert (rd["width"], rd["height"], rd["valid"]) == (2, 2, True)


def test_bpe_learns_textbook_merges(spark):
    """The Sennrich toy corpus: 'newest' must fuse into one token, 'low'
    into 'lo'+'w' or better, and encoding weights tokens by word freq.
    Integer-only determinism (ties -> lexicographically smallest pair)."""
    from flink_playground_spark.functions.bpe import bpe_token_counts, learn_bpe
    from flink_playground_spark.sources.memory import from_rows

    docs = from_rows(
        spark,
        [(1, "low low low lower lower newest newest newest newest widest")],
        ["doc_id", "text"],
        [int, str],
    )
    merges = learn_bpe(docs, "doc_id", "text", n_merges=6)
    assert merges[0] == ("w", "e")  # freq 7: lower(2) + newest(4) + widest(1)
    assert ("n", "ewest") in merges  # 'newest' fully fused by round 6
    counts = {r.token: r.n for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()}
    assert counts["newest"] == 4
    assert counts["lo"] == 5  # low×3 + lower×2
    # every (token, n) row is weighted by word frequency: total symbol
    # mass equals sum over words of freq × len(tokens(word))
    assert sum(counts.values()) == 3 * 2 + 2 * 3 + 4 * 1 + 1 * 5  # low lo|w, lower lo|we|r, newest, widest w|i|d|e|st


def test_bpe_vocab_cap_matches_reference(spark, sf_dir):
    """A TRUNCATING ``max_words`` cap (driver-memory guard for web-scale
    corpora) is part of the deterministic spec: learn_bpe(max_words=K)
    + full-corpus token counting must equal bpe_token_stats_ref with the
    same cap bit-for-bit — merge learning sees only the top-K words by
    (-freq, word), counting still covers every word."""
    from flink_playground_spark.functions.bpe import bpe_token_counts, learn_bpe
    from flink_playground_spark.functions.reference import bpe_token_stats_ref
    from flink_playground_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    cap = 10  # below the sf0.001 vocabulary (31 words) — genuinely truncates
    n_words = docs.selectExpr(
        "explode(split(trim(text), ' ')) AS w"
    ).filter("w <> ''").select("w").distinct().count()
    assert n_words > cap, "cap must truncate for this test to mean anything"

    merges = learn_bpe(docs, "doc_id", "text", n_merges=8, max_words=cap)
    got = {
        (r.token, r.n)
        for r in bpe_token_counts(docs, "doc_id", "text", merges).collect()
    }
    ref = bpe_token_stats_ref(sf_dir, n_merges=8, max_words=cap)
    want = set(zip(ref.token, ref.n.astype(int)))
    assert got == want
    # and the cap changed the learned merges vs uncapped (otherwise the
    # truncation path wasn't exercised)
    uncapped = learn_bpe(docs, "doc_id", "text", n_merges=8)
    assert merges != uncapped


def test_bpe_many_merges_is_one_job_and_fast(spark, sf_dir):
    """Production-vocabulary shape: training is O(1) Spark jobs in the
    merge count (the driver selects merges over the collected word-
    frequency table with incremental pair counts), so 256 merges must
    finish in seconds — round 4 ran one cluster job per merge. The
    incremental counts must equal a from-scratch recount (the oracle's
    algorithm) on a non-trivial corpus."""
    import time

    from flink_playground_spark.functions.bpe import (
        _apply_merge_py,
        _learn_merges_local,
        learn_bpe,
        word_frequencies,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    freqs = {
        r["word"]: int(r["freq"])
        for r in word_frequencies(docs, "doc_id", "text").collect()
    }
    # the synthetic corpus has ~31 distinct words, so a 256-merge ask
    # exhausts every pair and stops early — still one Spark job
    merges = learn_bpe(docs, "doc_id", "text", n_merges=256)
    assert 0 < len(merges) < 256

    # production-vocabulary speed: 512 merges over a 4k-word vocabulary
    # must take seconds (incremental pair counts, no per-merge rescans)
    import hashlib

    big_vocab = {
        hashlib.sha256(str(i).encode()).hexdigest()[: 8 + i % 24]: 1 + i % 97
        for i in range(4000)
    }
    t0 = time.time()
    big_merges = _learn_merges_local(big_vocab, 512, 1)
    elapsed = time.time() - t0
    assert len(big_merges) == 512
    assert elapsed < 20, f"512-merge training took {elapsed:.1f}s"

    # incremental == from-scratch recount (reference.py's loop) for the
    # first 24 merges
    vocab = {w: [*w] for w in freqs}
    recount: list[tuple[str, str]] = []
    for _ in range(24):
        pairs: dict[tuple[str, str], int] = {}
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] = pairs.get(p, 0) + freqs[w]
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        recount.append(best)
        vocab = {w: _apply_merge_py(s, *best) for w, s in vocab.items()}
    assert merges[:24] == recount
    assert merges[:24] == _learn_merges_local(freqs, 24, 1)


def test_bigram_lm_scores_hand_computed(spark):
    """Add-0.5 bigram LM on a 3-doc corpus, checked against a by-hand
    recomputation (same rounding discipline); a 1-token doc has no
    bigrams and is excluded; repeated-bigram docs score higher than a
    doc containing a rare transition."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    from flink_playground_spark.functions.lm import bigram_lm_scores
    from flink_playground_spark.sources.memory import from_rows

    docs = from_rows(
        spark,
        [(1, "a b a b"), (2, "a b c"), (3, "x")],
        ["doc_id", "text"],
        [int, str],
    )
    out = {r.doc_id: r for r in bigram_lm_scores(docs, "doc_id", "text").collect()}
    assert set(out) == {1, 2}  # doc 3: no bigrams

    def r6(x):
        return float(Decimal(repr(float(x))).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    v = 4.0  # {a, b, c, x}
    p_ab = (3 + 0.5) / (3 + 0.5 * v)   # c(a,b)=3, c(a,.)=3
    p_ba = (1 + 0.5) / (2 + 0.5 * v)   # c(b,a)=1, c(b,.)=2
    p_bc = (1 + 0.5) / (2 + 0.5 * v)
    lp = {k: r6(math.log(p)) for k, p in {"ab": p_ab, "ba": p_ba, "bc": p_bc}.items()}
    want1 = r6((lp["ab"] * 2 + lp["ba"]) / 3)
    want2 = r6((lp["ab"] + lp["bc"]) / 2)
    assert out[1].n_bigrams == 3 and out[1].avg_logprob == want1
    assert out[2].n_bigrams == 2 and out[2].avg_logprob == want2
    assert out[1].avg_logprob > out[2].avg_logprob  # repetition scores higher


def test_logreg_learns_separable_data(spark):
    """GD-as-aggregates actually learns: on a linearly separable set the
    trained model classifies perfectly and beats the 0-iteration prior;
    weights move in the right direction (positive feature weight)."""
    from flink_playground_spark.functions.classifier import (
        predict_logreg,
        train_logreg,
    )

    # x scaled to ~[0, 2): unscaled features make the bias crawl and
    # full-batch GD needs far more rounds (simulated: acc 0.85 @ x raw,
    # 1.0 @ x/10 with 40 rounds, lr 2)
    rows = [(i, float(i) / 10.0, 1 if i >= 10 else 0) for i in range(20)]
    df = spark.createDataFrame(rows, "id long, x double, label int")
    w = train_logreg(df, ["x"], "label", iters=40, lr=2.0)
    assert w[1] > 0  # larger x -> more likely positive
    out = predict_logreg(df, ["x"], w).collect()
    acc = sum(1 for r in out if r.pred == r.label) / len(out)
    assert acc >= 0.9, (w, acc)
    # probabilities are monotone in x for a 1-feature model
    probs = [r.prob for r in sorted(out, key=lambda r: r.x)]
    assert probs == sorted(probs)


def test_pca_components_capture_variance_in_order(spark, sf_dir):
    """Power iteration finds the top directions: projected variance on
    pc1 >= pc2 >= any coordinate axis's centered variance is too strong
    for random data, but pc1 >= pc2 must hold and both must beat the
    MEDIAN axis variance; components are unit-norm and orthogonal."""
    import statistics

    from flink_playground_spark.functions.pca import (
        corpus_moments,
        pca_project,
        principal_components,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n, mean, scatter = corpus_moments(emb, "embedding", 64)
    assert n == emb.count()
    c1, c2 = principal_components(scatter, 64, n_components=2, iters=8)
    assert abs(sum(x * x for x in c1) - 1.0) < 1e-6
    assert abs(sum(x * x for x in c2) - 1.0) < 1e-6
    assert abs(sum(a * b for a, b in zip(c1, c2))) < 1e-6  # orthogonal

    proj = pca_project(emb, "vec_id", "embedding", 64, n_components=2, iters=8).toPandas()
    v1, v2 = proj["pc1"].var(), proj["pc2"].var()
    assert v1 >= v2 > 0
    rows = emb.select("embedding").toPandas()["embedding"]
    axis_vars = [statistics.variance([float(v[d]) for v in rows]) for d in range(0, 64, 8)]
    assert v1 > statistics.median(axis_vars)


def test_pca_rank_deficient_scatter_emits_zero_components():
    """All vectors identical (zero scatter): NO component may fall back
    to the raw [1,0,...] seed — pc2 duplicating pc1 silently breaks the
    documented orthogonality. Rank-exhausted components are zeros."""
    from flink_playground_spark.functions.pca import principal_components

    comps = principal_components([[0.0] * 4 for _ in range(4)], 4, n_components=2)
    assert comps == [[0.0] * 4, [0.0] * 4]

    # rank-1 scatter: pc1 is the single direction, pc2 must be zeros —
    # not a copy of pc1 (the regression the un-deflated seed caused)
    rank1 = [[1.0 if d == e == 0 else 0.0 for e in range(4)] for d in range(4)]
    c1, c2 = principal_components(rank1, 4, n_components=2)
    assert c1 == [1.0, 0.0, 0.0, 0.0]
    assert c2 == [0.0] * 4


def test_ivf_assign_expr_string_parity(spark):
    """ivf_assign's nprobe=1 argmax now parses from ONE SQL string
    (_VNORM_SQL/_IVF_BEST_SQL) instead of ~40 py4j Column calls; this
    pins the string against the original Column-API tree bit for bit —
    including dirty rows (null element, null vector) whose csim must
    stay null-filtered."""
    from flink_playground_spark.functions.similarity import dot, ivf_assign, norm

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    seed = sorted(
        emb.orderBy("vec_id").limit(16).collect(), key=lambda r: r["vec_id"]
    )
    cdf = spark.createDataFrame(
        [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in seed],
        "centroid_id bigint, embedding array<double>",
    )
    dirty = spark.createDataFrame(
        [(100001, [None] + [0.5] * 63), (100002, [0.25] * 64), (100003, None)],
        "vec_id bigint, embedding array<double>",
    )
    corpus = emb.unionByName(dirty)

    # the pre-round-9 Column-API tree, verbatim
    c = cdf.select(F.col("centroid_id"), F.col("embedding").alias("cvec"))
    v = corpus.select(F.col("vec_id").alias("vid"), F.col("embedding").alias("vec"))
    carr = c.select(
        "centroid_id", "cvec", norm(F.col("cvec")).alias("cnorm")
    ).agg(
        F.array_sort(F.collect_list(F.struct("centroid_id", "cvec", "cnorm"))).alias(
            "cents"
        )
    )
    best = F.array_max(
        F.filter(
            F.transform(
                F.col("cents"),
                lambda cc: F.struct(
                    (dot(F.col("vec"), cc["cvec"]) / (F.col("vnorm") * cc["cnorm"])).alias("csim"),
                    (-cc["centroid_id"]).alias("nid"),
                ),
            ),
            lambda s: s["csim"].isNotNull(),
        )
    )
    old = (
        v.crossJoin(F.broadcast(carr))
        .withColumn("vnorm", norm(F.col("vec")))
        .withColumn("b", best)
        .filter(F.col("b").isNotNull())
        .select("vid", (-F.col("b.nid")).alias("centroid_id"), F.col("b.csim").alias("csim"))
    )
    want = {r["vid"]: (r["centroid_id"], r["csim"]) for r in old.collect()}
    got = {
        r["vid"]: (r["centroid_id"], r["csim"])
        for r in ivf_assign(corpus, cdf, "vec_id", "embedding", nprobe=1, keep_sim=True).collect()
    }
    assert got == want and len(got) == corpus.count() - 2  # 2 dirty rows dropped


def test_minhash_expr_string_parity(spark):
    """Round 13: shingle_index's ``distinct + countDistinct + join`` was
    reshaped to ``dropDuplicates + window count`` (one exchange, no
    duplicated gram subtree) and minhash_signatures' K min-aggregates
    now parse from ONE SQL string folding the array in the aggregate
    (SQL int literals type like ``F.lit(int)``). This pins both against
    the pre-round-13 Column-API trees bit for bit — including a doc
    shorter than n tokens (no rows either way) and a NULL text."""
    from pyspark.sql import Window

    from flink_playground_spark.functions.dedupe import minhash_signatures, shingle_index
    from flink_playground_spark.functions.text import tokens

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    dirty = spark.createDataFrame(
        [(900001, "one two"), (900002, None), (900003, "")],
        "doc_id bigint, text string",
    )
    docs = docs.unionByName(dirty)
    n, k = 3, 128

    # the pre-round-13 trees, verbatim
    toks = docs.select(F.col("doc_id").alias("doc"), F.posexplode(tokens("text")).alias("j", "tok"))
    w = Window.partitionBy("doc").orderBy("j")
    with_leads = toks.select(
        "doc", "tok", *[F.lead("tok", i).over(w).alias(f"__t{i}") for i in range(1, n)]
    )
    grams = with_leads.filter(F.col(f"__t{n-1}").isNotNull()).select(
        "doc",
        F.xxhash64(F.concat_ws(" ", "tok", *[f"__t{i}" for i in range(1, n)])).alias("shingle"),
    )
    counts = grams.groupBy("doc").agg(F.count_distinct("shingle").alias("n_sh"))
    old_idx = grams.distinct().join(counts, "doc").select("doc", "n_sh", "shingle")
    old_sigs = old_idx.groupBy("doc").agg(
        *[F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"s{i}") for i in range(k)]
    ).select("doc", F.array(*[f"s{i}" for i in range(k)]).alias("sig"))

    new_idx = shingle_index(docs, "doc_id", "text", n)
    assert new_idx.schema == old_idx.schema
    assert new_idx.exceptAll(old_idx).isEmpty() and old_idx.exceptAll(new_idx).isEmpty()

    new_sigs = minhash_signatures(None, "doc", None, k, n, index=new_idx)
    assert new_sigs.schema == old_sigs.schema
    assert new_sigs.exceptAll(old_sigs).isEmpty() and old_sigs.exceptAll(new_sigs).isEmpty()


def test_kmeans_memo_distinct_paths_do_not_collide(spark, tmp_path):
    """The kmeans memo is keyed by canonical plan + BACKING FILES: two
    same-schema parquet corpora at different paths must train separate
    centroids (same-schema scans canonicalize to the same string — the
    collision that poisoned test_ivf_kmeans_refinement_improves_recall
    when the key was plan-only), and an in-memory corpus must never be
    memoized at all."""
    from flink_playground_spark.functions import similarity as S

    a_path, b_path = str(tmp_path / "a.parquet"), str(tmp_path / "b.parquet")
    rows_a = [(i, [float(i % 7) + 1.0] * 4) for i in range(40)]
    rows_b = [(i, [float(i % 3) + 10.0] * 4) for i in range(40)]
    schema = "vec_id bigint, embedding array<double>"
    spark.createDataFrame(rows_a, schema).write.mode("overwrite").parquet(a_path)
    spark.createDataFrame(rows_b, schema).write.mode("overwrite").parquet(b_path)

    da, db = spark.read.parquet(a_path), spark.read.parquet(b_path)
    ca = {r["centroid_id"]: list(r["embedding"]) for r in S.kmeans_centroids(da, n_centroids=4, iters=1).collect()}
    cb = {r["centroid_id"]: list(r["embedding"]) for r in S.kmeans_centroids(db, n_centroids=4, iters=1).collect()}
    assert ca != cb, "same-schema corpora at different paths shared a memo entry"
    # repeat call = memo hit, same values
    ca2 = {r["centroid_id"]: list(r["embedding"]) for r in S.kmeans_centroids(da, n_centroids=4, iters=1).collect()}
    assert ca2 == ca
    # in-memory corpus: never memoized
    mem = spark.createDataFrame(rows_a, schema)
    assert S._kmeans_memo_key(mem, "vec_id", "embedding", 4, 1) is None


def test_ivfpq_driver_seed_derivation_matches_spark_collect(spark):
    """_derive_resid_seeds (ivfpq's job-free PQ seed path) must produce
    the exact rows resid.orderBy(vid).limit(n_codes) would collect —
    same vids, same residual bits."""
    from flink_playground_spark.functions.similarity import (
        _derive_resid_seeds,
        ivf_assign,
        kmeans_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    cents, seed_rows = kmeans_centroids(
        emb, "vec_id", "embedding", 16, 2, _return_seed_rows=True
    )
    derived = _derive_resid_seeds(cents, seed_rows, 16)
    assert derived is not None and len(derived) == 16

    cvecs = cents.select("centroid_id", F.col("embedding").alias("cvec"))
    resid = (
        ivf_assign(emb, cents, "vec_id", "embedding", nprobe=1)
        .join(F.broadcast(cvecs), "centroid_id")
        .select(
            "vid",
            F.zip_with(F.col("vec"), F.col("cvec"), lambda x, c: x.cast("double") - c).alias("resid"),
        )
    )
    want = [(r["vid"], list(r["resid"])) for r in resid.orderBy("vid").limit(16).collect()]
    assert derived == want


def test_perceptual_hash_resize_robust_golden(spark):
    """The promised golden: a RESIZED copy of an image is caught (small
    Hamming distance through the real nearest-neighbor resampler) and an
    unrelated image is not. Sub-grid and undecodable blobs hash NULL."""
    from flink_playground_spark.functions.dedupe import hamming_band_pairs
    from flink_playground_spark.functions.multimodal import (
        perceptual_hash,
        resize_nearest,
    )

    def ppm(w, h, fn):
        px = bytearray()
        for y in range(h):
            for x in range(w):
                v = fn(x, y) & 0xFF
                px += bytes((v, v, v))
        return f"P6\n{w} {h}\n255\n".encode() + bytes(px)

    # smooth plane + bright quadrant (low spatial frequency: the regime
    # perceptual hashes are built for)
    base = ppm(32, 32, lambda x, y: min(255, x * 5 + y * 2 + (80 if x >= 16 and y >= 16 else 0)))
    unrelated = ppm(32, 32, lambda x, y: 255 - min(255, x * 5 + y * 2))
    src = spark.createDataFrame(
        [(1, base, "image/ppm")], "id int, blob binary, media_format string"
    )
    # real resampler, including a non-multiple-of-8 target
    r24 = bytes(resize_nearest(src, 24, 24).collect()[0]["resized"])
    r20 = bytes(resize_nearest(src, 20, 20).collect()[0]["resized"])
    rows = [
        (1, base),
        (2, r24),
        (3, r20),
        (4, unrelated),
        (5, ppm(7, 7, lambda x, y: x)),  # sub-grid -> NULL
        (6, b"not an image"),  # undecodable -> NULL
    ]
    for kind, slack in (("ahash", 3), ("dhash", 3)):
        fp = {
            r["id"]: r["phash"]
            for r in perceptual_hash(
                spark.createDataFrame(rows, "id int, blob binary"), kind=kind
            ).collect()
        }
        assert fp[5] is None and fp[6] is None, kind
        mask = (1 << 64) - 1

        def ham(a, b):
            return ((fp[a] & mask) ^ (fp[b] & mask)).bit_count()

        assert ham(1, 2) <= slack, (kind, ham(1, 2))
        assert ham(1, 3) <= slack, (kind, ham(1, 3))
        assert ham(1, 4) > 10, (kind, ham(1, 4))
        assert ham(2, 4) > 10, (kind, ham(2, 4))
    # end-to-end banded pairing finds exactly the copies
    fp_df = perceptual_hash(
        spark.createDataFrame(rows, "id int, blob binary"), kind="ahash"
    ).selectExpr("id as doc", "phash as sh").where("phash is not null")
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in hamming_band_pairs(fp_df, max_hamming=3).collect()
    }
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}, pairs


def test_synth_numpy_byte_parity():
    """Round 13: the three synthetic-media generators render via
    vectorized numpy instead of per-pixel/per-sample Python loops. The
    blobs are the SPEC the queries and their bit-exact oracles share,
    so this pins the numpy renders byte-for-byte against the original
    loops (verbatim below), across members 0/1/2, small and large class
    ids, and every class%4 / class%16 flip arity."""
    import io
    import wave as wave_mod

    from flink_playground_spark.functions.multimodal import (
        _SYNTH_AUDIO_SEG,
        _SYNTH_DIMS,
        _SYNTH_SCENE_DUR,
        _splitmix64,
        synth_block_image,
        synth_envelope_wav,
        synth_scene_video,
    )

    def old_image(doc_id):
        cls, member = doc_id // 3, doc_id % 3
        bits = [(_splitmix64(cls * 64 + t)) & 1 for t in range(64)]
        if member == 2:
            for t in range(cls % 4):
                bits[(cls + 17 * t) % 64] ^= 1
        w, h = _SYNTH_DIMS[member]
        rows = bytearray()
        for y in range(h):
            for x in range(w):
                v = 255 if bits[(y * 8 // h) * 8 + (x * 8 // w)] else 0
                rows += bytes((v, v, v))
        return f"P6\n{w} {h}\n255\n".encode() + bytes(rows)

    def old_wav(doc_id):
        cls, member = doc_id // 3, doc_id % 3
        bits = [(_splitmix64((1 << 32) + cls * 64 + t)) & 1 for t in range(64)]
        if member == 2:
            for t in range(cls % 4):
                bits[(cls + 17 * t) % 64] ^= 1
        seg = _SYNTH_AUDIO_SEG[member]
        pcm = bytearray()
        for t in range(64):
            amp = 12000 if bits[t] else 2000
            for s in range(seg):
                v = amp if s % 2 == 0 else -amp
                pcm += v.to_bytes(2, "little", signed=True)
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(bytes(pcm))
        return buf.getvalue()

    def old_video(doc_id):
        cls, member = doc_id // 3, doc_id % 3
        scenes = []
        for s in range(17):
            bits = [(_splitmix64((1 << 33) + (cls * 17 + s) * 64 + t)) & 1 for t in range(64)]
            px = bytearray()
            for b in bits:
                v = 255 if b else 0
                px += bytes((v, v, v))
            scenes.append(bytes(px))
        order = list(range(16))
        if member == 2:
            order[cls % 16] = 16
        dur = _SYNTH_SCENE_DUR[member]
        return b"".join(scenes[s] * dur for s in order)

    ids = [c * 3 + m for c in (0, 1, 2, 3, 7, 18, 101, 10**6, 2**40 // 3) for m in (0, 1, 2)]
    for i in ids:
        assert synth_block_image(i) == old_image(i), i
        assert synth_envelope_wav(i) == old_wav(i), i
        assert synth_scene_video(i) == old_video(i), i


def test_synth_block_corpus_planted_distances(spark):
    """synth_block_image ground truth: members 0/1 of a class hash
    identically at different resolutions; member 2 sits at exactly
    class%4 flipped bits; the registry query's banding therefore returns
    exactly 3 pairs per full class at the planted distances."""
    from flink_playground_spark.functions.multimodal import _ahash64, synth_block_image

    mask = (1 << 64) - 1
    for cls in (0, 1, 2, 3, 7, 50, 101):
        h0 = _ahash64(synth_block_image(cls * 3))
        h1 = _ahash64(synth_block_image(cls * 3 + 1))
        h2 = _ahash64(synth_block_image(cls * 3 + 2))
        assert h0 == h1, cls
        assert ((h0 & mask) ^ (h2 & mask)).bit_count() == cls % 4, cls


def test_hash_reference_parity_on_non_grid_multiple_dims():
    """Operator and reference hash kernels agree on inputs whose dims are
    NOT multiples of the pooling grid (r11, ADVICE): the operator uses
    explicit floor cell boundaries [i*n//k, (i+1)*n//k); the reference
    inverts them with the closed form ((j+1)*k - 1)//n. The synth
    corpora only exercise grid-multiple dims (32/16/24 images, 64*seg
    audio), so this is the pin that keeps the bit-exactness claim true
    if corpus dims ever change."""
    import io
    import random
    import wave as wave_mod

    from flink_playground_spark.functions.multimodal import (
        _ahash64,
        _audiohash64,
        _raw_ahash64,
    )
    from flink_playground_spark.functions.reference import (
        ahash64_ref,
        audiohash64_ref,
        raw_ahash64_ref,
    )

    rng = random.Random(7)

    def ppm(w, h):
        px = bytes(rng.randrange(256) for _ in range(3 * w * h))
        return f"P6\n{w} {h}\n255\n".encode() + px

    for w, h in [(12, 17), (9, 8), (13, 29), (100, 3), (32, 32)]:
        blob = ppm(w, h)
        assert _ahash64(blob) == ahash64_ref(blob), (w, h)

    for w, h in [(10, 12), (11, 9), (8, 8)]:
        frame = bytes(rng.randrange(256) for _ in range(3 * w * h))
        assert _raw_ahash64(frame, w, h) == raw_ahash64_ref(frame, w, h), (w, h)

    def wav(n, chans):
        buf = io.BytesIO()
        pcm = bytearray()
        for _ in range(n):
            v = rng.randrange(-20000, 20000)
            for _ in range(chans):
                pcm += v.to_bytes(2, "little", signed=True)
        with wave_mod.open(buf, "wb") as f:
            f.setnchannels(chans)
            f.setsampwidth(2)
            f.setframerate(8000)
            f.writeframes(bytes(pcm))
        return buf.getvalue()

    for n, ch in [(100, 1), (65, 1), (997, 2), (64, 1)]:
        blob = wav(n, ch)
        assert _audiohash64(blob) == audiohash64_ref(blob), (n, ch)


def test_audio_fingerprint_resample_robust_golden(spark):
    """A track re-rendered at a doubled sample rate (the same loudness
    envelope, twice the samples) fingerprints within Hamming 3 of the
    original; an unrelated track does not; a stereo render folds to mono
    and matches; undecodable / too-short blobs hash NULL."""
    import io
    import math
    import wave as wave_mod

    from flink_playground_spark.functions.dedupe import hamming_band_pairs
    from flink_playground_spark.functions.multimodal import audio_fingerprint

    def wav(rate, seconds, env, chans=1):
        """Amplitude-modulated 440 Hz sine: env(t in [0,1)) -> amplitude."""
        buf = io.BytesIO()
        n = int(rate * seconds)
        pcm = bytearray()
        for i in range(n):
            amp = env(i / n)
            v = int(amp * math.sin(2 * math.pi * 440 * i / rate))
            for _ in range(chans):
                pcm += v.to_bytes(2, "little", signed=True)
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(chans)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(bytes(pcm))
        return buf.getvalue()

    loud_mid = lambda t: 12000 if 0.3 <= t < 0.7 else 1500  # noqa: E731
    loud_ends = lambda t: 1500 if 0.3 <= t < 0.7 else 12000  # noqa: E731
    rows = [
        (1, wav(8000, 1.0, loud_mid)),
        (2, wav(16000, 1.0, loud_mid)),  # resampled copy
        (3, wav(8000, 1.0, loud_mid, chans=2)),  # stereo render
        (4, wav(8000, 1.0, loud_ends)),  # unrelated envelope
        (5, b"RIFFjunk"),  # undecodable
        (6, wav(8000, 0.005, loud_mid)),  # 40 samples < 64 windows
    ]
    fp = {
        r["id"]: r["afp"]
        for r in audio_fingerprint(
            spark.createDataFrame(rows, "id int, blob binary")
        ).collect()
    }
    assert fp[5] is None and fp[6] is None
    mask = (1 << 64) - 1

    def ham(a, b):
        return ((fp[a] & mask) ^ (fp[b] & mask)).bit_count()

    assert ham(1, 2) <= 3, ham(1, 2)
    assert ham(1, 3) <= 3, ham(1, 3)
    assert ham(1, 4) > 10, ham(1, 4)
    assert ham(2, 4) > 10, ham(2, 4)
    fp_df = audio_fingerprint(
        spark.createDataFrame(rows, "id int, blob binary")
    ).selectExpr("id as doc", "afp as sh").where("afp is not null")
    pairs = set()
    for r in hamming_band_pairs(fp_df, max_hamming=3).collect():
        pairs.add((r["id_a"], r["id_b"]))
    assert pairs == {(1, 2), (1, 3), (2, 3)}, pairs


def test_synth_envelope_corpus_planted_distances():
    """synth_envelope_wav ground truth: members 0/1 of a class hash
    identically at different durations; member 2 sits at exactly
    class%4 flipped envelope segments."""
    from flink_playground_spark.functions.multimodal import (
        _audiohash64,
        synth_envelope_wav,
    )

    mask = (1 << 64) - 1
    for cls in (0, 1, 2, 3, 11, 42):
        h0 = _audiohash64(synth_envelope_wav(cls * 3))
        h1 = _audiohash64(synth_envelope_wav(cls * 3 + 1))
        h2 = _audiohash64(synth_envelope_wav(cls * 3 + 2))
        assert h0 == h1, cls
        assert ((h0 & mask) ^ (h2 & mask)).bit_count() == cls % 4, cls


def test_video_scene_neardup_golden(spark):
    """Video dedup ground truth: a re-timed copy (same scenes, longer
    holds) and a re-ORDERED copy both keep Jaccard 1.0 with the
    original (signatures are distinct frame-hash SETS); swapping one of
    four scenes gives exactly 3/5; an unrelated video shares nothing."""
    from flink_playground_spark.functions.dedupe import (
        prefix_filter_candidates,
        verify_pairs,
    )
    from flink_playground_spark.functions.multimodal import frame_phash

    def frame(seed):
        # 8x8 binary block frame from a seed
        from flink_playground_spark.functions.multimodal import _splitmix64

        px = bytearray()
        for t in range(64):
            v = 255 if _splitmix64(seed * 64 + t) & 1 else 0
            px += bytes((v, v, v))
        return bytes(px)

    A, B, C, D, E, X = (frame(s) for s in (1, 2, 3, 4, 5, 6))
    rows = [
        (1, A * 2 + B * 2 + C * 2 + D * 2),  # original: scenes ABCD
        (2, A * 4 + B * 4 + C * 4 + D * 4),  # re-timed copy
        (3, D * 2 + C * 2 + B * 2 + A * 2),  # re-ordered copy
        (4, A * 2 + B * 2 + C * 2 + E * 2),  # one scene swapped: J=3/5
        (5, X * 8),  # unrelated
    ]
    df = spark.createDataFrame(rows, "doc_id int, blob binary")
    fh = frame_phash(df, every_n=2).filter(F.col("fhash").isNotNull())
    grams = fh.select(F.col("doc_id").alias("doc"), F.col("fhash").alias("shingle")).distinct()
    counts = grams.groupBy("doc").agg(F.count(F.lit(1)).alias("n_sh"))
    idx = grams.join(counts, "doc").select("doc", "n_sh", "shingle")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in verify_pairs(idx, prefix_filter_candidates(idx, 0.6), 0.6).collect()
    }
    assert got[(1, 2)] == 1.0 and got[(1, 3)] == 1.0 and got[(2, 3)] == 1.0
    assert got[(1, 4)] == got[(2, 4)] == got[(3, 4)] == 0.6
    assert not any(5 in k for k in got), got


def test_frame_phash_fast_path_matches_scalar():
    """The vectorized 8x8 batch hash must be bit-identical to the
    per-frame scalar kernel, including frames whose pooled means tie."""
    import numpy as np

    from flink_playground_spark.functions.multimodal import _raw_ahash64, _splitmix64

    pows = np.uint64(1) << np.arange(64, dtype=np.uint64)
    frames = []
    for seed in range(50):
        px = bytes(_splitmix64(seed * 192 + i) & 0xFF for i in range(192))
        frames.append(px)
    frames.append(bytes(192))  # all-zero: every cell ties the mean
    frames.append(bytes([255]) * 192)  # all-max: ties again
    px = np.frombuffer(b"".join(frames), dtype=np.uint8).reshape(-1, 64, 3)
    gray = px.sum(axis=2, dtype=np.int64)
    total = gray.sum(axis=1, keepdims=True)
    bits = (gray * 64 > total).astype(np.uint64)
    hv = (bits * pows).sum(axis=1, dtype=np.uint64).view(np.int64)
    for f, fast in zip(frames, hv):
        assert int(fast) == _raw_ahash64(f, 8, 8), f[:6]


def test_frame_phash_fusion_matches_composition(spark):
    """frame_phash (fused sample+hash) must equal frame_sample composed
    with the scalar hash row-for-row — same frame_no grid, same
    tail-slice semantics, including short and empty blobs."""
    from flink_playground_spark.functions.multimodal import (
        _raw_ahash64,
        _splitmix64,
        frame_phash,
        frame_sample,
    )

    rows = []
    for i, n_bytes in enumerate([192 * 7, 192 * 3 + 50, 100, 192, 0, 192 * 12]):
        rows.append((i, bytes(_splitmix64(i * 100000 + j) & 0xFF for j in range(n_bytes))))
    df = spark.createDataFrame(rows, "id int, blob binary")
    fused = {
        (r["id"], r["frame_no"]): r["fhash"]
        for r in frame_phash(df, every_n=2).collect()
    }
    composed = {}
    for r in frame_sample(df, every_n=2, frame_size=192).collect():
        composed[(r["id"], r["frame_no"])] = _raw_ahash64(bytes(r["frame"]), 8, 8)
    assert fused == composed, (len(fused), len(composed))
