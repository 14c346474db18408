"""Deterministic sampling / tf-idf / content-chunking unit tests
(functions/sampling.py, tfidf.py, chunking.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_playground_spark.functions.chunking import content_chunks, positional_tokens
from flink_playground_spark.functions.sampling import (
    bernoulli_hash_sample,
    stratified_topk_sample,
)
from flink_playground_spark.functions.tfidf import tfidf_top_terms
from flink_playground_spark.sources.tables import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_stratified_exact_k_per_stratum(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    out = stratified_topk_sample(docs, ["lang"], "doc_id", 7).toPandas()
    sizes = out.groupby("lang").size()
    n_per_lang = docs.groupBy("lang").count().toPandas().set_index("lang")["count"]
    for lang, sz in sizes.items():
        assert sz == min(7, n_per_lang[lang])
    ranks = out.groupby("lang")["sample_rank"].apply(sorted)
    for lang, rs in ranks.items():
        assert list(rs) == list(range(1, len(rs) + 1))


def test_stratified_stable_under_repartition(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    a = stratified_topk_sample(docs, ["lang"], "doc_id", 5).toPandas()
    b = stratified_topk_sample(docs.repartition(7), ["lang"], "doc_id", 5).toPandas()
    key = lambda pdf: sorted(map(tuple, pdf[["lang", "doc_id", "sample_rank"]].values))
    assert key(a) == key(b)


def test_bernoulli_threshold_nesting(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id")
    narrow = set(bernoulli_hash_sample(docs, "doc_id", "1").toPandas()["doc_id"])
    wide = set(bernoulli_hash_sample(docs, "doc_id", "28").toPandas()["doc_id"])
    assert narrow <= wide
    n_total = docs.count()
    # rate '28'/256 ≈ 15.6 %: sanity band, not exactness
    assert 0.05 * n_total < len(wide) < 0.35 * n_total


def test_chunks_partition_the_document(spark, sf_dir):
    docs = _docs(spark, sf_dir).limit(50)
    chunks = content_chunks(docs, "doc_id", "text").toPandas()
    toks = positional_tokens(docs, "doc_id", "text").groupBy("doc_id").count().toPandas()
    per_doc = chunks.groupby("doc_id")["n_tokens"].sum()
    for _, row in toks.iterrows():
        assert per_doc[row["doc_id"]] == row["count"]
    # spans tile without overlap: next chunk starts after this one ends
    for _, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        assert (g["start_pos"] <= g["end_pos"]).all()
        assert (g["end_pos"].values[:-1] < g["start_pos"].values[1:]).all()


def test_chunk_boundaries_shift_resistant(spark):
    """Content-defined property: appending text only changes the LAST
    chunk (or adds chunks) — every earlier chunk survives byte-identical."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    spark_df = lambda txt: spark.createDataFrame([(1, txt)], "doc_id long, text string")
    a = content_chunks(spark_df(base.strip()), "doc_id", "text").toPandas()
    b = content_chunks(spark_df(base.strip() + " lambda mu nu xi"), "doc_id", "text").toPandas()
    a_rows = sorted(map(tuple, a[["chunk_id", "n_tokens", "start_pos", "end_pos"]].values))
    b_rows = sorted(map(tuple, b[["chunk_id", "n_tokens", "start_pos", "end_pos"]].values))
    assert a_rows[:-1] == b_rows[: len(a_rows) - 1]


def test_tfidf_matches_python_reference(spark, sf_dir):
    """Top-3 terms per doc match an independent Python recomputation of
    the rational formula; and at equal tf, rarer terms outrank commoner
    ones (the property shared with ln-idf)."""
    docs = _docs(spark, sf_dir).limit(40)
    out = tfidf_top_terms(docs, "doc_id", "text", 3)
    from flink_playground_spark.functions.tfidf import whitespace_tokens

    toks = whitespace_tokens(docs, "doc_id", "text")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf")).toPandas()
    dfq = tf.groupby("term")["doc_id"].nunique()
    n = docs.count()
    got = out.toPandas()
    assert got["doc_id"].nunique() == 40
    for doc_id, g in got.groupby("doc_id"):
        sub = tf[tf["doc_id"] == doc_id].copy()
        sub["score"] = sub.apply(
            lambda r: r["tf"] * ((n + 1.0) / (dfq[r["term"]] + 1.0)), axis=1
        )
        want = sub.sort_values(["score", "term"], ascending=[False, True])["term"].tolist()[:3]
        have = g.sort_values("term_rank")["term"].tolist()
        assert have == want, doc_id
        # equal-tf slices: ranking within them is by ascending df
        ranked = g.sort_values("term_rank")
        sub_tf = sub.set_index("term")["tf"]
        for i in range(len(ranked) - 1):
            a, b = ranked.iloc[i]["term"], ranked.iloc[i + 1]["term"]
            if sub_tf[a] == sub_tf[b]:
                assert (dfq[a], a) <= (dfq[b], b)


def test_stratified_plan_has_salted_prune(spark, sf_dir):
    """Two-level shape: the first row_number window partitions by
    (stratum, salt) — no single-partition pass over a whole stratum
    before pruning."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang")
    df = stratified_topk_sample(docs, ["lang"], "doc_id", 5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan
    assert plan.count("Window") >= 2


def test_chunk_fingerprints_catch_offset_shifted_passages(spark):
    """The same passage at different offsets in different docs yields
    identical chunk fingerprints (what fixed-size chunking misses)."""
    from flink_playground_spark.functions.chunking import chunk_fingerprints

    # 'gamma' and 'nu' are boundary tokens (md5 starts with '0'), so the
    # passage re-chunks identically wherever it starts: [gamma delta
    # epsilon zeta] ... [nu ...] are interior chunks at any offset.
    passage = "gamma delta epsilon zeta nu theta iota kappa gamma sigma tau rho"
    docs = spark.createDataFrame(
        [(1, "xx yy " + passage + " zz"), (2, "aa " + passage), (3, "unrelated words only here")],
        "doc_id long, text string",
    )
    fps = chunk_fingerprints(docs, "doc_id", "text").toPandas()
    # at least one multi-token interior chunk of the passage is common to docs 1 and 2
    multi = fps[fps["n_tokens"] >= 3]
    common = multi.groupby("chunk_fp")["doc_id"].nunique()
    assert (common >= 2).any(), fps
    shared = fps.groupby("chunk_fp")["doc_id"].apply(set)
    for fp in multi["chunk_fp"].unique():
        if len(shared[fp]) >= 2:
            assert 3 not in shared[fp]  # doc 3 shares no substantive chunk


def test_mixing_sample_hits_targets_and_underruns_visibly(spark, sf_dir):
    """Quotas are hit exactly where the stratum is large enough, the
    under-run stratum contributes everything it has, excluded strata
    contribute nothing, and the sample is stable under repartitioning."""
    from flink_playground_spark.functions.sampling import mixing_sample
    from flink_playground_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    targets = {"en": 0.50, "zh": 0.30, "de": 0.15, "fr": 0.05}
    sample = mixing_sample(docs, "lang", "doc_id", targets, total_n=200)
    counts = {r.lang: r.n for r in sample.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r.lang: r.n for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, share in targets.items():
        quota = int(200 * share + 0.5)
        assert counts.get(lang, 0) == min(quota, avail[lang]), (lang, counts, avail)
    assert "es" not in counts  # excluded stratum

    # repartition-stability: identical membership from a different layout
    again = mixing_sample(docs.repartition(13), "lang", "doc_id", targets, total_n=200)
    a = sorted(r.doc_id for r in sample.collect())
    b = sorted(r.doc_id for r in again.collect())
    assert a == b


def test_pack_sequences_bins_and_offsets(spark):
    """Golden packing: bins fill contiguously, a straddling doc stays in
    its starting bin, offsets restart correctly."""
    from flink_playground_spark.functions.chunking import pack_sequences

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),          # 4 tokens, start 0  -> bin 0, off 0
            (2, "e f g"),            # 3 tokens, start 4  -> bin 0, off 4
            (3, "h i j k l m"),      # 6 tokens, start 7  -> bin 0, off 7 (straddles)
            (4, "n o"),              # 2 tokens, start 13 -> bin 1, off 3
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_tokens, r.bin_id, r.offset_in_bin)
        for r in pack_sequences(docs, "doc_id", "text", budget=10).collect()
    }
    assert got == {1: (4, 0, 0), 2: (3, 0, 4), 3: (6, 0, 7), 4: (2, 1, 3)}


def test_curriculum_packed_export(spark, sf_dir, tmp_path):
    """The last mile to a trainer: quality-gate the corpus, order it by
    quality (curriculum), pack to a token budget, write one shard per
    bin. Every shard but the last fills to within one document of the
    budget, and shard membership is exactly the packing assignment."""
    from pyspark.sql import Window

    from flink_playground_spark.functions.chunking import pack_sequences
    from flink_playground_spark.functions.quality import repetition_signals
    from flink_playground_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = docs.join(repetition_signals(docs, "doc_id", "text"), "doc_id")
    kept = sig.filter((F.col("n_tokens") >= 50) & (F.col("ttr") >= 0.2))
    # curriculum: highest type-token ratio first, deterministic ties
    ordered = kept.withColumn(
        "__order",
        F.row_number().over(Window.orderBy(F.desc("ttr"), F.asc("doc_id"))).cast("long"),
    )
    budget = 4096
    packed = pack_sequences(ordered, "doc_id", "text", budget=budget, order_col="__order")

    out = str(tmp_path / "shards")
    (
        docs.join(packed.select("doc_id", "bin_id"), "doc_id")
        .write.partitionBy("bin_id")
        .parquet(out)
    )

    stats = {
        r.bin_id: (r.toks, r.n)
        for r in packed.groupBy("bin_id")
        .agg(F.sum("n_tokens").alias("toks"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(stats) >= 2
    max_doc = packed.agg(F.max("n_tokens")).first()[0]
    last = max(stats)
    for b, (toks, _) in stats.items():
        if b != last:
            # a bin closes only once its budget is crossed
            assert toks >= budget - max_doc, (b, toks)
            assert toks <= budget + max_doc, (b, toks)

    # shard membership on disk == the packing assignment
    back = spark.read.parquet(out).groupBy("bin_id").count().collect()
    assert {r.bin_id: r["count"] for r in back} == {b: n for b, (_, n) in stats.items()}


def test_intradoc_chunk_dedup_drops_repeated_passage(spark):
    """A doc that repeats a passage verbatim loses the second occurrence;
    the first occurrence and surrounding text survive in order. A doc
    without repetition round-trips to its whitespace-normalized self."""
    from flink_playground_spark.functions.chunking import (
        chunk_fingerprints,
        dedup_chunks_within_doc,
    )
    from flink_playground_spark.sources.memory import from_rows

    passage = "alpha beta gamma delta epsilon zeta eta theta " * 4
    clean_doc = "one two three four five six seven"
    rows = [(1, f"{passage}{passage}tail marker"), (2, clean_doc)]
    docs = from_rows(spark, rows, ["doc_id", "text"], [int, str])

    out = {r["doc_id"]: r for r in dedup_chunks_within_doc(docs, "doc_id", "text").collect()}
    assert out[2]["cleaned_text"] == clean_doc
    assert out[2]["n_kept"] == out[2]["n_chunks"]

    d1 = out[1]
    assert d1["n_kept"] < d1["n_chunks"]
    assert d1["cleaned_text"].endswith("tail marker")
    # the cleaned text's chunks are now all distinct
    cleaned_df = from_rows(
        spark, [(1, d1["cleaned_text"])], ["doc_id", "text"], [int, str]
    )
    fps = chunk_fingerprints(cleaned_df, "doc_id", "text").toPandas()
    assert fps["chunk_fp"].is_unique


def test_crossdoc_passage_dedup_keeps_global_first(spark):
    """A passage shared by two docs survives only in the lower doc_id;
    a doc made ENTIRELY of previously-seen passages is rewritten to ''
    (kept as a row, not silently dropped); unshared text is untouched."""
    from flink_playground_spark.functions.chunking import dedup_chunks_global
    from flink_playground_spark.sources.memory import from_rows

    passage = "alpha beta gamma delta epsilon zeta eta theta " * 4
    rows = [
        (1, f"{passage}tail marker"),
        (2, f"{passage}own words here"),   # shared prefix must vanish
        (3, f"{passage}tail marker"),      # byte-identical to doc 1 -> ''
        (4, "completely unrelated text"),
    ]
    docs = from_rows(spark, rows, ["doc_id", "text"], [int, str])
    out = {r["doc_id"]: r for r in dedup_chunks_global(docs, "doc_id", "text").collect()}

    assert len(out) == 4
    assert out[1]["cleaned_text"].endswith("tail marker")
    # doc 1 owns every first copy; its ×4 INTERNAL repeat is deduped too
    # (global keep-first subsumes the intra-doc rule)
    assert 0 < out[1]["n_kept"] < out[1]["n_chunks"]
    assert out[1]["cleaned_text"].startswith("alpha beta gamma")
    assert "alpha beta gamma" not in out[2]["cleaned_text"]
    assert out[2]["cleaned_text"].endswith("own words here")
    assert out[2]["n_kept"] < out[2]["n_chunks"]
    assert out[3]["cleaned_text"] == "" and out[3]["n_kept"] == 0
    assert out[4]["cleaned_text"] == "completely unrelated text"
