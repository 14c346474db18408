"""Capstone: a training-data curation pipeline composed from the engine's
operators — the 100 TB shape, runnable on the local corpus.

documents → exact dedup → near-dup removal (MinHash-LSH verified) →
quality/language filter → token accounting → cross-document passage
audit (content-defined chunking) → corpus signature terms (tf-idf) →
deterministic stratified eval sample + Bernoulli train/heldout split →
decontamination of train against eval (8-gram overlap) → domain mixing
to target proportions → fixed-token-budget sequence packing.
Every stage is a shuffle-aware DataFrame transform; nothing collects to
the driver until the final show.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.functions.dedupe import dedup_exact, minhash_lsh_pairs
from flink_playground_spark.functions.text import fingerprint, lang_id, quality_score, token_count

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("training-data-pipeline")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. exact dedup (fingerprint hash-groupBy)
    docs = dedup_exact(docs, "doc_id", "text")
    n1 = docs.count()

    # 2. near-dup removal: MinHash-LSH candidates verified by exact
    #    Jaccard; drop the higher doc_id of each confirmed pair
    pairs = minhash_lsh_pairs(docs, "doc_id", "text", threshold=0.8)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(losers, "doc_id", "left_anti")
    n2 = docs.count()

    # 3. quality + language gate (all JVM-side column expressions)
    docs = docs.withColumn("quality", quality_score("text")).withColumn(
        "pred_lang", lang_id("text")
    )
    curated = docs.filter(
        (F.col("quality") >= 0.5) & (F.col("pred_lang") != "und")
    ).persist()  # consumed by the ledger, passage audit, tf-idf and split below
    n3 = curated.count()

    # 4. token accounting per source (the training-mix ledger)
    ledger = (
        curated.withColumn("n_tokens", token_count("text"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
        .orderBy("source")
    )

    # 5. passage audit: verbatim chunks shared across documents
    #    (content-defined boundaries catch offset-shifted duplication
    #    that document-level dedup can't see). Run before AND after
    #    curation — the delta is what near-dup removal cleaned up.
    from flink_playground_spark.functions.chunking import chunk_fingerprints

    def shared_passages(frame):
        return (
            chunk_fingerprints(frame, "doc_id", "text")
            .filter(F.col("n_tokens") >= 4)
            .groupBy("chunk_fp")
            .agg(F.count_distinct("doc_id").alias("n_docs"))
            .filter(F.col("n_docs") >= 2)
        )

    # 6. corpus signature terms (tf-idf, rational idf) — the vocabulary
    #    drift ledger a recurring ingestion job would diff run-over-run
    from flink_playground_spark.functions.tfidf import tfidf_top_terms

    top_terms = tfidf_top_terms(curated, "doc_id", "text", 1)

    # 7. deterministic eval sample + split: exactly 5 docs per language
    #    for eval (stable under repartition/re-runs), then a hash
    #    Bernoulli train/heldout split of the rest — md5-keyed, so the
    #    assignment is reproducible on any engine
    from flink_playground_spark.functions.sampling import (
        bernoulli_hash_sample,
        sample_hash,
        stratified_topk_sample,
    )

    # stratify on the declared lang (the corpus's word-soup text all
    # lang-IDs as English, so pred_lang has one stratum)
    eval_set = stratified_topk_sample(curated, ["lang"], "doc_id", 5)
    rest = curated.join(eval_set.select("doc_id"), "doc_id", "left_anti")
    train = bernoulli_hash_sample(rest, "doc_id", "e0").persist()  # ~87.5 %
    n_train = train.count()
    heldout = rest.filter(sample_hash("doc_id") >= "e0")

    # 8. decontaminate TRAIN against the eval set (round-3 stage): any
    #    train doc sharing an 8-token shingle with an eval doc is dropped
    #    — the leakage document-level dedup can't see
    from flink_playground_spark.functions.dedupe import contamination_overlap

    contaminated = contamination_overlap(
        train, eval_set, "doc_id", "text", n=8
    ).select("doc_id")
    clean_train = train.join(contaminated, "doc_id", "left_anti").persist()

    # 9. mix to target domain proportions (broadcast quota table,
    #    under-runs visible) and pack into fixed-token-budget sequences
    #    for the trainer — the export shape a 100 TB run shards by bin
    from flink_playground_spark.functions.chunking import pack_sequences
    from flink_playground_spark.functions.sampling import mixing_sample

    langs = [r["lang"] for r in clean_train.select("lang").distinct().collect()]
    mixed = clean_train.join(
        mixing_sample(
            clean_train,
            "lang",
            "doc_id",
            {lang: 1.0 / len(langs) for lang in langs},
            total_n=200,
        ).select("doc_id"),
        "doc_id",
    )
    packed = pack_sequences(mixed, "doc_id", "text", budget=2048)
    bins = packed.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("fill")
    )

    print(f"documents: {n0} → exact-dedup {n1} → near-dup {n2} → quality/lang gate {n3}")
    ledger.show(25, truncate=False)
    raw_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    print(
        f"shared ≥4-token passages: raw corpus {shared_passages(raw_docs).count()}"
        f" → curated {shared_passages(curated).count()}"
    )
    top_terms.orderBy("doc_id").show(5, truncate=False)
    print(
        f"eval {eval_set.count()} (5/lang) | train {n_train} | heldout {heldout.count()}"
    )
    print(
        f"decontam dropped {n_train - clean_train.count()} train docs "
        f"sharing 8-grams with eval | mixed sample {mixed.count()} docs"
    )
    bins.orderBy("bin_id").show(5, truncate=False)
    curated.select("doc_id", fingerprint("text").alias("fp")).show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
