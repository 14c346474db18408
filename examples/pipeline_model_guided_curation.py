"""Capstone: MODEL-GUIDED curation — the round-4 operators composed into
the 'classifier + LM + global dedup + vector index' loop modern
training-data pipelines run (CCNet / GPT-3 / LLaMA recipes), entirely
as engine operators.

documents
  → corpus-wide passage dedup (C4 global span rule, keep-first rewrite)
  → self-trained bigram-LM scoring (perplexity-style signal)
  → logistic-regression quality gate TRAINED IN-ENGINE
    (gradient steps = aggregates; LM score + length + TTR as features)
  → kept docs PQ-indexed for semantic serving (8 codes per embedding,
    ADC lookup-table search)

Nothing model-shaped leaves the engine: the LM is two count relations,
the classifier is four driver doubles, the ANN index is a codes table.

Run: ``python examples/pipeline_model_guided_curation.py``
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from flink_playground_spark import get_spark
from flink_playground_spark.functions.chunking import dedup_chunks_global
from flink_playground_spark.functions.classifier import predict_logreg, train_logreg
from flink_playground_spark.functions.lm import _tok_array, bigram_lm_scores
from flink_playground_spark.functions.similarity import pq_encode, pq_topk, pq_train

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    spark = get_spark("model-guided-curation")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    n0 = docs.count()

    # 1. global passage dedup: every span survives exactly once
    cleaned = dedup_chunks_global(docs, "doc_id", "text")
    rewritten = cleaned.filter(F.col("n_kept") < F.col("n_chunks")).count()
    emptied = cleaned.filter(F.col("n_kept") == 0).count()
    docs = (
        docs.drop("text")
        .join(cleaned.filter(F.col("n_kept") > 0), "doc_id")
        .withColumnRenamed("cleaned_text", "text")
    )

    # 2. LM scoring: the corpus's own bigram model ranks in-domain fit
    lm = bigram_lm_scores(docs, "doc_id", "text")
    docs = docs.join(lm, "doc_id")

    # 3. classifier gate: train LR on scan-local features + the LM
    #    score; demo label = 'en'. Each GD step is one aggregate.
    toks = _tok_array("text")
    feats = docs.select(
        "doc_id",
        "source",
        (F.col("avg_logprob") / 10.0).alias("f_lm"),
        (F.size(toks).cast("double") / 100.0).alias("f_len"),
        F.when(
            F.size(toks) > 0,
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks).cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("f_ttr"),
        (F.col("lang") == "en").cast("int").alias("label"),
    ).persist()
    w = train_logreg(feats, ["f_lm", "f_len", "f_ttr"], "label", iters=6, lr=1.0)
    scored = predict_logreg(feats, ["f_lm", "f_len", "f_ttr"], w)
    # production gates keep a score QUANTILE (budget-tuned), not the
    # 0.5 decision boundary: keep the top half by classifier prob,
    # rank-based so the cut is exact and deterministic
    from pyspark.sql import Window

    half = scored.count() // 2
    kept = (
        scored.withColumn(
            "r",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(F.desc("prob"), F.asc("doc_id"))
            ),
        )
        .filter(F.col("r") <= half)
        .drop("r")
    )
    n_kept = kept.count()

    # 4. PQ-index the kept docs' embeddings for semantic serving
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").join(
        kept.select(F.col("doc_id").alias("vec_id")), "vec_id", "left_semi"
    )
    book = pq_train(emb, dim=64, m=8, k=16, iters=1)
    codes = pq_encode(emb, book, dim=64, m=8)
    n_codes = codes.count()
    probes = emb.orderBy("vec_id").limit(3)
    hits = pq_topk(emb, probes, dim=64, m=8, n_codes=16, k=3, iters=1)

    print(f"docs {n0} -> passage-rewritten {rewritten} (emptied {emptied})")
    print(f"classifier w = {[round(x, 4) for x in w]}; kept top-half {n_kept}/{n0} by prob")
    print(f"PQ index rows: {n_codes} (8 bytes-ish per doc vs 256B floats)")
    hits.show(9, truncate=False)
    spark.stop()


if __name__ == "__main__":
    main()
