"""TF-IDF-style term scoring over a document corpus.

Classic tf-idf weights tf · ln(N/df). A natural log is the one piece
that is NOT bit-portable across engines (libm vs StrictMath differ in
the last ulp), so the engine scores with the RATIONAL idf

    score = tf · (N + 1) / (df + 1)

computed in IEEE doubles from exact integers: the division and the
multiplication are each correctly rounded, so every engine produces the
identical bit pattern. x ↦ (N+1)/(x+1) is strictly decreasing like
-ln, so rarer terms always outrank commoner ones AT EQUAL tf; the
composite tf·idf ordering is its own member of the tf-idf family (a
harder idf than log — it discounts common terms more aggressively),
not a reordering-free substitute for the ln formulation. Swap in
``F.log`` if classic weights matter more than cross-engine
bit-equality.

Plan shape (one token explode, two aggregations, no UDF):

  tokens → tf: groupBy (doc, term)          — shuffle 1 (map-side combine)
  tf     → df: groupBy term (count rows)    — shuffle 2 (vocab-sized)
  tf ⨝ df on term                           — shuffle join (vocabulary can
                                              exceed broadcast size at
                                              100 TB; AQE broadcasts it
                                              when it is actually small)
  N                                          — scalar, broadcast
  top-k per doc: window over doc_id          — bounded by distinct terms
                                              per document

Training-pipeline extension family (SURVEY §7.1); no reference
counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def whitespace_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, token occurrence), whitespace-split, empties
    dropped — granular enough for tf; positions live in chunking.py."""
    return (
        df.select(id_col, F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("term"))
        .filter(F.col("term") != "")
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k terms per document by rational-idf tf-idf. Output:
    (id_col, term, score double, term_rank) — deterministic ties broken
    by term text."""
    toks = whitespace_tokens(df, id_col, text_col)
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .withColumn(
            "score",
            F.col("tf").cast("double")
            * ((F.col("__n") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("score"), F.asc("term"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("term_rank") <= k)
        .select(id_col, "term", "score", "term_rank")
    )
