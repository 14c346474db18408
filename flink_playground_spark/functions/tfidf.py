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


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under BM25 with the
    rational idf (Robertson-Sparck Jones odds WITHOUT the log — see the
    module docstring for why ln is not bit-portable; x -> (N-df+0.5)/
    (df+0.5) is strictly decreasing in df like the log form, so
    rarer-term contributions still dominate):

        score(D) = sum_t  (N - df + 0.5)/(df + 0.5)
                        * tf*(k1+1) / (tf + k1*((1-b) + b*(dl*N/sum_dl)))

    Bit-portability of the SUM: float addition is order-sensitive, so
    the per-term contributions are NOT summed with a group aggregate
    (arbitrary order). Each term's contribution is pulled out with a
    single-match conditional aggregate and the (few) terms are added in
    the fixed, documented query order — an oracle running the identical
    fixed-order addition reproduces the exact bit pattern.

    Plan: token explode -> dl per doc (shuffle 1) -> tf for QUERY TERMS
    ONLY (the term filter prunes before the (doc, term) aggregate;
    shuffle 2) -> tiny df(term) and (N, sum_dl) scalars broadcast ->
    per-doc fixed-order sum + top-k. Scales as two key shuffles over
    the corpus regardless of query count.
    """
    toks = whitespace_tokens(df, id_col, text_col)
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    g = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    tfq = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dft = tfq.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    contrib = (
        tfq.join(F.broadcast(dft), "term")
        .join(dl, id_col)
        .join(F.broadcast(g))
        .withColumn(
            "c",
            ((F.col("n") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
            * (
                (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (F.lit(1.0 - b) + F.lit(b) * ((F.col("dl") * F.col("n")) / F.col("sum_dl")))
                )
            ),
        )
    )
    score = None
    per_term = contrib.groupBy(id_col).agg(
        *[
            F.coalesce(
                F.first(F.when(F.col("term") == t, F.col("c")), ignorenulls=True),
                F.lit(0.0),
            ).alias(f"__c{i}")
            for i, t in enumerate(query_terms)
        ]
    )
    for i in range(len(query_terms)):
        col = F.col(f"__c{i}")
        score = col if score is None else score + col
    # two-level top-k (same pattern as brute_force_topk): rank inside
    # hash-salt groups first so no single partition ever sees the full
    # scored corpus, then re-rank the <= k*n_salt survivors globally
    scored = per_term.withColumn("score", F.round(score, 6)).withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(64))
    )
    w_local = Window.partitionBy("__salt").orderBy(F.desc("score"), F.asc(id_col))
    survivors = scored.withColumn("__lr", F.row_number().over(w_local)).filter(
        F.col("__lr") <= k
    )
    # single-partition by construction: the survivor set is <= k*64 rows
    # (one local top-k per salt). single_group() pins that bound in the
    # plan so gate runs stay free of "No Partition Defined" warnings and
    # any NEW unbounded global window is the only one left.
    from flink_playground_spark.operators.windows import single_group

    w_global = Window.partitionBy(single_group(id_col)).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w_global).cast("long"))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )
