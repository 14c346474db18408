"""N-gram language-model scoring — the perplexity-style quality signal
(CCNet / Gopher pipelines score documents with a KenLM model and drop
the worst tail; the model here is trained ON the corpus itself, which
is the self-scoring variant used for in-domain outlier detection).

Train = two counting aggregates over the token stream (bigram counts
and history counts), entirely map-side-combinable; score = join each
document's bigrams to the (broadcastable-after-filter) count tables and
fold per-doc log-probabilities. The corpus is scanned once for counts
and once for scoring — no per-row Python, no model object: the "model"
IS a DataFrame, so it ships, persists, and merges like any other state
(fold bigram counts through a streaming state store and this becomes an
incrementally-maintained LM).

Determinism discipline (what makes the DuckDB oracle a full value
check): probabilities are plain double ratios, each bigram's
``ln(p)`` is rounded to 6dp FIRST, the per-doc sum runs as exact
DECIMAL (order-free — float addition order is partition-dependent),
and the final average divides in double and rounds to 6dp.

Bigrams are built scan-locally by zipping the token array against its
own tail (no window shuffle): adjacency is over the EMPTY-FILTERED
token sequence on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tok_array(text_col: str) -> Column:
    return F.filter(
        F.split(F.trim(F.col(text_col)), " "), lambda x: x != F.lit("")
    )


def doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per (doc, bigram occurrence): ``(id, w1, w2)`` over the
    empty-filtered whitespace tokens. Scan-local (array zip, no window).

    The input is ``_spread`` (round 13): the zip_with/slice/filter
    lambdas are interpreted per row, and one local parquet split = one
    task running all of it serially — a no-op at real scale, where
    splits exceed parallelism."""
    from flink_playground_spark.functions.similarity import _spread

    df = _spread(df, id_col)
    t = _tok_array(text_col)
    pairs = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    return df.select(id_col, F.explode(pairs).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )


def bigram_lm_scores(
    df: DataFrame, id_col: str, text_col: str, alpha: float = 0.5
) -> DataFrame:
    """Per-document average bigram log-probability under the corpus's
    own add-``alpha``-smoothed bigram model.

    ``p(w2|w1) = (c(w1,w2) + alpha) / (c(w1,·) + alpha·V)`` with ``V`` =
    corpus vocabulary size. Output: ``(id, n_bigrams, avg_logprob)``,
    6dp; LOW avg_logprob = improbable token sequences = the quality-
    filter tail. Docs with fewer than 2 tokens have no bigrams and are
    excluded (both engines derive rows from the bigram stream).

    Shuffle budget: two counting aggregates (model), two joins of the
    bigram stream to the counts, one per-doc aggregate. The history and
    bigram count tables are vocabulary-sized — at web scale they stay
    dramatically smaller than the corpus, and Catalyst/AQE broadcasts
    them once they fit.
    """
    from pyspark.sql import Window

    from flink_playground_spark.functions.similarity import _spread

    # spread once here so both the bigram stream and the vocabulary
    # branch tokenize in parallel (doc_bigrams' own guard then no-ops)
    df = _spread(df, id_col)
    bg = doc_bigrams(df, id_col, text_col)
    # c(w1,·) = Σ_w2 c(w1,w2): the history count rides the bigram-count
    # relation as a window sum instead of a second full pass + shuffle
    # over the corpus-sized bigram stream — one model relation, ONE join
    # back to bg instead of two (round 13; counts identical by
    # definition, and the window sums exact small-integer doubles)
    # explicit partition count on the window's exchange: the window
    # needs hashpartitioning(w1) anyway, but AQE coalesced the tiny
    # local model relation to ONE partition, serializing the whole
    # vocabulary's sort+window on one core (round-14 profile: a 0.37s
    # single-task stage). REPARTITION_BY_NUM pins the count so the
    # coalescer leaves it alone; at scale this replaces — not adds to —
    # the window's own exchange (hash on w1 satisfies partitionBy(w1)).
    n_part = bg.sparkSession.sparkContext.defaultParallelism
    c2 = (
        bg.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("double").alias("c2"))
        .repartition(n_part, "w1")
        .withColumn("c1", F.sum("c2").over(Window.partitionBy("w1")))
    )
    vocab = (
        df.select(F.explode(_tok_array(text_col)).alias("w"))
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    a = float(alpha)
    scored = (
        bg.join(c2, ["w1", "w2"])
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "lp",
            F.round(
                F.log((F.col("c2") + F.lit(a)) / (F.col("c1") + F.lit(a) * F.col("v"))),
                6,
            ),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.round(
            F.sum(F.col("lp").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_logprob"),
    )
