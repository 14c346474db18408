"""Byte-pair-encoding tokenizer TRAINED on the cluster — the real
version of the ``text_analysis`` query's "BPE-ish" regex count.

Training-data pipelines tokenize with a vocabulary learned FROM the
corpus (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016). The standard trick makes this cluster-cheap:
BPE statistics live on the WORD-FREQUENCY table, not the corpus — one
corpus scan builds ``(word, freq)``, and every merge round then touches
only distinct words (vocabulary ≪ corpus; at 100 TB the corpus scan is
the only corpus-sized stage, exactly like the tf-idf/BM25 layouts).

Each round is: explode adjacent symbol pairs weighted by word freq →
one aggregate → take the max-frequency pair (ties: lexicographic
smallest, so the whole construction is deterministic and integer-only —
bit-portable to the pure-Python reference) → rewrite the symbol arrays
with the merge applied. The rewrite is a left fold (``F.aggregate``)
over each word's symbols: merges apply left-to-right, non-overlapping —
"a a a a" + (a,a) → [aa, aa] — the reference BPE behavior.

Encoding replays the learned merges in rank order over the distinct
words of the corpus being encoded, then joins word → tokens back to
token positions. Rounds are a bounded driver loop (R merges), the same
shape as ``kmeans_centroids``' Lloyd iterations; per-round state is the
vocabulary table, checkpointed so plans don't re-run earlier rounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flink_playground_spark.functions.tfidf import whitespace_tokens


def _apply_merge(syms: Column, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    symbol pairs: fold each symbol onto the output array, fusing it into
    the output's tail when the pair matches."""
    l, r = F.lit(left), F.lit(right)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l) & (s == r),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.concat(l, r))
            ),
        ).otherwise(F.concat(acc, F.array(s))),
    )


def word_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace+lowercase token stream — the one
    corpus-sized stage of BPE training (map-side combined count)."""
    return (
        whitespace_tokens(df, id_col, text_col)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def learn_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 16,
    min_freq: int = 1,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order. Deterministic: pair counts are integers, the winner is
    max freq with ties to the lexicographically smallest (left, right).
    Stops early if no pair reaches ``min_freq``."""
    vocab = word_frequencies(df, id_col, text_col).withColumn(
        "syms", F.split(F.col("word"), "")
    )
    vocab = vocab.localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            vocab.select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("n"))
        )
        top = pairs.orderBy(F.desc("n"), F.asc("l"), F.asc("r")).limit(1).collect()
        if not top or top[0]["n"] < min_freq:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((left, right))
        vocab = vocab.withColumn("syms", _apply_merge(F.col("syms"), left, right))
        vocab = vocab.localCheckpoint(eager=True)
    return merges


def encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges in rank order to a ``(word, ...)`` table;
    adds ``tokens array<string>``. Cost ∝ distinct words × merges."""
    out = words.withColumn("tokens", F.split(F.col("word"), ""))
    for i, (left, right) in enumerate(merges):
        out = out.withColumn("tokens", _apply_merge(F.col("tokens"), left, right))
        if (i + 1) % 8 == 0:
            # bound expression-tree depth: 8 folds per codegen stage
            out = out.localCheckpoint(eager=True)
    return out


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Corpus-wide subword frequency table ``(token, n)`` under the
    learned vocabulary: encode DISTINCT words once, weight each word's
    tokens by the word's corpus frequency — the corpus is scanned once
    (for word counts); encoding never touches it."""
    wf = word_frequencies(df, id_col, text_col)
    enc = encode_words(wf, merges)
    return (
        enc.select("freq", F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("n"))
    )
