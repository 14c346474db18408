"""Byte-pair-encoding tokenizer TRAINED on the cluster — the real
version of the ``text_analysis`` query's "BPE-ish" regex count.

Training-data pipelines tokenize with a vocabulary learned FROM the
corpus (Sennrich et al., "Neural Machine Translation of Rare Words with
Subword Units", ACL 2016). The standard trick makes this cluster-cheap:
BPE statistics live on the WORD-FREQUENCY table, not the corpus — one
corpus scan builds ``(word, freq)``, and everything after that touches
only distinct words (vocabulary ≪ corpus; at 100 TB the corpus scan is
the only corpus-sized stage, exactly like the tf-idf/BM25 layouts).

Division of labor (this is the round-5 shape; round 4 ran one Spark job
PER merge round, i.e. a 32k-merge production vocabulary would have been
32k sequential jobs):

- the cluster does the two things that scale with the corpus — word
  counting (map-side combined) and encoding (one Arrow-batched pass
  over distinct words, merges applied in-process);
- the driver runs the merge-selection loop on the collected (bounded,
  already-aggregated) word-frequency table with incrementally
  maintained pair counts — O(touched words) per merge, so hundreds of
  merges take seconds and the Spark job count is O(1) in ``n_merges``.

Merges apply left-to-right, non-overlapping — "a a a a" + (a,a) →
[aa, aa] — the reference BPE behavior; winner is max pair frequency
with ties to the lexicographically smallest (left, right). Everything
is integer-count arithmetic on exact strings, so the construction is
bit-portable to the pure-Python oracle (reference.py
bpe_token_stats_ref), which recomputes pair counts from scratch each
round — the incremental bookkeeping here is provably the same numbers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_playground_spark.functions.tfidf import whitespace_tokens


def _apply_merge_py(syms: list[str], left: str, right: str) -> list[str]:
    """Left-to-right non-overlapping merge of adjacent (left, right)
    symbol pairs — identical fold to reference.py _bpe_apply_ref."""
    out: list[str] = []
    for s in syms:
        if out and out[-1] == left and s == right:
            out[-1] = left + right
        else:
            out.append(s)
    return out


def word_frequencies(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, freq) over the whitespace token stream — the one
    corpus-sized stage of BPE training (map-side combined count)."""
    return (
        whitespace_tokens(df, id_col, text_col)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )


def _learn_merges_local(
    freqs: dict[str, int], n_merges: int, min_freq: int
) -> list[tuple[str, str]]:
    """Driver-side BPE merge selection with incremental pair counts.

    Each round: pick min by (-count, pair) — same tie-break as the
    oracle's full recount — then re-count only the words that contain
    the merged pair (``where`` index), decrementing every old pair of
    the word and incrementing every new one, so counts stay exactly the
    recount-from-scratch values."""
    words = list(freqs.items())
    syms = [list(w) for w, _ in words]
    pair_counts: dict[tuple[str, str], int] = {}
    where: dict[tuple[str, str], set[int]] = {}
    for i, (_, f) in enumerate(words):
        for p in zip(syms[i], syms[i][1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            where.setdefault(p, set()).add(i)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best_pair, best_n = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best_n < min_freq:
            break
        merges.append(best_pair)
        left, right = best_pair
        for i in list(where.get(best_pair, ())):
            f = words[i][1]
            old = syms[i]
            new = _apply_merge_py(old, left, right)
            for p in zip(old, old[1:]):
                c = pair_counts[p] - f
                if c:
                    pair_counts[p] = c
                else:
                    del pair_counts[p]
                # p can occur twice in one word; the first occurrence may
                # already have emptied and dropped the index entry
                s = where.get(p)
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[p]
            for p in zip(new, new[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                where.setdefault(p, set()).add(i)
            syms[i] = new
    return merges


def learn_bpe(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 16,
    min_freq: int = 1,
    max_words: int | None = None,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns them in
    rank order. ONE Spark job (the word-frequency aggregate) regardless
    of merge count; selection runs on the driver over the bounded
    vocabulary table. Deterministic: integer counts, ties to the
    lexicographically smallest (left, right); stops early when no pair
    reaches ``min_freq``.

    ``max_words`` caps driver memory on noisy web-scale corpora by
    keeping only the most frequent words (ties by word text — a
    bounded TakeOrdered, not a global sort). The cap is part of the
    deterministic spec (reference.py ``bpe_token_stats_ref`` applies
    the identical (-freq, word) top-N), so capped runs stay bit-exact
    against the Python oracle. CONTRACT: pipeline callers — anything
    that might see an unbounded web-scale vocabulary, including the
    registry's ``bpe_token_stats`` — pass an explicit cap; ``None``
    (collect the FULL vocabulary driver-side) is reserved for
    bounded-corpus unit tests that exercise exact whole-vocabulary
    training, and is the OOM at 100 TB otherwise."""
    wf = word_frequencies(df, id_col, text_col)
    if max_words is not None:
        wf = wf.orderBy(F.desc("freq"), F.asc("word")).limit(max_words)
    freqs = {r["word"]: int(r["freq"]) for r in wf.collect()}
    return _learn_merges_local(freqs, n_merges, min_freq)


def encode_words(words: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply learned merges in rank order to a ``(word, ...)`` table;
    adds ``tokens array<string>``. ONE Arrow-batched stage: the merge
    list ships in the UDF closure (vocab-bounded) and each distinct
    word is encoded in-process — cost ∝ distinct words × merges with
    no per-merge plan stages (round 4 chained one JVM fold per merge,
    which meant ``n_merges`` codegen stages)."""
    merge_list = list(merges)

    @F.pandas_udf("array<string>")
    def _encode(col):
        import pandas as pd

        def enc(word):
            toks = list(word)
            for left, right in merge_list:
                toks = _apply_merge_py(toks, left, right)
            return toks

        return pd.Series([enc(w) for w in col])

    return words.withColumn("tokens", _encode(F.col("word")))


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
