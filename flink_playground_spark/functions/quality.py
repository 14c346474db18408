"""Corpus quality signals and PII scrubbing for training-data pipelines.

Two families beyond functions/text.py's scan-stage scores:

- Repetition/diversity signals (the Gopher-rules family: Rae et al. 2021,
  "Scaling Language Models", App. A1.1): type-token ratio, top-token
  fraction, duplicate-bigram fraction. These need per-document term
  frequencies, so they are explode + two hash aggregations (map-side
  combined, keyed on (doc, term) then doc — never a per-doc collect, no
  interpreted array lambdas; see PERF.md on why `aggregate`/`transform`
  lambdas are banned from hot paths).
- PII redaction: email / IPv4 / phone masking with counts, as pure
  ``regexp_replace`` / ``regexp_extract_all`` column expressions in the
  scan stage. Patterns deliberately avoid lookarounds so the Java-regex
  (Spark) and RE2 (DuckDB oracle) engines accept identical strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flink_playground_spark.functions.text import TOKEN_RE

# Lookaround-free, Java-regex- and RE2-compatible.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
PHONE_RE = r"\+?[0-9]{1,3}[- ]\(?[0-9]{3}\)?[- ][0-9]{3}[- ]?[0-9]{4}"


def pii_redact(
    df: DataFrame, text_col: str = "text", out_col: str = "redacted"
) -> DataFrame:
    """Mask emails -> <EMAIL>, IPv4 -> <IP>, phones -> <PHONE>; count each.

    Order matters: emails first (an address can embed digit runs), then
    IPs, then phones. All four derived columns are codegen'd expressions
    evaluated in the scan stage — zero Python, zero shuffle.
    """
    c = F.col(text_col)
    return (
        df.withColumn("n_emails", F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), 0)))
        .withColumn("n_ips", F.size(F.regexp_extract_all(c, F.lit(IPV4_RE), 0)))
        .withColumn("n_phones", F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), 0)))
        .withColumn(
            out_col,
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>"
                ),
                PHONE_RE,
                "<PHONE>",
            ),
        )
    )


def repetition_signals(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document repetition/diversity metrics.

    Returns (id, n_tokens, ttr, top_tok_frac, dup_bigram_frac):
      ttr            distinct tokens / tokens  (low => repetitive)
      top_tok_frac   most-frequent token's share of all tokens
      dup_bigram_frac 1 - distinct bigrams / bigrams (Gopher's
                     duplicate-n-gram family at n=2)

    Shape at scale: one explode of the token array, a (doc, term) count,
    then a per-doc rollup — two hash aggregations with map-side combine,
    both keyed by doc id (well distributed; per-doc cardinality is
    bounded by document length, not corpus size). Empty documents get
    zero signals, not NULLs.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0).alias("_toks"),
    )
    ex = toks.select(
        "_id", F.posexplode_outer("_toks").alias("_pos", "_tok")
    )
    # bigram = this token + next token within the same document; the lead
    # window partitions by doc and is bounded by doc length
    from pyspark.sql.window import Window

    w = Window.partitionBy("_id").orderBy("_pos")
    ex = ex.withColumn("_big", F.concat_ws(" ", "_tok", F.lead("_tok").over(w)))
    per_term = ex.groupBy("_id", "_tok").agg(
        F.count("_tok").alias("_tf"),
        F.count_distinct(
            F.when(F.col("_big").contains(" "), F.col("_big"))
        ).alias("_dbig"),
        F.sum(F.when(F.col("_big").contains(" "), 1).otherwise(0)).alias("_nbig"),
    )
    out = per_term.groupBy("_id").agg(
        F.sum("_tf").alias("n_tokens"),
        F.count(F.when(F.col("_tok").isNotNull(), 1)).alias("_types"),
        F.max("_tf").alias("_maxtf"),
        F.sum("_dbig").alias("_dbigrams"),
        F.sum("_nbig").alias("_bigrams"),
    )
    nz = lambda num, den: F.when(F.col(den) > 0, F.round(num / F.col(den), 6)).otherwise(
        F.lit(0.0)
    )
    return out.select(
        F.col("_id").alias(id_col),
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        nz(F.col("_types"), "n_tokens").alias("ttr"),
        nz(F.col("_maxtf"), "n_tokens").alias("top_tok_frac"),
        F.when(
            F.col("_bigrams") > 0,
            F.round(1 - F.col("_dbigrams") / F.col("_bigrams"), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("dup_bigram_frac"),
    )
