"""Quality signals (functions/quality.py): crafted-fixture goldens for
PII redaction (the corpus has none) and a hand-computed repetition check."""

from flink_playground_spark.functions.quality import pii_redact, repetition_signals


def test_pii_redact_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@corp.example.com or 10.0.255.7 now"),
            (2, "call +1 (555) 123-4567 about 1.2.3.4 and a@b.io c@d.org"),
            (3, "no pii here, just text with one dot. done"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_redact(df, "text").collect()}
    assert rows[1]["n_emails"] == 1 and rows[1]["n_ips"] == 1 and rows[1]["n_phones"] == 0
    assert rows[1]["redacted"] == "contact <EMAIL> or <IP> now"
    assert rows[2]["n_emails"] == 2 and rows[2]["n_ips"] == 1 and rows[2]["n_phones"] == 1
    assert rows[2]["redacted"] == "call <PHONE> about <IP> and <EMAIL> <EMAIL>"
    assert rows[3]["n_emails"] == rows[3]["n_ips"] == rows[3]["n_phones"] == 0
    assert rows[3]["redacted"] == rows[3]["text"]


def test_repetition_signals_hand_computed(spark):
    # "a b a b a": tokens=5, types=2, maxtf=3 -> ttr=0.4, top=0.6;
    # bigrams = [a b, b a, a b, b a] -> 4 total, 2 distinct -> dup=0.5
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "x y z"), (3, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert rows[1]["n_tokens"] == 5
    assert rows[1]["ttr"] == 0.4
    assert rows[1]["top_tok_frac"] == 0.6
    assert rows[1]["dup_bigram_frac"] == 0.5
    # all-distinct doc: ttr 1.0, no duplicate bigrams
    assert rows[2]["ttr"] == 1.0 and rows[2]["dup_bigram_frac"] == 0.0
    # empty doc: zero signals, present in the output (posexplode_outer)
    assert rows[3]["n_tokens"] == 0 and rows[3]["ttr"] == 0.0
