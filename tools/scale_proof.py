"""Scale step-up proof: time heavy shapes at sf0.1 vs a 10× fixture.

``python tools/scale_up.py`` first (writes ``.scaledata/sf1``), then
``python tools/scale_proof.py [small_dir] [big_dir]``. For each probe
query: min-of-2 wall time at both SFs, the time ratio, and the ratio
normalized by the 10× data growth (``scaling`` < 1.0 = sublinear, ≈1 =
linear; >1 needs a root cause). Also probes the connected-components
round count at both SFs — pointer doubling must hold it O(log n), so
10× data may add at most ~log₂10 ≈ 3 rounds. Results go to
``SCALE_PROOF.json`` and are summarized in PERF.md.
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark  # noqa: E402
from flink_playground_spark.queries import EXTRA_REGISTRY, REGISTRY  # noqa: E402

PROBES = [
    "dedup_clusters",
    "minhash_lsh_neardup",
    "ngram_jaccard_neardup",
    "bm25_search",
    "cep_pattern_match",
    "exact_dedup_docs",
    "text_analysis",
    "corpus_clean_pipeline",
    "flagship_dedup_join",
    "q1_pricing_summary",
    "q3_revenue_by_order",
    "q6_forecast_revenue",
    "q18_large_volume_customer",
    "cosine_topk",
    "semantic_dedup_clusters",
    "decontaminate_overlap",
    "corpus_similarity",
    "adaptive_quality_filter",
    "sequence_packing_sharded",
    # round 4
    "ann_pq_topk",
    "crossdoc_passage_dedup",
    "bigram_lm_score",
    "quality_classifier",
    "streaming_broadcast_rules",
    # round 5 rewrites: prove the new algorithms stay sublinear
    "embedding_pca",  # one-scan scatter matrix + driver eigensolve
    "bpe_token_stats",  # corpus word count + driver merges + one encode pass
    # round 6: verdict item 5 — the wave protocol's per-batch cost must
    # track wave size, not total state
    "streaming_window_topn",
    # round 7: verdict item 4 — the incremental PQ index (train-once
    # frozen book, keep-latest coded state) must stay sublinear too
    "streaming_ann_pq_topk",
    # round 8: the composed IVFADC index and the kmeans-based cluster
    # profile (driver-side Lloyd rounds — one job per round), plus the
    # group-aware split (CC + hash assignment end to end)
    "ann_ivfpq_topk",
    "semantic_clusters",
    "leakage_safe_split",
    # round 9: exact-substring dedup — corpus-bytes gram shuffle + span
    # merge + rewrite must track corpus size, not pair count
    "exact_substring_dedup",
    # round 10: multimodal near-dup — one mapInPandas pass over the
    # blobs + (id, 8-byte hash) banding / prefix-join must track corpus
    # size (audio shares phash's exact plan family; video exercises the
    # prefix-filter path on frame-hash sets)
    "phash_image_neardup",
    "audio_fingerprint_neardup",
    "video_scene_neardup",
    # round 12: the COMPOSED incremental pipeline (doc waves -> index ->
    # pairs -> clusters) — per-wave cost must track wave size through
    # BOTH ledgers, and the one-wave-per-doc guard's docs-ledger probe
    # must not add a super-linear term
    "streaming_neardup_pipeline",
    # r12 addendum: the text member (MinHash index, no rep collapse) —
    # shingle-ledger state and the doc-level banding must stay sublinear
    "streaming_text_neardup_pipeline",
    # round 13: the +U path — 3 ingest waves plus one deletion-vector
    # update wave (per-ledger tombstone upsert + touched-component
    # relabel). The wave-sized-write claim itself is pinned by the
    # physical-row-count test (test_update_pipeline.py); this probe pins
    # the END-TO-END composition: the update wave's vector anti-joins,
    # stale-pair retraction and cluster relabel must not add a
    # super-linear term on a 10× corpus.
    "streaming_text_update_pipeline",
    # round 13 addendum: the EMBEDDING member (hyperplane-LSH cosine
    # index). The UNCAPPED parity query is deliberately NOT probed:
    # this corpus has 10 fixed label clusters, so its TRUE sim>=0.4
    # pair count is Θ(n²) (~920 at 2k vecs → ~92k at 20k) — no
    # implementation, batch or streaming, can emit quadratic output in
    # sublinear time, and a first probe of it measured exactly that
    # (ratio 10.55 at 10× while pairs grew ~100×, i.e. per-pair cost
    # FELL; see PERF.md r13). What scale_proof must pin is the
    # PROTOCOL's designed degenerate-density lever instead: the capped
    # config (max_bucket=48, oracle-checked against an independent cap
    # simulation), whose per-bucket work is bounded so per-wave cost
    # tracks hashing + accounting, not cluster density.
    "streaming_embedding_neardup_capped",
]

ALL = {**REGISTRY, **EXTRA_REGISTRY}

# Per-probe minimum timed runs (r12 verdict Next #3): probes whose
# committed ratio sat inside their own noise band get re-based to
# min-of-5 — video_scene_neardup's ~1.8s small side swung 0.41–0.68
# across same-code regenerations under min-of-2/3.
_MIN_RUNS = {"video_scene_neardup": 5}


def _time(spark, name: str, sf_dir: str, runs: int = 2) -> float:
    runs = max(runs, _MIN_RUNS.get(name, 0))
    # one UNTIMED warm run first (round 10): the small-SF side is warmed
    # for free by every preceding probe while the big side pays
    # first-touch parquet IO + plan compile inside its timed window —
    # that asymmetry mis-measured ngram_jaccard_neardup as 0.63 scaling
    # when its warm steady state is 0.33. Scaling claims here are about
    # the ALGORITHM's data growth, so both sides get the same warmup.
    ALL[name].spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    best = float("inf")
    done = 0
    # SELF-ADJUDICATING (round 11): sub-2s walls carry scheduler jitter
    # comparable to their signal — min-of-2 was committing numbers (ngram
    # 0.56, exact-substring 0.36) that PERF.md then had to correct via an
    # out-of-band idle min-of-3. Bake that protocol in: a third timed run
    # whenever the best so far is under 2s, so the committed number IS
    # the adjudicated number. Still run IDLE (no other Spark JVM).
    while done < runs or (best < 2.0 and done < 3):
        t0 = time.perf_counter()
        ALL[name].spark_fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.perf_counter() - t0)
        done += 1
    return round(best, 3)


def _cc_rounds(spark, sf_dir: str) -> dict:
    """CC scaling evidence, both strategies: the default adaptive run
    (contraction may solve it in zero rounds) and a forced-loop run
    (local_max_edges=None) that must stay O(log n) rounds at 10x."""
    from flink_playground_spark.functions.dedupe import minhash_lsh_edges
    from flink_playground_spark.operators.graph import connected_components
    from flink_playground_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    edges = minhash_lsh_edges(docs, "doc_id", "text", k=128, bands=32, threshold=0.8)
    edges = edges.persist()
    out = {}
    for label, lme in [("adaptive", "default"), ("forced_loop", None)]:
        stats: dict = {}
        kw = {} if lme == "default" else {"local_max_edges": lme}
        connected_components(edges, "id_a", "id_b", stats=stats, **kw).write.mode(
            "overwrite"
        ).format("noop").save()
        out[label] = {"iterations": stats["iterations"], "strategy": stats["strategy"]}
    edges.unpersist()
    return out


def _round_no() -> int:
    """The round number already in the repo's artifacts (PROGRESS /
    CORRECTNESS files) — a deterministic seed for the symmetric-confirm
    sample, so two regenerations in one round re-roll the SAME probes."""
    import re

    rounds = [
        int(m.group(1))
        for p in pathlib.Path(__file__).resolve().parent.parent.glob("CORRECTNESS_r*.json")
        if (m := re.search(r"r(\d+)", p.name))
    ]
    return (max(rounds) + 1) if rounds else 1


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1"
    factor = 10.0
    spark = get_spark("scale_proof")
    spark.range(10_000).selectExpr("sum(id)").collect()

    # SYMMETRIC confirm (r12 verdict Next #3): the >0.5-only confirm
    # re-rolled exclusively BAD-looking probes and min-folded the
    # result — a one-sided optimistic bias in expectation. Each
    # regeneration now also re-times a deterministic sample of PASSING
    # probes (seeded by the round number the artifact already carries,
    # not wall clock) and records both sides, so favorable outliers get
    # the same scrutiny unfavorable ones always had.
    rnd = _round_no()
    sym_sample = {PROBES[i] for i in range((rnd * 7) % 5, len(PROBES), 5)}

    rows = {}
    for name in PROBES:
        t_small = _time(spark, name, small)
        t_big = _time(spark, name, big)
        confirmed = False
        pre = None
        if t_big / t_small > 0.5 * factor or name in sym_sample:
            # CONFIRM pass (round 11, same philosophy as bench.py's
            # regression confirm): a probe landing super-0.5 gets both
            # sides re-timed before the number is committed — a host
            # burst inflating one side's min-of-N must not be recorded
            # as an algorithmic scaling claim. Only what persists
            # through the confirm is committed. The PRE-confirm numbers
            # are recorded alongside (round 12, ADVICE), and since r13
            # the pass also covers the deterministic PASSING sample
            # above, so the min-fold is no longer applied only where it
            # can flatter.
            pre = {"sf0.1_s": t_small, "sf1_s": t_big,
                   "ratio": round(t_big / t_small, 2)}
            t_small = min(t_small, _time(spark, name, small, runs=1))
            t_big = min(t_big, _time(spark, name, big, runs=2))
            confirmed = True
        ratio = round(t_big / t_small, 2)
        rows[name] = {
            "sf0.1_s": t_small,
            "sf1_s": t_big,
            "ratio": ratio,
            "scaling": round(ratio / factor, 2),
        }
        if confirmed:
            rows[name]["confirm_pass"] = True
            rows[name]["confirm_reason"] = (
                "super-0.5" if pre["ratio"] > 0.5 * factor else "symmetric-sample"
            )
            rows[name]["pre_confirm"] = pre
        print(f"{name:28s} {t_small:8.2f}s {t_big:8.2f}s  x{ratio:<6} scaling {ratio / factor:.2f}")

    cc = {"sf0.1": _cc_rounds(spark, small), "sf1": _cc_rounds(spark, big)}
    print(f"cc sf0.1={cc['sf0.1']}\ncc sf1={cc['sf1']}")
    out = {
        "factor": factor,
        "round": rnd,
        "symmetric_confirm_sample": sorted(sym_sample),
        "queries": rows,
        "cc_rounds": cc,
    }
    pathlib.Path("SCALE_PROOF.json").write_text(json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
