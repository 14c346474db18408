"""Synthesize a larger scale factor from sf0.1 for step-up perf proofs.

``python tools/scale_up.py [factor] [out_dir]`` replicates every
``/root/testdata/sf0.1`` table ``factor``× (default 10 → "sf1",
~6M lineitem / 1M events / 50k documents) into ``out_dir`` (default
``.scaledata/sf1``), preserving WORKLOAD STRUCTURE so a step-up run
measures scaling, not a different problem:

- all primary/foreign keys shift consistently per replica wave
  (orders.o_custkey moves with customer.c_custkey, lineitem with
  orders/part/supplier) — join fan-outs and group cardinalities scale
  linearly, per-key densities stay constant;
- ``documents.text`` gets a per-wave token prefix (``w3the quick…``) so
  shingle/minhash/Jaccard relations hold WITHIN a wave but never across
  waves — without this, every replica of a doc is a near-duplicate of
  its 9 siblings and candidate-pair count grows quadratically in the
  factor, a different (adversarial) workload rather than 10× the same
  one (that stress is exercised separately by test_lsh_guard);
- ``embeddings.embedding`` is rotated (circular dim shift) per wave —
  norms and intra-wave pairwise cosines are bit-preserved, cross-wave
  similarity decorrelates;
- ``nation``/``region`` stay fixed (TPC-H dims don't scale);
- ``events`` shifts ids/users per wave with timestamps untouched:
  10× rows per time window, constant per-user event counts.

This is a perf fixture generator, NOT test input synthesis — the
correctness gate runs exclusively on the driver's /root/testdata.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from flink_playground_spark import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
K = 1_000_000  # key shift unit per wave; > every sf0.1 key domain


def _waved(df: DataFrame, wave: int, shifts: dict[str, int]) -> DataFrame:
    out = df
    for col, unit in shifts.items():
        out = out.withColumn(col, F.col(col) + F.lit(wave * unit))
    return out


def build(factor: int, out: pathlib.Path) -> None:
    spark = get_spark("scale_up")
    out.mkdir(parents=True, exist_ok=True)

    plain_shifts = {
        "customer": {"c_custkey": K},
        "supplier": {"s_suppkey": K},
        "part": {"p_partkey": K},
        "orders": {"o_orderkey": 10 * K, "o_custkey": K},
        "lineitem": {"l_orderkey": 10 * K, "l_partkey": K, "l_suppkey": K},
        "events": {"event_id": 10 * K, "user_id": K},
    }

    for t in ["nation", "region"]:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )

    for t, shifts in plain_shifts.items():
        src = spark.read.parquet(f"{SRC}/{t}.parquet")
        waves = [_waved(src, w, shifts) for w in range(factor)]
        df = waves[0]
        for wdf in waves[1:]:
            df = df.unionByName(wdf)
        df.repartition(32).write.mode("overwrite").parquet(f"{out}/{t}.parquet")

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    doc_waves = []
    for w in range(factor):
        d = docs.withColumn("doc_id", F.col("doc_id") + F.lit(w * K))
        if w:
            d = d.withColumn(
                "text", F.regexp_replace("text", r"(\w+)", f"w{w}$1")
            ).withColumn("n_chars", F.length("text"))
        doc_waves.append(d)
    dd = doc_waves[0]
    for wdf in doc_waves[1:]:
        dd = dd.unionByName(wdf)
    dd.repartition(32).write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    dim = emb.select(F.size("embedding")).head()[0]
    emb_waves = []
    for w in range(factor):
        e = emb.withColumn("vec_id", F.col("vec_id") + F.lit(w * K))
        r = w % dim
        if r:
            e = e.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", r + 1, dim - r), F.slice("embedding", 1, r)
                ),
            )
        emb_waves.append(e)
    ee = emb_waves[0]
    for wdf in emb_waves[1:]:
        ee = ee.unionByName(wdf)
    ee.repartition(8).write.mode("overwrite").parquet(f"{out}/embeddings.parquet")
    spark.stop()


if __name__ == "__main__":
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = pathlib.Path(sys.argv[2] if len(sys.argv) > 2 else ".scaledata/sf1")
    build(factor, out)
    print(f"wrote {out} at {factor}x sf0.1")
