"""Write-side data layout: Z-order (Morton-curve) clustering.

Hive partitioning (tests/test_partitioned_write.py) is the coarse index
for ONE low-cardinality column; Z-ordering is the layout lever for
multi-dimensional predicates over high-cardinality columns: interleave
the bits of per-column bucket numbers into one Morton value, range-
partition and sort the write by it, and every output file ends up
covering a small hyper-rectangle of the key space. Parquet footer
min/max stats then skip most files for a selective predicate on ANY of
the z-columns — the same mechanism behind Delta/Iceberg OPTIMIZE ZORDER,
expressed here with plain DataFrame ops on vanilla parquet.

Everything is codegen'd column arithmetic: bucketization is a binary-
search ``when``-tree over per-column quantile boundaries from
``percentile_approx`` (a mergeable distributed sketch; the driver holds
2^bits-1 scalars of metadata per column, the same order of driver state
as AQE's size statistics — NOT data). Quantile buckets, not equal-width:
skewed columns (the usual case) still spread over the full bucket range,
so every interleaved bit carries information. The search tree evaluates
log2(n_buckets) comparisons per row inside whole-stage codegen — no
interpreted lambdas, no per-row Python, no join. One extra shuffle (the
range partition) — exactly what any clustering write costs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_col(
    df: DataFrame, cols: list[str], bits: int = 8, out: str = "_zval"
) -> DataFrame:
    """Append a Morton code column interleaving ``bits`` bits per column.

    Each column is bucketized to [0, 2^bits) by its empirical quantiles
    (``percentile_approx`` boundaries + a codegen'd binary-search
    ``when``-tree, log2(2^bits) comparisons per row), so skewed
    distributions still occupy the full bucket range. NULLs go to bucket
    0 and cluster together at the low end of the curve.
    """
    if not 1 <= bits * len(cols) <= 63:
        raise ValueError("bits * len(cols) must fit in a signed 64-bit value")
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    stats = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), probs, 10_000).alias(f"q_{c}")
            for c in cols
        ]
    ).collect()[0]
    buckets: list[Column] = []
    for c in cols:
        bnds = stats[f"q_{c}"]  # bnds[k] = upper boundary of bucket k
        if bnds is None:
            buckets.append(F.lit(0).cast("long"))
            continue
        v = F.col(c).cast("double")

        def search(lo: int, hi: int) -> Column:
            # assign bucket in [lo, hi); boundary bnds[mid-1] splits it
            # (<= so bucket k holds values above the k-th boundary: the
            # empirical-CDF rank, exact on ties)
            if hi - lo == 1:
                return F.lit(lo).cast("long")
            mid = (lo + hi) // 2
            return F.when(v <= F.lit(bnds[mid - 1]), search(lo, mid)).otherwise(search(mid, hi))

        buckets.append(F.when(v.isNull(), F.lit(0).cast("long")).otherwise(search(0, n_buckets)))
    z: Column = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            z = z + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * len(buckets) + j)
    return df.withColumn(out, z)


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int = 16,
    bits: int = 8,
) -> None:
    """Write ``df`` as parquet clustered on the Z-curve of ``cols``.

    Range-partition by the Morton value (one shuffle; Spark samples the
    range boundaries distributedly) and sort within each partition so
    parquet row groups inherit the clustering too. The z column itself
    is dropped — it is layout, not data.
    """
    zdf = zorder_col(df, cols, bits=bits)
    (
        zdf.repartitionByRange(n_files, "_zval")
        .sortWithinPartitions("_zval")
        .drop("_zval")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_files(
    spark,
    path: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> dict:
    """OPTIMIZE-style small-file compaction for a parquet directory.

    The small-files problem is a first-order cost at scale: a 100 TB
    table ingested by many streaming micro-batches or over-parallel
    writers accumulates millions of KB-sized files, and every query then
    pays per-file open/footer/scheduling overhead that dwarfs the scan
    itself. Compaction rewrites the directory into files of
    ``target_bytes`` each:

    - file count from the ACTUAL on-disk byte size (filesystem listing,
      driver-side metadata only — no data collect), never a row-count
      guess;
    - rewrite is a round-robin ``repartition`` (one shuffle) so output
      files are evenly sized, or a ``repartitionByRange`` + sort when
      ``sort_by`` is given (compaction is the natural moment to also fix
      clustering — same shuffle either way);
    - write goes to a temp sibling dir then atomically swaps, so a
      failed compaction never destroys the input.

    Returns {"files_before", "files_after", "bytes"} for observability.
    """
    import os
    import shutil

    old = path.rstrip("/") + "._compact_old"
    if os.path.isdir(old) and not os.path.isdir(path):
        # a previous compaction crashed between its two renames (data was
        # moved aside but the replacement never landed): restore the
        # original before doing anything else — the input is never lost
        os.rename(old, path)
    elif os.path.isdir(old):
        # crashed AFTER the replacement landed but before cleanup: `path`
        # is the valid compacted data and `old` is a stale leftover whose
        # presence would wedge the rename below (ENOTEMPTY) — drop it
        # (r2 ADVICE).
        shutil.rmtree(old)

    files = [
        e for e in os.scandir(path) if e.is_file() and e.name.endswith(".parquet")
    ]
    total = sum(e.stat().st_size for e in files)
    n_out = max(1, -(-total // target_bytes))  # ceil
    df = spark.read.parquet(path)
    if sort_by:
        out = df.repartitionByRange(n_out, *sort_by).sortWithinPartitions(*sort_by)
    else:
        out = df.repartition(n_out)
    tmp = path.rstrip("/") + "._compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after = sum(
        1 for e in os.scandir(path) if e.is_file() and e.name.endswith(".parquet")
    )
    return {"files_before": len(files), "files_after": n_after, "bytes": total}
