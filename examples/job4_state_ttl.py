"""Reference: WithStateTtlJob.java — upsert view + stream-stream outer join
with state TTL.

The Flink job declares `primaryKey("iso")` on a 4-duplicate-row view so
the join matches ONE row per key instead of four (:62-77, comment :75),
left-outer-joins people against it with `STATE_TTL('people'='1ms',
'input'='90d')` (:79-88), and prints the changelog + execution plan.

Here: the PK-upsert view is the keep-latest dedup; the asymmetric-TTL
stream-stream join maps to the foreachBatch enrichment runner (probe side
retains nothing — exactly the 1ms-probe intent); the changelog print is
the retraction-aware adapter (streaming/changelog.py) emitting the same
+I/-U/+U row kinds Flink's `toChangelogStream(...).print()` shows; the
plan dump closes it.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark
from flink_playground_spark.operators.dedup import pk_upsert_view
from flink_playground_spark.plans.spec import explain_str
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job4-state-ttl")
    people = from_rows(
        spark,
        [("Alice", 12, "a"), ("Bob", 5, "b"), ("Peter", 13, "c"), ("Paul", 13, "d")],
        ["name", "age", "country"],
        [str, int, str],
    )
    # four rows, one key — successive upserts (WithStateTtlJob.java:62-71)
    dim = from_rows(
        spark,
        [("a", "a", 1), ("a", "b", 2), ("a", "c", 3), ("a", "d", 4)],
        ["iso", "capital", "arrival"],
        [str, str, int],
    )
    upsert = pk_upsert_view(dim, "iso", "arrival")
    joined = people.join(upsert, people.country == upsert.iso, "left_outer").select(
        "name", "age", "country", "capital"
    )
    # "Without this restriction the join will produce four rows for 'a'" (:75)
    print_sink(joined, "PK-upsert join — one row for Alice, capital=d")

    # toChangelogStream(outerJoin).print() (:90): replay the four dim
    # upserts as micro-batches and print the retraction changelog —
    # +I(p, NULL) on probe arrival, then -U/+U pairs as 'a' upserts.
    import glob
    import os
    import shutil
    import tempfile

    from flink_playground_spark.streaming.changelog import outer_join_changelog_stream

    work = tempfile.mkdtemp(prefix="job4_dim_")
    src = f"{work}/src"
    os.makedirs(src)
    for i, row in enumerate([("a", "a", 1), ("a", "b", 2), ("a", "c", 3), ("a", "d", 4)]):
        part = f"{work}/w{i}"
        from_rows(spark, [row], ["iso", "capital", "arrival"], [str, str, int]).coalesce(
            1
        ).write.mode("overwrite").parquet(part)
        dst = f"{src}/wave{i}.parquet"
        shutil.copy(glob.glob(f"{part}/*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 60, 1_000_000_000 + i * 60))
    dim_stream = (
        spark.readStream.schema(dim.schema).option("maxFilesPerTrigger", "1").parquet(src)
    )
    log = outer_join_changelog_stream(
        people,
        dim_stream,
        on=[("country", "iso")],
        dim_keys=["iso"],
        dim_order_col="arrival",
        probe_keys=["name"],
    )
    print_sink(
        log.select("batch_id", "op", "name", "capital").orderBy("batch_id", "op", "name"),
        "outer join changelog",
    )

    print("== execution plan ==")
    print("\n".join(explain_str(joined, "physical").splitlines()[:10]))
    spark.stop()


if __name__ == "__main__":
    main()
