"""Write-side layout: hive-partitioned parquet output + partition-pruned
read-back — at 100 TB the partition column IS the coarse index."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_playground_spark.plans.spec import explain_str
from flink_playground_spark.sources.tables import load_table


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    out = str(tmp_path / "by_lang")
    docs.write.mode("overwrite").partitionBy("lang").parquet(out)

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    plan = explain_str(back, "physical")
    assert "PartitionFilters" in plan
    assert "lang" in plan.split("PartitionFilters")[1][:200]
    # pruning is real: only the en partition's rows are read
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want

    # dynamic partition overwrite: rewriting one partition leaves others
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        docs.filter(F.col("lang") == "en").limit(5).write.mode("overwrite").partitionBy(
            "lang"
        ).parquet(out)
        again = spark.read.parquet(out)
        assert again.filter(F.col("lang") == "en").count() == 5
        assert again.filter(F.col("lang") == "de").count() == docs.filter(F.col("lang") == "de").count()
    finally:
        spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
