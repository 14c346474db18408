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


def test_csv_json_roundtrip_matches_parquet(spark, sf_dir, tmp_path):
    """S8 breadth: the same table through CSV (header + explicit schema)
    and JSON lines round-trips value-identical to the parquet source —
    with timestamp and float columns surviving serialization."""
    from flink_playground_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events")
    want = sorted(map(tuple, events.collect()))

    csv_path = str(tmp_path / "ev_csv")
    (
        events.withColumn("ts", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
        .write.option("header", True)
        .csv(csv_path)
    )
    got_csv = (
        spark.read.option("header", True)
        .schema("event_id long, ts string, user_id long, event_type string, value double, props string")
        .csv(csv_path)
        .withColumn("ts", F.to_timestamp_ntz("ts", F.lit("yyyy-MM-dd HH:mm:ss.SSSSSS")))
        .select(*events.columns)
    )
    assert sorted(map(tuple, got_csv.collect())) == want

    json_path = str(tmp_path / "ev_json")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"  # default drops microseconds
    events.write.option("timestampNTZFormat", fmt).json(json_path)
    got_json = (
        spark.read.schema(events.schema)
        .option("timestampNTZFormat", fmt)
        .json(json_path)
        .select(*events.columns)
    )
    assert sorted(map(tuple, got_json.collect())) == want


def test_parquet_aggregate_pushdown_v2(spark, sf_dir):
    """COUNT/MIN/MAX answered from parquet footer statistics under the
    v2 scan (PushedAggregation) — a 100 TB count(*) that reads metadata,
    not data. Values must equal the v1 full-scan answers."""
    df_v1 = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    want = df_v1.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("l_shipdate").alias("mn"),
        F.max("l_shipdate").alias("mx"),
    ).collect()[0]

    saved = spark.conf.get("spark.sql.sources.useV1SourceList")
    try:
        spark.conf.set(
            "spark.sql.sources.useV1SourceList", "avro,csv,json,kafka,orc,text"
        )
        spark.conf.set("spark.sql.parquet.aggregatePushDown", "true")
        agg = spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_shipdate").alias("mn"),
            F.max("l_shipdate").alias("mx"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation" in plan, plan[:1500]
        assert agg.collect()[0] == want
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", saved)
        spark.conf.set("spark.sql.parquet.aggregatePushDown", "false")


def test_metadata_columns_provenance(spark, sf_dir, tmp_path):
    """Row provenance via the hidden _metadata struct: every row knows its
    source file and row index — the lineage a training-data pipeline
    records at ingest (which shard did this example come from)."""
    src = str(tmp_path / "sharded")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    events.repartition(4).write.parquet(src)

    tagged = spark.read.parquet(src).select(
        "event_id",
        F.col("_metadata.file_path").alias("src_file"),
        F.col("_metadata.row_index").alias("src_row"),
    )
    rows = tagged.collect()
    assert len(rows) == events.count()
    assert len({r.src_file for r in rows}) == 4  # all shards represented
    # (file, row) is a unique physical address
    assert len({(r.src_file, r.src_row) for r in rows}) == len(rows)
    # indexes are dense per file
    per_file = {}
    for r in rows:
        per_file.setdefault(r.src_file, []).append(r.src_row)
    for f, idxs in per_file.items():
        assert sorted(idxs) == list(range(len(idxs)))
