"""Reference: TableAPIJob.java — fluent Table API left outer join.

`from("people").leftOuterJoin(countries).where($("country").isEqual(
$("iso"))).select(...)` (:85-90). The engine's fluent façade authors the
predicate as the join condition (SURVEY §4 pushed-predicate semantics).
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark
from flink_playground_spark.operators.relational import Table, col
from flink_playground_spark.sources.datagen import TableDescriptor
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job5-table-api")
    from_rows(
        spark,
        [("Alice", 12, "a"), ("Bob", 5, "b"), ("Peter", 13, "c"), ("Paul", 13, "d")],
        ["name", "age", "country"],
        [str, int, str],
    ).createOrReplaceTempView("people")
    # TableDescriptor.forConnector("datagen") programmatic source (:73-82)
    (
        TableDescriptor.for_connector("datagen")
        .option("number-of-rows", 32)
        .with_field("iso", kind="string", length=1)
        .with_field("capital", kind="string", length=1)
        .build(spark)
        .createOrReplaceTempView("countries")
    )
    result = (
        Table.from_(spark, "people")
        .left_outer_join(Table.from_(spark, "countries"), col("country") == col("iso"))
        .select("name", "age", "country", "capital")
    )
    result.execute_print()
    spark.stop()


if __name__ == "__main__":
    main()
