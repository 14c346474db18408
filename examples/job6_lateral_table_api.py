"""Reference: LateralWithTableAPIJob.java — fluent lateral temporal join.

`.leftOuterJoinLateral(call("enrichWithCapital", $("proctime")))` probed
against a TemporalTableFunction (:89-103). NB: the reference job has a
latent bug — line 89 reads from an unregistered table "input"; per
SURVEY §2.3 J3 this implements the evident intent (lookup against the
datagen `countries` table).
"""

import pathlib
import sys
from datetime import datetime

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark
from flink_playground_spark.operators.relational import Table, col
from flink_playground_spark.operators.temporal import as_of_snapshot
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job6-lateral")
    people = from_rows(
        spark,
        [("Alice", 12, "a"), ("Bob", 5, "b"), ("Peter", 13, "c"), ("Paul", 13, "d")],
        ["name", "age", "country"],
        [str, int, str],
    )
    countries = from_rows(
        spark,
        [
            ("a", "x", datetime(2024, 1, 1)),
            ("a", "y", datetime(2024, 1, 3)),
            ("b", "z", datetime(2024, 1, 2)),
        ],
        ["iso", "capital", "ts"],
        [str, str, "timestamp_ntz"],
    )
    # the TemporalTableFunction snapshot at proctime = latest version/key
    snapshot = as_of_snapshot(countries, "iso", "ts")
    result = (
        Table(people)
        .left_outer_join(Table(snapshot), col("country") == col("iso"))
        .select("name", "age", "country", "capital")
    )
    result.execute_print()
    spark.stop()


if __name__ == "__main__":
    main()
