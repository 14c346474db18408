"""Reference: DataStreamJob.java — processing-time temporal join.

The Flink job registers a TemporalTableFunction over a versioned
`countries` table (time attr `ts`, key `iso`; DataStreamJob.java:88-91)
and probes it with `LATERAL TABLE(enrichWithCapital(p.proctime))`
(inner, :98-104) and `LEFT OUTER JOIN ... ON TRUE` (:116-120). Here the
temporal join lowers to dedup-latest + equi-join; both variants run.
Unlike Flink (restrictions recorded at :106-115) the predicate is a real
join condition and multi-column keys are allowed.
"""

import pathlib
import sys
from datetime import datetime

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark
from flink_playground_spark.operators.temporal import temporal_join
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job1-temporal-join")
    people = from_rows(
        spark,
        [("Alice", 12, "ES"), ("Bob", 5, "ES"), ("Peter", 13, "CA"), ("Paul", 13, "IT")],
        ["name", "age", "country"],
        [str, int, str],
    )
    # versioned dimension: two versions for ES — the probe must see only
    # the latest (Madrid, not the misspelled first version)
    countries = from_rows(
        spark,
        [
            ("ES", "Madird", datetime(2024, 1, 1)),
            ("ES", "Madrid", datetime(2024, 1, 2)),
            ("CA", "Ottawa", datetime(2024, 1, 1)),
        ],
        ["iso", "capital", "ts"],
        [str, str, "timestamp_ntz"],
    )
    inner = temporal_join(people, countries, [("country", "iso")], "ts", how="inner")
    print_sink(inner.select("name", "country", "capital"), "temporal join (inner)")
    left = temporal_join(people, countries, [("country", "iso")], "ts", how="left")
    print_sink(left.select("name", "country", "capital"), "left outer join — Paul survives with NULL")
    spark.stop()


if __name__ == "__main__":
    main()
