"""Reference: CrossJoinJob.java — correlated UNNEST left outer join.

`FROM input LEFT OUTER JOIN UNNEST(input.items) AS T(item_id) ON TRUE`
(:66-73) over `(a, [{b}])` and `(b, [])` (:47-59): the empty-array row
must survive with NULL item_id. Exact Spark mapping: explode_outer.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from flink_playground_spark import get_spark
from flink_playground_spark.operators.unnest import unnest_outer
from flink_playground_spark.plans.spec import explain_str
from flink_playground_spark.sinks import print_sink
from flink_playground_spark.sources.memory import from_rows


def main() -> None:
    spark = get_spark("job7-unnest")
    nested = from_rows(
        spark,
        [("a", [("b",)]), ("b", [])],
        ["id", "items"],
        [str, "array<struct<item_id:string>>"],
    )
    result = unnest_outer(nested, "items")
    print_sink(result, "LEFT OUTER JOIN UNNEST — (a,b) and (b,NULL)")
    print("== execution plan ==")  # env.getExecutionPlan() parity (:77)
    print(explain_str(result, "physical").splitlines()[0])
    spark.stop()


if __name__ == "__main__":
    main()
