from spark_monotasks_spark.operators import (  # noqa: F401
    aggregates,
    asof,
    joins,
    rdd_bridge,
    sample,
    setops,
    sort,
)
