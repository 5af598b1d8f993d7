from spark_monotasks_spark.operators import (  # noqa: F401
    aggregates,
    asof,
    joins,
    sample,
    setops,
    sort,
)
