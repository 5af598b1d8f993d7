from spark_monotasks_spark.operators import (  # noqa: F401
    aggregates,
    joins,
    sample,
    setops,
    sort,
)
