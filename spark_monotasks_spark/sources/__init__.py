from spark_monotasks_spark.sources import io, versioned  # noqa: F401
