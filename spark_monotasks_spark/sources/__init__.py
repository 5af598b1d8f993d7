from spark_monotasks_spark.sources import io  # noqa: F401
