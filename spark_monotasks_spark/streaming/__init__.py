from spark_monotasks_spark.streaming import dstream  # noqa: F401
