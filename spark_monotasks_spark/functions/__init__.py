from spark_monotasks_spark.functions.registry import (
    HIVE_BUILTIN_MAP,
    resolve_function,
)

__all__ = ["HIVE_BUILTIN_MAP", "resolve_function"]
