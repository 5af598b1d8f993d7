from spark_monotasks_spark.ml.wrappers import (  # noqa: F401
    als_recommend,
    decision_tree_fit,
    kmeans_fit_predict,
    linear_regression_fit,
    logistic_regression_fit,
    standardize,
)
