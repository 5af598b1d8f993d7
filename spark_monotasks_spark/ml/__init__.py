from spark_monotasks_spark.ml.wrappers import (  # noqa: F401
    als_recommend,
    decision_tree_fit,
    fpgrowth_frequent_itemsets,
    gbt_fit,
    kmeans_fit_predict,
    linear_regression_fit,
    logistic_regression_fit,
    naive_bayes_fit,
    random_forest_fit,
    standardize,
    tf_idf,
)
