"""MLlib-parity wrappers (SURVEY §2.12) — behavioral checks on planted
structure, mirroring the reference's mllib suite style (fit on known
data, assert recovered structure, not exact floats).
"""

from __future__ import annotations

import pytest

from spark_monotasks_spark.ml import (
    kmeans_fit_predict,
    linear_regression_fit,
    logistic_regression_fit,
    standardize,
)


@pytest.fixture(scope="module")
def two_blobs(spark):
    # two well-separated 4-d blobs, 20 points each
    rows = []
    for i in range(20):
        rows.append((i, [10.0 + (i % 5) * 0.1, 10.0, 0.0, 0.0], 0.0))
    for i in range(20, 40):
        rows.append((i, [-10.0 - (i % 5) * 0.1, -10.0, 0.0, 0.0], 1.0))
    return spark.createDataFrame(
        rows, "id long, embedding array<float>, label double"
    )


def test_kmeans_separates_blobs(spark, two_blobs):
    got = kmeans_fit_predict(two_blobs, k=2).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r.cluster, set()).add(r.id)
    assert len(by_cluster) == 2
    groups = sorted(by_cluster.values(), key=min)
    assert groups[0] == set(range(20)) and groups[1] == set(range(20, 40))


def test_logistic_regression_separates(spark, two_blobs):
    out = logistic_regression_fit(two_blobs, label_col="label").collect()
    assert all(r.prediction == r.label for r in out)
    assert all(len(r.probability) == 2 for r in out)


def test_linear_regression_recovers_line(spark):
    # y = 3*x0 + 1 exactly
    rows = [(i, [float(i)], 3.0 * i + 1.0) for i in range(30)]
    df = spark.createDataFrame(rows, "id long, embedding array<float>, y double")
    preds, coef, intercept = linear_regression_fit(df, label_col="y")
    assert coef[0] == pytest.approx(3.0, abs=1e-6)
    assert intercept == pytest.approx(1.0, abs=1e-6)
    first = preds.filter("id = 10").first()
    assert first.prediction == pytest.approx(31.0, abs=1e-5)


def test_standardize_unit_variance(spark, two_blobs):
    import statistics

    got = standardize(two_blobs).collect()
    col0 = [r.scaled[0] for r in got]
    assert statistics.mean(col0) == pytest.approx(0.0, abs=1e-9)
    assert statistics.stdev(col0) == pytest.approx(1.0, rel=1e-6)


def test_wrapper_rejects_output_column_clash(spark, two_blobs):
    # a pre-existing 'cluster'/'prediction' column would be silently
    # clobbered — the wrappers must refuse instead
    with pytest.raises(ValueError, match="cluster"):
        kmeans_fit_predict(two_blobs.withColumn("cluster", two_blobs.id), k=2)
    # Spark resolves names case-insensitively — 'Cluster' clashes too
    with pytest.raises(ValueError, match="cluster"):
        kmeans_fit_predict(two_blobs.withColumn("Cluster", two_blobs.id), k=2)
    with pytest.raises(ValueError, match="prediction"):
        logistic_regression_fit(
            two_blobs.withColumn("prediction", two_blobs.label), label_col="label"
        )


def test_kmeans_on_real_embeddings(spark, tables):
    emb = tables["embeddings"]
    got = kmeans_fit_predict(emb, k=4, max_iter=5)
    n = got.count()
    assert n == emb.count()
    clusters = {r.cluster for r in got.select("cluster").distinct().collect()}
    assert clusters <= {0, 1, 2, 3} and len(clusters) >= 2
