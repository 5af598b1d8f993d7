"""MLlib-parity wrappers (SURVEY §2.12) — behavioral checks on planted
structure, mirroring the reference's mllib suite style (fit on known
data, assert recovered structure, not exact floats).
"""

from __future__ import annotations

import pytest

from spark_monotasks_spark.ml import (
    als_recommend,
    decision_tree_fit,
    fpgrowth_frequent_itemsets,
    kmeans_fit_predict,
    linear_regression_fit,
    logistic_regression_fit,
    naive_bayes_fit,
    standardize,
    tf_idf,
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


@pytest.fixture(scope="module")
def block_ratings(spark):
    # two disjoint taste groups: users 0-4 love items 0-4, users 5-9
    # love items 5-9 (rating 5); one observed cross rating of 1 each
    # way so the factorization sees both blocks
    rows = []
    for u in range(5):
        for i in range(5):
            rows.append((u, i, 5.0))
    for u in range(5, 10):
        for i in range(5, 10):
            rows.append((u, i, 5.0))
    rows.append((0, 5, 1.0))
    rows.append((5, 0, 1.0))
    return spark.createDataFrame(rows, "user int, item int, rating float")


def test_als_recovers_block_structure(spark, block_ratings):
    recs = als_recommend(block_ratings, rank=4, max_iter=10, num_recs=3).collect()
    by_user: dict[int, list[int]] = {}
    for r in recs:
        by_user.setdefault(r.user, []).append(r.item)
    assert set(by_user) == set(range(10))
    # every user's top recommendations stay inside their taste block
    for u, items in by_user.items():
        block = set(range(5)) if u < 5 else set(range(5, 10))
        assert set(items) <= block, (u, items)


def test_als_deterministic_seed(spark, block_ratings):
    a = als_recommend(block_ratings, rank=4, max_iter=5, seed=7).collect()
    b = als_recommend(block_ratings, rank=4, max_iter=5, seed=7).collect()
    assert sorted((r.user, r.item, r.score) for r in a) == sorted(
        (r.user, r.item, r.score) for r in b
    )


def test_decision_tree_separates_blobs(spark, two_blobs):
    out = decision_tree_fit(two_blobs, label_col="label").collect()
    assert all(r.prediction == r.label for r in out)


def test_decision_tree_rejects_clash(spark, two_blobs):
    with pytest.raises(ValueError, match="prediction"):
        decision_tree_fit(
            two_blobs.withColumn("prediction", two_blobs.label), label_col="label"
        )


def test_kmeans_on_real_embeddings(spark, tables):
    emb = tables["embeddings"]
    got = kmeans_fit_predict(emb, k=4, max_iter=5)
    n = got.count()
    assert n == emb.count()
    clusters = {r.cluster for r in got.select("cluster").distinct().collect()}
    assert clusters <= {0, 1, 2, 3} and len(clusters) >= 2


def test_fpgrowth_hand_baskets(spark):
    baskets = spark.createDataFrame(
        [
            (1, ["a", "b", "c"]),
            (2, ["a", "b"]),
            (3, ["a", "b", "c"]),
            (4, ["d"]),
        ],
        "id long, items array<string>",
    )
    itemsets, rules = fpgrowth_frequent_itemsets(
        baskets, min_support=0.5, min_confidence=0.8
    )
    freq = {tuple(r.items): r.freq for r in itemsets.collect()}
    assert freq[("a",)] == 3 and freq[("a", "b")] == 3
    assert freq[("a", "b", "c")] == 2  # size-3 itemset mined too
    assert ("d",) not in freq  # below support
    got_rules = {
        (tuple(r.antecedent), tuple(r.consequent)): r.confidence
        for r in rules.collect()
    }
    assert got_rules[(("a",), ("b",))] == 1.0
    # the input cache is released as soon as fit() returns (r5 ADVICE):
    # results above still collect fine because the fitted model
    # materializes its own frames; no basket RDD blocks may linger
    assert baskets.storageLevel.useMemory is False
    assert baskets.storageLevel.useDisk is False


def test_naive_bayes_separates_counts(spark):
    rows = [(i, float(i % 2), [10.0 + 5 * (i % 2), 1.0]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, label double, feats array<double>")
    out = naive_bayes_fit(df, label_col="label", features_col="feats")
    acc = out.filter("prediction = label").count() / 40
    assert acc >= 0.9


def test_tfidf_shape_and_idf_weighting(spark):
    df = spark.createDataFrame(
        [(1, "common rare"), (2, "common shared"), (3, "common other")],
        "doc_id long, text string",
    )
    out = tf_idf(df, num_features=64).collect()
    assert all(len(r.tfidf) == 64 for r in out)
    # 'common' appears in every doc -> idf = ln((n+1)/(df+1)) = ln(1) = 0,
    # so each doc keeps exactly one nonzero bucket (its distinct word)
    for r in out:
        assert sum(1 for x in r.tfidf if x != 0) == 1


def test_random_forest_separates_blobs(spark, two_blobs):
    from spark_monotasks_spark.ml import random_forest_fit

    out = random_forest_fit(two_blobs, label_col="label", num_trees=10).collect()
    assert all(r.prediction == r.label for r in out)


def test_random_forest_deterministic_seed(spark, two_blobs):
    from spark_monotasks_spark.ml import random_forest_fit

    a = random_forest_fit(two_blobs, label_col="label", seed=7).collect()
    b = random_forest_fit(two_blobs, label_col="label", seed=7).collect()
    assert sorted((r.id, r.prediction) for r in a) == sorted(
        (r.id, r.prediction) for r in b
    )


def test_gbt_separates_blobs(spark, two_blobs):
    from spark_monotasks_spark.ml import gbt_fit

    out = gbt_fit(two_blobs, label_col="label", max_iter=5).collect()
    assert all(r.prediction == r.label for r in out)


def test_model_persistence_roundtrip(spark, tmp_path):
    """Model save/load (mllib's Saveable/Loader contract,
    mllib/util/modelSaveLoad.scala): a fitted model written to disk and
    loaded back must produce identical predictions on the same data."""
    from pyspark.ml.classification import (
        LogisticRegression,
        LogisticRegressionModel,
    )

    from spark_monotasks_spark.ml.wrappers import _drop_training_summary, _vec

    rows = [(i, [float(i % 7), float((i * 3) % 5)], float(i % 2))
            for i in range(60)]
    df = spark.createDataFrame(
        rows, "id long, embedding array<float>, label double"
    ).withColumn("_features", _vec("embedding"))
    # strip the training summary before transform: it pins the session,
    # which stops serializing once any df.observe() ran in the process
    # (see wrappers._drop_training_summary; save/load drops it anyway)
    model = _drop_training_summary(
        LogisticRegression(
            maxIter=10, featuresCol="_features", labelCol="label"
        ).fit(df)
    )
    path = str(tmp_path / "lr_model")
    model.write().overwrite().save(path)
    loaded = LogisticRegressionModel.load(path)
    orig = {r.id: r.prediction
            for r in model.transform(df).select("id", "prediction").collect()}
    got = {r.id: r.prediction
           for r in loaded.transform(df).select("id", "prediction").collect()}
    assert got == orig and len(got) == 60


# --- r4 MLlib tail: Word2Vec / LDA / GMM / SVM / Lasso+Ridge / ChiSq -------

def test_word2vec_similar_contexts_close(spark):
    """Tokens appearing in identical contexts get nearby vectors; the
    doc embedding is the average of its token vectors (reference
    feature/Word2Vec.scala transform semantics)."""
    from spark_monotasks_spark.ml import word2vec_embed

    rows = [(i, "cat sat on the mat") for i in range(10)] + [
        (100 + i, "dog ran in the park") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = word2vec_embed(df, vector_size=8, seed=7).collect()
    assert all(len(r.w2v) == 8 for r in got)
    # identical sentences -> identical averaged doc vectors
    cat = [tuple(r.w2v) for r in got if r.id < 100]
    assert len(set(cat)) == 1


def test_lda_assigns_topics_and_describes(spark):
    from spark_monotasks_spark.ml import lda_topics

    rows = [(i, "spark shuffle partition executor task") for i in range(15)]
    rows += [(100 + i, "gene protein cell dna rna") for i in range(15)]
    df = spark.createDataFrame(rows, "id long, text string")
    docs, topics = lda_topics(df, k=2, max_iter=20, seed=3)
    got = docs.collect()
    assert all(r.topic in (0, 1) for r in got)
    # the two planted corpora should mostly land in different topics
    spark_topics = [r.topic for r in got if r.id < 100]
    gene_topics = [r.topic for r in got if r.id >= 100]
    maj = lambda xs: max(set(xs), key=xs.count)  # noqa: E731
    assert maj(spark_topics) != maj(gene_topics)
    t = topics.collect()
    assert len(t) == 2 and all(len(r.term_weights) == 5 for r in t)


def test_gaussian_mixture_separates_blobs(spark, two_blobs):
    from spark_monotasks_spark.ml import gaussian_mixture_fit

    got = gaussian_mixture_fit(two_blobs, k=2, seed=5).collect()
    by_cluster: dict[int, set[int]] = {}
    for r in got:
        by_cluster.setdefault(r.cluster, set()).add(r.id)
        assert 0.0 <= r.cluster_prob <= 1.0
    assert len(by_cluster) == 2
    sizes = sorted(len(v) for v in by_cluster.values())
    assert sizes == [20, 20]
    # well-separated blobs: responsibilities are confident
    assert all(r.cluster_prob > 0.9 for r in got)


def test_svm_separates_blobs(spark, two_blobs):
    from spark_monotasks_spark.ml import svm_fit

    got = svm_fit(two_blobs, label_col="label").collect()
    assert all(r.prediction == r.label for r in got)


def test_ridge_shrinks_and_lasso_zeroes(spark):
    """y = 3*x0 with two pure-noise features: ridge shrinks all
    coefficients smoothly; lasso at the same penalty drives the noise
    coefficients to exactly zero (L1 soft-thresholding — the
    reference's L1Updater behavior)."""
    import random as _random

    from spark_monotasks_spark.ml import lasso_fit, linear_regression_fit, ridge_fit

    rng = _random.Random(17)
    rows = []
    for i in range(200):
        x0 = rng.uniform(-1, 1)
        rows.append(
            (i, [x0, rng.uniform(-1, 1), rng.uniform(-1, 1)], 3.0 * x0)
        )
    df = spark.createDataFrame(rows, "id long, embedding array<float>, y double")

    _, ols, _ = linear_regression_fit(df, "y")
    _, ridge, _ = ridge_fit(df, "y", reg_param=0.5)
    _, lasso, _ = lasso_fit(df, "y", reg_param=0.5)
    assert abs(ols[0] - 3.0) < 0.05
    # ridge shrinks the true coefficient toward (not to) zero
    assert 0.0 < ridge[0] < ols[0]
    # lasso zeroes the noise coefficients exactly, keeps signal nonzero
    assert lasso[0] > 0.5
    assert lasso[1] == 0.0 and lasso[2] == 0.0


def test_chi_square_df_matches_ml_and_detects_dependence(spark):
    """The pure-DataFrame Pearson statistic equals ml.stat.ChiSquareTest
    on the same (feature, label) pairs, and independence vs dependence
    land on the expected sides."""
    from spark_monotasks_spark.ml import chi_square_independence, chi_square_test_ml

    # dependent: b == a (perfect association); independent: c uniform
    rows = []
    for i in range(120):
        a = float(i % 3)
        rows.append((i, a, a, float((i // 3) % 2)))
    df = spark.createDataFrame(rows, "id long, a double, b double, c double")

    dep = chi_square_independence(df, "a", "b").first()
    indep = chi_square_independence(df, "a", "c").first()
    assert dep.dof == 4 and indep.dof == 2
    # perfect association: statistic = N * (min(R,C)-1) = 120*2
    assert abs(dep.statistic - 240.0) < 1e-6
    assert indep.statistic < 1e-6  # exactly balanced -> 0

    feat = df.selectExpr(
        "id", "array(cast(b as double), cast(c as double)) as embedding",
        "a as label"
    )
    ml_res = {r.feature_idx: r for r in chi_square_test_ml(feat, "label").collect()}
    assert abs(ml_res[0].statistic - dep.statistic) < 1e-6
    assert ml_res[0].dof == dep.dof
    assert abs(ml_res[1].statistic - indep.statistic) < 1e-6
    assert ml_res[1].p_value > 0.99  # no evidence against independence
    assert ml_res[0].p_value < 1e-6  # perfect dependence
