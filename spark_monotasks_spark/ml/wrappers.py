"""MLlib capability proof (SURVEY §2.12) — thin pyspark.ml wrappers.

Reference: mllib/src/main/scala/org/apache/spark/mllib/ — RDD-based
KMeans (clustering/KMeans.scala), LogisticRegressionWithSGD
(classification/LogisticRegression.scala), LinearRegressionWithSGD
(regression/LinearRegression.scala), StandardScaler
(feature/StandardScaler.scala).  `pyspark.ml` is the DataFrame-native
successor (same algorithms, Catalyst-planned featurization, distributed
solvers); SURVEY scopes parity to thin wrappers over it, with the
`array<float>` → ml-Vector bridge being the only real work.

At scale: `array_to_vector` is a JVM expression (no Python round-trip);
training is the iterative treeAggregate the reference also used.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.clustering import KMeans
from pyspark.ml.feature import StandardScaler
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.ml.regression import LinearRegression
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _vec(col: str | Column) -> Column:
    """array<float|double> column → ml Vector (JVM-side, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return array_to_vector(c.cast("array<double>"))


def _drop_training_summary(model):
    """Detach the JVM training summary before the model enters a task
    closure.

    Summary-bearing models (HasTrainingSummary: logistic/linear
    regression, random forest, k-means, ...) keep a reference to the
    SparkSession inside the summary.  The session serializes fine while
    its lazily-initialized ``observationManager`` field is still null,
    but after any ``df.observe()`` call in the process that field is
    populated with a non-serializable ObservationManager — and every
    later ``model.transform`` whose prediction UDF captures the model
    dies with ``Task not serializable``.  Stripping the summary (the
    same thing ML persistence does on save/load) makes the model
    closure session-free; the wrappers never expose the summary, so
    nothing is lost.  Returns the model for chaining."""
    from pyspark import SparkContext

    try:
        model._java_obj.setSummary(SparkContext._jvm.scala.Option.empty())
    except Exception:
        pass  # model type without a summary slot — nothing to strip
    return model


def _require_rows(df: DataFrame, what: str) -> DataFrame:
    """Iterative fits cannot train on zero rows — pyspark.ml surfaces
    that as a deep Py4J stack; fail fast with an actionable message
    instead.  isEmpty() reads at most one row (limit-1 job), noise next
    to a multi-pass fit."""
    if df.isEmpty():
        raise ValueError(
            f"cannot fit {what} on an empty DataFrame — every ml wrapper "
            "needs at least one input row"
        )
    return df


def _check_free(df: DataFrame, *names: str) -> None:
    """The wrappers introduce fixed intermediate/output columns; an
    input frame already carrying one would be silently clobbered or
    produce ambiguous duplicates — fail loudly instead."""
    # Spark resolves column names case-insensitively by default, so a
    # pre-existing 'Cluster' clashes with our 'cluster' just as hard
    existing = {c.lower() for c in df.columns}
    clash = [n for n in names if n.lower() in existing]
    if clash:
        raise ValueError(
            f"input DataFrame already has column(s) {clash}; rename them "
            "before calling this wrapper (its outputs use those names)"
        )


def kmeans_fit_predict(
    df: DataFrame,
    features_col: str = "embedding",
    k: int = 8,
    seed: int = 42,
    max_iter: int = 20,
) -> DataFrame:
    """mllib clustering/KMeans.scala parity: fit k-means, return the
    input plus a ``cluster`` column."""
    _check_free(df, "_features", "prediction", "cluster")
    feat = _require_rows(df, "KMeans").withColumn("_features", _vec(features_col))
    try:
        fitted = KMeans(
            k=k, seed=seed, maxIter=max_iter, featuresCol="_features"
        ).fit(feat)
    except Exception as e:  # k > distinct points fails deep in the JVM
        raise ValueError(
            f"KMeans fit failed for k={k}; the input must have at least k "
            "distinct feature rows (pass a smaller k for tiny inputs)"
        ) from e
    model = _drop_training_summary(fitted)
    return model.transform(feat).withColumnRenamed("prediction", "cluster").drop(
        "_features"
    )


def logistic_regression_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 20,
    reg_param: float = 0.0,
) -> DataFrame:
    """mllib classification/LogisticRegression.scala parity (modern
    L-BFGS solver instead of SGD).  Returns predictions with
    ``prediction`` and ``probability`` columns."""
    _check_free(df, "_features", "prediction", "probability", "rawPrediction")
    feat = _require_rows(df, "LogisticRegression").withColumn(
        "_features", _vec(features_col)
    )
    model = _drop_training_summary(
        LogisticRegression(
            maxIter=max_iter,
            regParam=reg_param,
            featuresCol="_features",
            labelCol=label_col,
        ).fit(feat)
    )
    out = model.transform(feat)
    return out.withColumn("probability", vector_to_array("probability")).drop(
        "_features", "rawPrediction"
    )


def linear_regression_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 20,
    reg_param: float = 0.0,
):
    """mllib regression/LinearRegression.scala parity.  Returns
    (predictions DataFrame, coefficients list, intercept)."""
    _check_free(df, "_features", "prediction")
    feat = _require_rows(df, "LinearRegression").withColumn(
        "_features", _vec(features_col)
    )
    model = LinearRegression(
        maxIter=max_iter,
        regParam=reg_param,
        featuresCol="_features",
        labelCol=label_col,
    ).fit(feat)
    coefficients, intercept = list(model.coefficients), float(model.intercept)
    _drop_training_summary(model)
    preds = model.transform(feat).drop("_features")
    return preds, coefficients, intercept


def als_recommend(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    rank: int = 8,
    max_iter: int = 5,
    reg_param: float = 0.1,
    seed: int = 42,
    num_recs: int = 5,
) -> DataFrame:
    """mllib recommendation/ALS.scala parity: alternating least squares
    matrix factorization; returns top-``num_recs`` item recommendations
    per user as (user, item, score) rows.

    At scale this is the reference's own blocked-ALS design (pyspark.ml
    ALS keeps the in/out-block partitioning of mllib's ALS.scala); the
    recommendForAllUsers top-k is a blocked cross-product with a
    per-user bounded heap, not an all-pairs materialization."""
    from pyspark.ml.recommendation import ALS

    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        seed=seed,
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        coldStartStrategy="drop",
    )
    model = als.fit(_require_rows(ratings, "ALS"))
    recs = model.recommendForAllUsers(num_recs)
    return recs.select(
        F.col(user_col),
        F.explode("recommendations").alias("rec"),
    ).select(
        F.col(user_col),
        F.col("rec").getField(item_col).alias(item_col),
        F.round(F.col("rec").getField("rating").cast("double"), 4).alias("score"),
    )


def decision_tree_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_depth: int = 5,
    seed: int = 42,
) -> DataFrame:
    """mllib tree/DecisionTree.scala parity (classification): fit a
    single CART tree, return the input plus a ``prediction`` column.
    Modern impl is the same distributed histogram-split search
    (findBestSplits) the reference used."""
    from pyspark.ml.classification import DecisionTreeClassifier

    _check_free(df, "_features", "prediction", "rawPrediction", "probability")
    feat = _require_rows(df, "DecisionTree").withColumn(
        "_features", _vec(features_col)
    )
    model = DecisionTreeClassifier(
        maxDepth=max_depth,
        seed=seed,
        featuresCol="_features",
        labelCol=label_col,
    ).fit(feat)
    return model.transform(feat).drop("_features", "rawPrediction", "probability")


def standardize(
    df: DataFrame, features_col: str = "embedding", with_mean: bool = True
) -> DataFrame:
    """mllib feature/StandardScaler.scala parity: unit-variance (and
    optionally zero-mean) scaling; output column ``scaled``
    (array<double>)."""
    _check_free(df, "_features", "_scaled", "scaled")
    feat = _require_rows(df, "StandardScaler").withColumn(
        "_features", _vec(features_col)
    )
    model = StandardScaler(
        inputCol="_features", outputCol="_scaled", withMean=with_mean, withStd=True
    ).fit(feat)
    return (
        model.transform(feat)
        .withColumn("scaled", vector_to_array("_scaled"))
        .drop("_features", "_scaled")
    )


def fpgrowth_frequent_itemsets(
    baskets: DataFrame,
    items_col: str = "items",
    min_support: float = 0.1,
    min_confidence: float = 0.5,
    num_partitions: int | None = None,
    cache_input: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """mllib fpm/FPGrowth.scala parity: frequent itemsets + association
    rules over an array-of-items column.

    pyspark.ml's FPGrowth is the same parallel FP-tree design (PFP,
    mllib fpm/FPGrowth.scala): group-dependent conditional trees are
    mined per partition after one support-count pass — no candidate
    generation, shuffle keyed by item group.  Returns
    (itemsets(items, freq), rules(antecedent, consequent, confidence)).

    The miner reads ``baskets`` at least twice (the minCount ``count()``
    plus the mining pass) — ``cache_input`` persists it
    (MEMORY_AND_DISK, so a 100 TB basket frame spills instead of
    OOMing) rather than recomputing an upstream join per pass, and
    unpersists it as soon as ``fit()`` returns: the fitted model
    materializes freqItemsets/associationRules itself and never
    re-reads the basket lineage, so holding the cached blocks for the
    session lifetime would only crowd executor storage.
    ``num_partitions`` pins the PFP group count; leave None to inherit
    the input partitioning (right at cluster scale), pin small when the
    basket table is tiny relative to the session's shuffle width.
    """
    from pyspark.ml.fpm import FPGrowth

    if cache_input:
        baskets = baskets.persist()
    try:
        fp = FPGrowth(
            itemsCol=items_col,
            minSupport=min_support,
            minConfidence=min_confidence,
        )
        if num_partitions is not None:
            fp = fp.setNumPartitions(num_partitions)
        model = fp.fit(baskets)
    finally:
        if cache_input:
            baskets.unpersist()
    itemsets = model.freqItemsets.select(
        F.array_sort(F.col("items")).alias("items"), F.col("freq").cast("long")
    )
    rules = model.associationRules.select(
        F.array_sort("antecedent").alias("antecedent"),
        F.array_sort("consequent").alias("consequent"),
        F.round("confidence", 4).alias("confidence"),
    )
    return itemsets, rules


def naive_bayes_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    smoothing: float = 1.0,
) -> DataFrame:
    """mllib classification/NaiveBayes.scala parity: multinomial NB
    (one aggregate pass for the conditional counts — the same
    one-treeAggregate shape as the reference).  Features must be
    non-negative; returns input plus ``prediction``."""
    from pyspark.ml.classification import NaiveBayes

    _check_free(df, "_features", "prediction", "rawPrediction", "probability")
    feat = _require_rows(df, "NaiveBayes").withColumn(
        "_features", _vec(features_col)
    )
    model = NaiveBayes(
        smoothing=smoothing, featuresCol="_features", labelCol=label_col
    ).fit(feat)
    return model.transform(feat).drop("_features", "rawPrediction", "probability")


def tf_idf(
    df: DataFrame,
    text_col: str = "text",
    num_features: int = 1 << 12,
    min_doc_freq: int = 1,
) -> DataFrame:
    """mllib feature/HashingTF.scala + feature/IDF.scala parity:
    whitespace-tokenize, hash term counts into ``num_features`` buckets,
    weight by inverse document frequency.

    Same two-pass shape as the reference: TF is embarrassingly parallel
    (one projection), the IDF document-frequency vector is one
    treeAggregate over sparse vectors.  Output column ``tfidf``
    (array<double>, dense)."""
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    _check_free(df, "_tokens", "_tf", "_tfidf", "tfidf")
    toks = Tokenizer(inputCol=text_col, outputCol="_tokens").transform(
        _require_rows(df, "TF-IDF")
    )
    tf = HashingTF(
        inputCol="_tokens", outputCol="_tf", numFeatures=num_features
    ).transform(toks)
    model = IDF(inputCol="_tf", outputCol="_tfidf", minDocFreq=min_doc_freq).fit(tf)
    return (
        model.transform(tf)
        .withColumn("tfidf", vector_to_array("_tfidf"))
        .drop("_tokens", "_tf", "_tfidf")
    )


def random_forest_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    num_trees: int = 20,
    max_depth: int = 5,
    seed: int = 42,
) -> DataFrame:
    """mllib tree/RandomForest.scala parity (classification): bagged
    CART ensemble — per-tree bootstrap + feature subsampling, majority
    vote.  Modern impl distributes the same histogram-split search as
    the single tree but trains all trees' node batches together
    (RandomForest.scala's node-queue grouping), so cost scales with
    data passes, not num_trees.  Returns input + ``prediction``."""
    from pyspark.ml.classification import RandomForestClassifier

    _check_free(df, "_features", "prediction", "rawPrediction", "probability")
    feat = _require_rows(df, "RandomForest").withColumn(
        "_features", _vec(features_col)
    )
    model = _drop_training_summary(
        RandomForestClassifier(
            numTrees=num_trees,
            maxDepth=max_depth,
            seed=seed,
            featuresCol="_features",
            labelCol=label_col,
        ).fit(feat)
    )
    return model.transform(feat).drop("_features", "rawPrediction", "probability")


def gbt_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 10,
    max_depth: int = 3,
    seed: int = 42,
) -> DataFrame:
    """mllib tree/GradientBoostedTrees.scala parity (binary
    classification): sequential shallow-tree boosting on the logistic
    loss gradient.  Inherently iterative (each stage fits the previous
    residual — the reference's boost() loop); at scale the cost is
    max_iter full passes, which is the algorithm, not a plan flaw.
    Returns input + ``prediction``."""
    from pyspark.ml.classification import GBTClassifier

    _check_free(df, "_features", "prediction", "rawPrediction", "probability")
    feat = _require_rows(df, "GBT").withColumn(
        "_features", _vec(features_col)
    )
    model = _drop_training_summary(
        GBTClassifier(
            maxIter=max_iter,
            maxDepth=max_depth,
            seed=seed,
            featuresCol="_features",
            labelCol=label_col,
        ).fit(feat)
    )
    return model.transform(feat).drop("_features", "rawPrediction", "probability")


def word2vec_embed(
    df: DataFrame,
    text_col: str = "text",
    vector_size: int = 16,
    min_count: int = 1,
    max_iter: int = 1,
    seed: int = 42,
) -> DataFrame:
    """mllib feature/Word2Vec.scala parity: skip-gram word embeddings
    (the reference's hierarchical-softmax skip-gram; pyspark.ml keeps
    the same algorithm and its per-partition train/average design).
    Tokenizes ``text_col`` on whitespace, fits, and returns the input
    plus ``w2v`` (array<double>) — the per-document average of its
    token vectors, which is also what the reference's transform on a
    sentence does.  Iterative by nature: max_iter passes over the
    token corpus."""
    from pyspark.ml.feature import Word2Vec

    _check_free(df, "_toks", "_w2v", "w2v")
    toks = _require_rows(df, "Word2Vec").withColumn(
        "_toks", F.split(F.col(text_col), r"\s+")
    )
    model = Word2Vec(
        vectorSize=vector_size,
        minCount=min_count,
        maxIter=max_iter,
        seed=seed,
        inputCol="_toks",
        outputCol="_w2v",
    ).fit(toks)
    return (
        model.transform(toks)
        .withColumn("w2v", vector_to_array("_w2v"))
        .drop("_toks", "_w2v")
    )


def lda_topics(
    df: DataFrame,
    text_col: str = "text",
    k: int = 4,
    vocab_size: int = 1 << 12,
    max_iter: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """mllib clustering/LDA.scala parity: latent Dirichlet allocation
    over per-doc term counts (the reference's EM-on-the-term-graph
    optimizer; pyspark.ml defaults to the online variational optimizer
    — same model, bounded-memory streaming fit).  Term counts come
    from hashingTF (feature/HashingTF.scala — hashing keeps the
    pipeline vocabulary-free, the 100 TB-safe choice vs a
    CountVectorizer vocab broadcast).

    Returns (docs + ``topic`` = argmax topic index,
    topics(topic, termIndices array-as-string, termWeights rounded))."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import HashingTF

    _check_free(df, "_toks", "_tf", "topicDistribution", "topic")
    toks = _require_rows(df, "LDA").withColumn(
        "_toks", F.split(F.col(text_col), r"\s+")
    )
    tf = HashingTF(
        inputCol="_toks", outputCol="_tf", numFeatures=vocab_size
    ).transform(toks)
    model = LDA(
        k=k, maxIter=max_iter, seed=seed, featuresCol="_tf"
    ).fit(tf)
    docs = (
        model.transform(tf)
        .withColumn("_dist", vector_to_array("topicDistribution"))
        .withColumn(
            "topic",
            F.expr(
                "array_position(_dist, array_max(_dist)) - 1"
            ).cast("int"),
        )
        .drop("_toks", "_tf", "topicDistribution", "_dist")
    )
    topics = model.describeTopics(5).select(
        F.col("topic"),
        F.array_join(F.col("termIndices").cast("array<string>"), ",").alias(
            "term_indices"
        ),
        F.transform(
            "termWeights", lambda w: F.round(w, 6)
        ).alias("term_weights"),
    )
    return docs, topics


def gaussian_mixture_fit(
    df: DataFrame,
    features_col: str = "embedding",
    k: int = 3,
    max_iter: int = 20,
    seed: int = 42,
) -> DataFrame:
    """mllib clustering/GaussianMixture.scala parity: EM over a mixture
    of multivariate Gaussians (same aggregateByKey E/M step shape).
    Returns the input plus ``cluster`` (argmax component) and
    ``cluster_prob`` (that component's responsibility, rounded)."""
    from pyspark.ml.clustering import GaussianMixture

    _check_free(df, "_features", "prediction", "probability", "cluster",
                "cluster_prob")
    feat = _require_rows(df, "GaussianMixture").withColumn(
        "_features", _vec(features_col)
    )
    model = _drop_training_summary(
        GaussianMixture(
            k=k, maxIter=max_iter, seed=seed, featuresCol="_features"
        ).fit(feat)
    )
    out = model.transform(feat).withColumn("_p", vector_to_array("probability"))
    return (
        out.withColumnRenamed("prediction", "cluster")
        .withColumn(
            "cluster_prob", F.round(F.expr("_p[cluster]"), 4)
        )
        .drop("_features", "probability", "_p")
    )


def svm_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 20,
    reg_param: float = 0.0,
) -> DataFrame:
    """mllib classification/SVM.scala parity: linear SVM on the hinge
    loss (the reference trained SVMWithSGD; LinearSVC optimizes the
    same hinge objective with OWLQN — same decision function, better
    solver).  Binary labels 0/1; returns input + ``prediction``."""
    from pyspark.ml.classification import LinearSVC

    _check_free(df, "_features", "prediction", "rawPrediction")
    feat = _require_rows(df, "LinearSVC").withColumn(
        "_features", _vec(features_col)
    )
    model = _drop_training_summary(
        LinearSVC(
            maxIter=max_iter,
            regParam=reg_param,
            featuresCol="_features",
            labelCol=label_col,
        ).fit(feat)
    )
    return model.transform(feat).drop("_features", "rawPrediction")


def ridge_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 20,
    reg_param: float = 0.1,
):
    """mllib regression/RidgeRegression.scala parity: least squares
    with L2 regularization = LinearRegression(elasticNetParam=0).
    Returns (predictions, coefficients, intercept)."""
    return _regularized_linear(
        df, label_col, features_col, max_iter, reg_param, elastic_net=0.0,
        what="Ridge",
    )


def lasso_fit(
    df: DataFrame,
    label_col: str,
    features_col: str = "embedding",
    max_iter: int = 20,
    reg_param: float = 0.1,
):
    """mllib regression/Lasso.scala parity: least squares with L1
    regularization = LinearRegression(elasticNetParam=1) — same
    soft-thresholding sparsity the reference's L1Updater applied.
    Returns (predictions, coefficients, intercept)."""
    return _regularized_linear(
        df, label_col, features_col, max_iter, reg_param, elastic_net=1.0,
        what="Lasso",
    )


def _regularized_linear(
    df, label_col, features_col, max_iter, reg_param, elastic_net, what
):
    _check_free(df, "_features", "prediction")
    feat = _require_rows(df, what).withColumn("_features", _vec(features_col))
    model = LinearRegression(
        maxIter=max_iter,
        regParam=reg_param,
        elasticNetParam=elastic_net,
        featuresCol="_features",
        labelCol=label_col,
    ).fit(feat)
    coefficients, intercept = list(model.coefficients), float(model.intercept)
    _drop_training_summary(model)
    return model.transform(feat).drop("_features"), coefficients, intercept


def chi_square_independence(
    df: DataFrame, col_a: str, col_b: str, reliable: bool = False
) -> DataFrame:
    """mllib stat/test/ChiSqTest.scala (Pearson independence) as PURE
    DataFrame aggregation — fully engine-portable, so the catalog can
    oracle-check it in SQL (the ml.stat.ChiSquareTest twin below is
    cross-checked against this in tests).

    Pearson statistic over the ``col_a`` × ``col_b`` contingency table:
    sum over cells of (observed - expected)² / expected with
    expected = row_total × col_total / N; dof = (R-1)(C-1).  Scale
    shape: ONE corpus pass — the pair groupBy collapses to the bounded
    contingency table (≤ R×C rows), which is materialized once
    (localCheckpoint; it's tiny by definition) so the marginals, N, and
    dof all derive from it without re-reading the corpus; everything
    downstream is broadcast-sized.  dof rides the same single aggregate
    (count_distinct over the cells), so no extra driver jobs either.
    Returns one row (statistic, dof)."""
    from spark_monotasks_spark.barrier import barrier

    cells = barrier(
        df.groupBy(col_a, col_b).agg(F.count("*").alias("obs")), reliable
    )
    row_tot = cells.groupBy(col_a).agg(F.sum("obs").alias("row_tot"))
    col_tot = cells.groupBy(col_b).agg(F.sum("obs").alias("col_tot"))
    n = cells.agg(F.sum("obs").alias("n"))
    joined = (
        cells.join(F.broadcast(row_tot), on=col_a)
        .join(F.broadcast(col_tot), on=col_b)
        .crossJoin(F.broadcast(n))
    )
    exp = F.col("row_tot") * F.col("col_tot") / F.col("n")
    # zero-count cells never appear in the groupBy output, but each
    # contributes (0 - e)²/e = e to the statistic; since the expected
    # counts total N, Σ_missing e = N - Σ_observed e — fold that in as
    # Σ_observed((o-e)²/e - e) + N instead of densifying the table
    contrib = (F.col("obs") - exp) * (F.col("obs") - exp) / exp - exp
    return joined.agg(
        F.round(F.sum(contrib) + F.first("n"), 4).alias("statistic"),
        (
            (F.countDistinct(col_a) - 1) * (F.countDistinct(col_b) - 1)
        ).cast("long").alias("dof"),
    )


def chi_square_test_ml(
    df: DataFrame, label_col: str, features_col: str = "embedding"
) -> DataFrame:
    """mllib stat/test/ChiSqTest.scala via pyspark.ml.stat.ChiSquareTest:
    per-feature Pearson independence of (feature value, label).
    Returns (feature_idx, statistic, dof, p_value) — one row per
    feature dimension."""
    from pyspark.ml.stat import ChiSquareTest

    feat = _require_rows(df, "ChiSquareTest").withColumn(
        "_features", _vec(features_col)
    )
    res = ChiSquareTest.test(feat, "_features", label_col).first()
    rows = [
        (int(i), round(float(s), 4), int(d), round(float(p), 6))
        for i, (s, d, p) in enumerate(
            zip(res.statistics, res.degreesOfFreedom, res.pValues)
        )
    ]
    from spark_monotasks_spark.operators.localdata import local_rows_df

    return local_rows_df(
        df.sparkSession,
        rows,
        "feature_idx int, statistic double, dof int, p_value double",
    )
