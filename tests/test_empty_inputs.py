"""Empty-input sweep: every catalog query must run (not necessarily
return rows) against 0-row tables with the production schemas.

At 100 TB, empty inputs are an everyday state, not an edge case — a
partition-pruned scan, a day with no events, a filter that matched
nothing feeding the next pipeline stage.  A query that crashes on empty
input turns "no data yet" into a paged operator.  The only entries
allowed to raise are iterative ML fits (a model genuinely cannot be
trained on zero rows) — and those must raise the wrappers' actionable
ValueError, not a raw Py4J stack.
"""

from __future__ import annotations

import pytest

from spark_monotasks_spark.queries import QUERY_REGISTRY

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: iterative fits that (documented) cannot train on zero rows; the
#: wrappers/similarity guards turn the deep Py4J failure into ValueError
FIT_REQUIRED = {
    "ml_kmeans_clusters",
    "ml_als_recommend",
    "ml_decision_tree",
    "ml_random_forest",
    "ml_gbt",
    "ml_naive_bayes",
    "ml_tfidf_norm",
    # ann_ivf_topk left this set in r6: literal dyadic centroids need
    # no fit, so it degrades to an empty result like the other scans
    "ann_ivf_kmeans_topk",
    # r4 MLlib tail — all iterative fits behind _require_rows
    "graph_svdpp_train",
    "ml_word2vec_embed",
    "ml_lda_doc_topics",
    "ml_gaussian_mixture",
    "ml_svm_predictions",
    "ml_ridge_lasso_fit",
}


@pytest.fixture(scope="session")
def empty_sf_dir(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        df = spark.read.parquet(f"/root/testdata/sf0.001/{t}.parquet")
        df.limit(0).write.mode("overwrite").parquet(str(out / f"{t}.parquet"))
    return str(out)


@pytest.mark.parametrize("name", sorted(QUERY_REGISTRY))
def test_query_runs_on_empty_tables(spark, empty_sf_dir, name):
    fn = QUERY_REGISTRY[name]
    if name in FIT_REQUIRED:
        with pytest.raises(ValueError, match="empty"):
            fn(spark, empty_sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        return
    fn(spark, empty_sf_dir).write.format("noop").mode("overwrite").save()
