from spark_monotasks_spark.graph.algorithms import (  # noqa: F401
    aggregate_messages,
    connected_components,
    connected_components_star,
    degrees,
    label_propagation,
    pagerank,
    shortest_paths,
    strongly_connected_components,
    triangle_count,
)
from spark_monotasks_spark.graph.svdpp import (  # noqa: F401
    svd_plus_plus,
    svdpp_predict,
    svdpp_t0,
)
