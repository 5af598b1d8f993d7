"""Property-based equivalence of the two connected-components engines
(graphx lib/ConnectedComponents.scala parity vs the r4
large-star/small-star default) plus take_sample's distributed-exact
contract — hypothesis drives the graph/population shapes, including the
degenerate ones (self-loops, multi-edges, reversed duplicates, empty)
where the two CC formulations could plausibly diverge.

Iterative Spark jobs per example are not free: example counts are kept
small and inputs tiny; the fixed-seed tests in test_graph_transform.py
cover the larger planted shapes.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# edges over a small vertex universe: collisions, self-loops, and
# reversed duplicates all likely
_edge = st.tuples(st.integers(0, 12), st.integers(0, 12))
_edges = st.lists(_edge, min_size=1, max_size=20)


@given(pairs=_edges)
@_SETTINGS
def test_star_cc_equals_min_label_cc(spark, pairs):
    from spark_monotasks_spark.graph.algorithms import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(pairs, "src long, dst long")
    a = {
        r.id: r.component
        for r in connected_components(edges, max_iters=100).collect()
    }
    b = {
        r.id: r.component
        for r in connected_components_star(edges).collect()
    }
    assert a == b
    # the small-graph fast path (driver union-find) covers every graph
    # hypothesis draws here, so ALSO pin the distributed star rounds by
    # forcing the threshold off — both paths must agree with min-label
    c = {
        r.id: r.component
        for r in connected_components_star(
            edges, small_graph_threshold=0
        ).collect()
    }
    assert a == c


@given(
    n=st.integers(0, 30),
    num=st.integers(0, 12),
    seed=st.integers(0, 3),
)
@_SETTINGS
def test_take_sample_exact_size_subset_no_dups(spark, n, num, seed):
    from spark_monotasks_spark.operators import rdd_bridge

    df = spark.range(n)
    got = [r.id for r in rdd_bridge.take_sample(df, num, seed=seed).collect()]
    assert len(got) == min(num, n)          # exact size, capped by population
    assert len(set(got)) == len(got)        # no duplicates w/o replacement
    assert set(got) <= set(range(n))        # a subset of the population


@given(
    keys=st.lists(st.integers(-1000, 1000), min_size=0, max_size=40,
                  unique=True),
    nparts=st.integers(1, 7),
)
@_SETTINGS
def test_zip_with_index_ordered_contract(spark, keys, nparts):
    """operators/indexing.zip_with_index (ordered form) must equal
    row_number() OVER (ORDER BY k) - 1 for ANY unique key multiset and
    ANY upstream partitioning — the distributed two-pass shape may
    never leak partition-arrival artifacts into the index."""
    from spark_monotasks_spark.operators.indexing import zip_with_index

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(
        nparts
    )
    got = {r.k: r.idx for r in zip_with_index(df, order_cols=["k"]).collect()}
    assert got == {k: i for i, k in enumerate(sorted(keys))}


@given(
    n=st.integers(0, 60),
    nparts=st.integers(1, 7),
)
@_SETTINGS
def test_zip_with_index_layout_contract(spark, n, nparts):
    """Partition-order form: a contiguous 0-based bijection rows->idx
    regardless of partition count (RDD.zipWithIndex parity)."""
    from spark_monotasks_spark.operators.indexing import zip_with_index

    df = spark.range(n).repartition(nparts)
    idxs = sorted(r.idx for r in zip_with_index(df).collect())
    assert idxs == list(range(n))


# --- prefix-Jaccard join + span dedup vs pure-Python references -------------

_doc_texts = st.lists(
    st.lists(
        st.sampled_from([f"w{j}" for j in range(12)]), min_size=1, max_size=10
    ).map(" ".join),
    min_size=2,
    max_size=12,
)


@given(texts=_doc_texts, thresh=st.sampled_from([0.34, 0.5, 0.75, 1.0]))
@_SETTINGS
def test_jaccard_prefix_join_equals_brute_force(spark, texts, thresh):
    """Lossless-blocking property: on ANY corpus and threshold the
    prefix+positional-filtered join equals the all-pairs computation —
    the tiny vocab forces heavy set overlap, stressing the filters'
    boundary arithmetic (ceil epsilon guards) far harder than real
    corpora do."""
    import itertools

    from spark_monotasks_spark.pipeline import dedup

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.jaccard_join_prefix(df, threshold=thresh).collect()
    )
    sets = {i: set(t.split(" ")) for i, t in docs}
    want = sorted(
        (ia, ib, round(len(sa & sb) / len(sa | sb), 6))
        for (ia, sa), (ib, sb) in itertools.combinations(sets.items(), 2)
        if round(len(sa & sb) / len(sa | sb), 6) >= thresh
    )
    assert got == want


@given(texts=_doc_texts, k=st.sampled_from([2, 3, 5]))
@_SETTINGS
def test_drop_duplicate_spans_equals_python_reference(spark, texts, k):
    """ExactSubstr cut vs the pure-Python gram-cover replay on random
    heavy-repetition corpora (12-word vocab => cross-doc duplicated
    runs everywhere, including doc-internal repeats and runs at the
    very ends)."""
    from spark_monotasks_spark.pipeline import dedup

    docs = list(enumerate(texts))
    first = {}
    for i, t in docs:
        toks = t.split(" ")
        for p in range(len(toks) - k + 1):
            g = tuple(toks[p:p + k])
            if g not in first:
                first[g] = (i, p)
    expect = {}
    for i, t in docs:
        toks = t.split(" ")
        drop = set()
        for p in range(len(toks) - k + 1):
            if first[tuple(toks[p:p + k])] != (i, p):
                drop.update(range(p, p + k))
        expect[i] = " ".join(
            tok for j, tok in enumerate(toks) if j not in drop
        )
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.text_dedup
           for r in dedup.drop_duplicate_spans(df, min_tokens=k).collect()}
    assert got == expect


# --- distributed prefix sum family ------------------------------------------

@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=60),
    target=st.sampled_from([1, 7, 64, 1000]),
)
@_SETTINGS
def test_running_total_and_bins_match_python(spark, vals, target):
    """running_total == the sequential cumulative sum on ANY values
    (ties in the order key broken by id), and compaction bins built on
    it satisfy the fill contract: every bin except the last reaches
    the target."""
    from spark_monotasks_spark.operators.indexing import running_total
    from spark_monotasks_spark.operators.layout import compaction_bins

    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "path long, bytes long").repartition(7)
    got = {r.path: r.rt for r in
           running_total(df, "bytes", ["path"], total_col="rt").collect()}
    acc, expect = 0, {}
    for i, v in rows:
        acc += v
        expect[i] = acc
    assert got == expect

    out = {r.path: (r.cum_bytes, r.bin)
           for r in compaction_bins(df, target_bytes=target).collect()}
    maxcum: dict[int, int] = {}
    for i, v in rows:
        assert out[i][0] == expect[i]
        assert out[i][1] == (expect[i] - v) // target
        maxcum[out[i][1]] = max(maxcum.get(out[i][1], 0), expect[i])
    # coverage invariant: every non-final EXISTING bin closes at
    # cumulative size >= (bin+1)*target — a bin's own fill undershoots
    # target only by a boundary-crossing predecessor's overshoot
    # (hypothesis found the stronger per-bin-fill claim false:
    # vals=[8,6,0], target=7)
    last = max(maxcum)
    assert all(v >= (b + 1) * target for b, v in maxcum.items() if b != last)
