"""GraphX-proof algorithms + TRANSFORM script shim (SURVEY §2.11/§2.12)."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

from spark_monotasks_spark.graph import connected_components, degrees, pagerank
from spark_monotasks_spark.operators.transform import script_transform


@pytest.fixture(scope="module")
def chain_and_triangle(spark):
    # components: {0,1,2} (chain), {10,11,12} (triangle), {20,21} (edge)
    edges = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 10), (20, 21)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_connected_components(spark, chain_and_triangle):
    got = {
        r.id: r.component for r in connected_components(chain_and_triangle).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_degrees(spark, chain_and_triangle):
    got = {r.id: r.degree for r in degrees(chain_and_triangle).collect()}
    assert got[1] == 2 and got[0] == 1 and got[10] == 2 and got[20] == 1


def test_pagerank_star(spark):
    # star: 1,2,3 -> 0.  hub 0 collects rank; leaves hold the reset floor.
    edges = spark.createDataFrame([(1, 0), (2, 0), (3, 0)], "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(edges, num_iters=20).collect()}
    assert ranks[1] == ranks[2] == ranks[3] == pytest.approx(0.15, abs=1e-6)
    # hub: 0.15 + 0.85 * (3 * 0.15) = 0.5325 at fixpoint (0 has no out-edges,
    # so leaf ranks converge to the reset floor)
    assert ranks[0] == pytest.approx(0.15 + 0.85 * 3 * 0.15, abs=1e-4)


def test_pagerank_cycle_uniform(spark):
    # 3-cycle: perfectly symmetric → every rank = 1.0 at any iteration
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    ranks = [r.rank for r in pagerank(edges, num_iters=5).collect()]
    assert all(r == pytest.approx(1.0, abs=1e-9) for r in ranks)


# --- TRANSFORM script ------------------------------------------------------

TOKENIZE = (
    "import sys\n"
    "for line in sys.stdin:\n"
    "    doc_id, text = line.rstrip('\\n').split('\\t', 1)\n"
    "    for tok in text.split():\n"
    "        print(f'{doc_id}\\t{tok}')\n"
)


def test_script_transform_tokenize(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "x y")], "doc_id long, text string"
    )
    out = script_transform(
        df,
        [sys.executable, "-c", TOKENIZE],
        "doc_id long, token string",
        input_cols=["doc_id", "text"],
    )
    rows = {(r.doc_id, r.token) for r in out.collect()}
    assert rows == {(1, "a"), (1, "b"), (1, "c"), (2, "x"), (2, "y")}
    assert [f.name for f in out.schema.fields] == ["doc_id", "token"]
    assert out.schema["doc_id"].dataType.typeName() == "long"


def test_script_transform_bad_exit(spark):
    df = spark.createDataFrame([(1,)], "x long")
    bad = script_transform(
        df, [sys.executable, "-c", "import sys; sys.exit(3)"], "y long"
    )
    with pytest.raises(Exception, match="exited 3"):
        bad.collect()


def test_script_transform_identity_cat(spark):
    # the classic Hive smoke test: TRANSFORM ... USING 'cat'
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    out = script_transform(df, ["cat"], "k long, v string")
    assert sorted((r.k, r.v) for r in out.collect()) == [(1, "a"), (2, "b")]


def test_triangle_count_known_graphs(spark, chain_and_triangle):
    from spark_monotasks_spark.graph import triangle_count

    got = {r.id: r.triangles for r in triangle_count(chain_and_triangle).collect()}
    # chain 0-1-2: no triangles; triangle 10,11,12: one each; edge 20-21: none
    assert got == {0: 0, 1: 0, 2: 0, 10: 1, 11: 1, 12: 1, 20: 0, 21: 0}


def test_triangle_count_k4(spark):
    from itertools import combinations

    from spark_monotasks_spark.graph import triangle_count

    edges = spark.createDataFrame(
        list(combinations(range(4), 2)), "src long, dst long"
    )
    got = {r.id: r.triangles for r in triangle_count(edges).collect()}
    assert got == {i: 3 for i in range(4)}  # K4: each vertex in C(3,2)=3


def test_connected_components_raises_without_convergence(spark):
    import pytest as _pytest
    from spark_monotasks_spark.graph import connected_components

    path_edges = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path_edges, max_iters=3)
    got = {r.id: r.component for r in connected_components(path_edges).collect()}
    assert set(got.values()) == {0}


def test_shortest_paths_chain(spark):
    from spark_monotasks_spark.graph import shortest_paths

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    got = {
        (r.id, r.landmark): r.distance
        for r in shortest_paths(edges, landmarks=[0]).collect()
    }
    assert got == {(0, 0): 0, (1, 0): 1, (2, 0): 2, (3, 0): 3}
    # 10, 11 unreachable from 0 → absent (reference: empty map entries)


def test_shortest_paths_two_landmarks(spark):
    from spark_monotasks_spark.graph import shortest_paths

    edges = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        (r.id, r.landmark): r.distance
        for r in shortest_paths(edges, landmarks=[0, 2]).collect()
    }
    assert got[(1, 0)] == 1 and got[(1, 2)] == 1
    assert got[(0, 2)] == 2 and got[(2, 0)] == 2


def test_label_propagation_two_cliques(spark):
    from itertools import combinations

    from spark_monotasks_spark.graph import label_propagation

    cliq1 = list(combinations([0, 1, 2, 3], 2))
    cliq2 = list(combinations([10, 11, 12, 13], 2))
    bridge = [(3, 10)]
    edges = spark.createDataFrame(cliq1 + cliq2 + bridge, "src long, dst long")
    got = {r.id: r.label for r in label_propagation(edges, max_iters=5).collect()}
    # each clique converges to one internal label; cliques stay distinct
    assert len({got[i] for i in [0, 1, 2]}) == 1
    assert len({got[i] for i in [11, 12, 13]}) == 1
    assert got[0] != got[11]


def test_label_propagation_two_vertex_clique_converges(spark):
    # the classic LPA oscillation case: a-b swap labels forever without
    # the self-vote; with it both converge to min(a, b)
    from spark_monotasks_spark.graph import label_propagation

    edges = spark.createDataFrame([(7, 3)], "src long, dst long")
    got = {r.id: r.label for r in label_propagation(edges, max_iters=4).collect()}
    assert got == {3: 3, 7: 3}


def test_script_transform_null_ints_and_ragged_output(spark):
    import sys as _sys

    df = spark.createDataFrame([(1, 10), (2, None), (3, 30)], "k long, v long")
    # identity cat: ints must arrive as '10' (not '10.0'), nulls as ''
    out = script_transform(df, ["cat"], "k long, v long")
    got = {r.k: r.v for r in out.collect()}
    assert got == {1: 10, 2: None, 3: 30}

    # ragged stdout: missing trailing fields null-pad, extras ignored
    ragged = (
        "import sys\n"
        "for line in sys.stdin:\n"
        "    k = line.split('\\t')[0]\n"
        "    if k == '1': print(f'{k}')\n"            # short row
        "    elif k == '2': print(f'{k}\\ta\\tzzz')\n"  # extra field
        "    else: print(f'{k}\\tb')\n"
    )
    out2 = script_transform(
        df, [_sys.executable, "-c", ragged], "k long, s string"
    )
    got2 = {r.k: r.s for r in out2.collect()}
    assert got2 == {1: None, 2: "a", 3: "b"}


def test_scc_planted_cycles_and_dag(spark):
    """Closed-form SCC fixture: two directed cycles bridged by one-way
    DAG edges, a pure-DAG tail, and a 2-cycle — every vertex's component
    is hand-computable, and undirected CC would merge everything."""
    from spark_monotasks_spark.graph import (
        connected_components,
        strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [
            # cycle A {1,2,3}
            (1, 2), (2, 3), (3, 1),
            # one-way bridge into cycle B {10,11,12}
            (3, 10), (10, 11), (11, 12), (12, 10),
            # DAG tail: 12 -> 20 -> 21 (no back edges: singleton SCCs)
            (12, 20), (20, 21),
            # 2-cycle {30,31}, disconnected from the rest
            (30, 31), (31, 30),
        ],
        "src long, dst long",
    )
    got = {
        r.id: r.component
        for r in strongly_connected_components(edges).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1,
        10: 10, 11: 10, 12: 10,
        20: 20, 21: 21,
        30: 30, 31: 30,
    }
    # contrast: undirected CC merges the bridged cycles and the tail
    cc = {r.id: r.component for r in connected_components(edges).collect()}
    assert cc[20] == cc[1] == cc[10]


# --- barrier durability (spark_monotasks_spark/barrier.py) -----------------

def test_barrier_local_vs_reliable(spark, tmp_path):
    """reliable=False truncates lineage executor-locally; reliable=True
    refuses without a checkpoint dir, and with one writes real
    checkpoint files (survives executor loss) while producing the same
    rows."""
    import os

    import pytest as _pytest
    from pyspark.sql import functions as F

    from spark_monotasks_spark.barrier import barrier

    df = spark.range(100).select("id", (F.col("id") * 2).alias("v"))

    local = barrier(df, reliable=False)
    # lineage is cut: the plan bottoms out at a materialized RDD scan,
    # not the original Range
    assert "Range" not in local._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r.v for r in local.collect()) == sorted(
        r.v for r in df.collect()
    )

    # reliable without a configured dir must refuse loudly
    if spark.sparkContext.getCheckpointDir() is None:
        with _pytest.raises(ValueError, match="setCheckpointDir"):
            barrier(df, reliable=True)

    ckdir = str(tmp_path / "ck")
    spark.sparkContext.setCheckpointDir(ckdir)
    rel = barrier(df, reliable=True)
    assert "Range" not in rel._jdf.queryExecution().optimizedPlan().toString()
    assert sorted(r.v for r in rel.collect()) == sorted(
        r.v for r in df.collect()
    )
    # eager checkpoint materialized real files under the configured dir
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(ckdir)
        for f in fs
    ]
    assert files, "reliable barrier wrote no checkpoint files"


def test_iterative_algorithms_reliable_path_same_answer(spark, tmp_path):
    """The reliable-checkpoint path is a pure durability swap: the
    iterative operators return identical results either way."""
    from spark_monotasks_spark.graph.algorithms import connected_components
    from spark_monotasks_spark.pipeline import dedup

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ck2"))
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    a = {r.id: r.component for r in connected_components(edges).collect()}
    b = {
        r.id: r.component
        for r in connected_components(edges, reliable=True).collect()
    }
    assert a == b

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "completely different text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    p_local = sorted(
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(
            docs, jaccard_threshold=0.3
        ).collect()
    )
    p_rel = sorted(
        (r.id_a, r.id_b)
        for r in dedup.minhash_near_duplicates(
            docs, jaccard_threshold=0.3, reliable=True
        ).collect()
    )
    assert p_local == p_rel == [(1, 2)]


# --- large-star/small-star connected components ----------------------------

def test_cc_star_matches_minlabel_on_random_graphs(spark):
    """Same (id -> min-id) labeling as the reference-matching min-label
    variant, across random graph shapes (Erdos-Renyi-ish sparse, dense
    clusters, isolated self-loop vertices)."""
    import random as _random

    from spark_monotasks_spark.graph.algorithms import (
        connected_components,
        connected_components_star,
    )

    rng = _random.Random(2024)
    for trial in range(4):
        n = rng.randrange(20, 60)
        m = rng.randrange(n // 2, 2 * n)
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ] + [(99, 99)]  # self-loop-only vertex keeps its own label
        edges = spark.createDataFrame(pairs, "src long, dst long")
        a = {
            r.id: r.component
            for r in connected_components(edges, max_iters=100).collect()
        }
        b = {
            r.id: r.component
            for r in connected_components_star(edges).collect()
        }
        assert a == b, f"trial {trial}: star != min-label"


def test_cc_star_converges_on_high_diameter_path(spark):
    """A 61-vertex path graph has diameter 60: min-label needs >50
    rounds (the default max_iters raises), star converges in O(log n)
    rounds and still labels everything with the path's minimum."""
    import pytest as _pytest

    from spark_monotasks_spark.graph.algorithms import (
        connected_components,
        connected_components_star,
    )

    path = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "src long, dst long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(path)  # default max_iters=50 < diameter

    got = {
        r.id: r.component for r in connected_components_star(path).collect()
    }
    assert got == {i: 0 for i in range(61)}


# --- SVD++ (graph/svdpp.py, reference lib/SVDPlusPlus.scala) ---------------

def test_svdpp_learns_planted_blocks_and_clips(spark):
    """Training reduces RMSE on a planted two-block rating matrix, and
    predictions honor the [min_val, max_val] clip — the reference's
    sendMsgTestF contract."""
    from pyspark.sql import functions as F

    from spark_monotasks_spark.graph import svd_plus_plus, svdpp_predict

    rows = []
    for uid in range(20):
        for it in range(100, 110):
            hi = (it < 105) == (uid < 10)
            rows.append((uid, it, 5.0 if hi else 1.0))
    ratings = spark.createDataFrame(rows, "src long, dst long, rating double")

    def rmse(iters):
        v, u = svd_plus_plus(
            ratings, rank=4, max_iters=iters, min_val=1.0, max_val=5.0
        )
        p = svdpp_predict(v, u, ratings.select("src", "dst", "rating"),
                          1.0, 5.0)
        agg = p.agg(
            F.sqrt(F.avg((F.col("pred") - F.col("rating")) ** 2)).alias("r"),
            F.min("pred").alias("mn"), F.max("pred").alias("mx"),
            F.count("*").alias("n"),
        ).first()
        assert agg.n == len(rows)
        assert agg.mn >= 1.0 - 1e-9 and agg.mx <= 5.0 + 1e-9
        return agg.r

    assert rmse(3) < rmse(0)  # training actually reduces training error


def test_svdpp_bias_init_is_incident_mean(spark):
    """t0 parity (SVDPlusPlus.scala:106-114): with zero iterations each
    vertex's bias is the mean of its incident ratings and norm is
    1/sqrt(degree)."""
    import math

    from spark_monotasks_spark.graph import svd_plus_plus

    ratings = spark.createDataFrame(
        [(1, 100, 4.0), (1, 101, 2.0), (2, 100, 5.0)],
        "src long, dst long, rating double",
    )
    verts, u = svd_plus_plus(ratings, rank=2, max_iters=0)
    assert abs(u - 11.0 / 3) < 1e-9
    got = {r.id: r for r in verts.collect()}
    assert abs(got[1].bias - 3.0) < 1e-9       # user 1: (4+2)/2
    assert abs(got[100].bias - 4.5) < 1e-9     # item 100: (4+5)/2
    assert abs(got[1].norm - 1 / math.sqrt(2)) < 1e-9
    assert abs(got[101].norm - 1.0) < 1e-9
    assert got[1].is_user and not got[100].is_user

    import pytest as _pytest
    with _pytest.raises(ValueError, match="empty"):
        svd_plus_plus(ratings.limit(0))


def test_svdpp_one_iteration_matches_hand_computation(spark):
    """Exact update-rule parity (sendMsgTrainF, SVDPlusPlus.scala:117-139
    + the two outerJoin applications): fetch the deterministic init
    state (max_iters=0), replay ONE iteration by hand in Python —
    phase-1 user slot, per-edge clipped error, p/q/y/bias deltas with
    the gamma rates — and require the trained vertices to match to
    float tolerance."""
    import math

    from spark_monotasks_spark.graph import svd_plus_plus

    G1, G2, G6, G7 = 0.02, 0.03, 0.01, 0.05
    MINV, MAXV = 1.0, 5.0
    edges = [(1, 100, 4.0), (1, 101, 2.0), (2, 100, 5.0)]
    ratings = spark.createDataFrame(edges, "src long, dst long, rating double")

    init, u = svd_plus_plus(
        ratings, rank=2, max_iters=0, min_val=MINV, max_val=MAXV,
        gamma1=G1, gamma2=G2, gamma6=G6, gamma7=G7,
    )
    v0 = {r.id: r.asDict() for r in init.collect()}

    # --- hand replay of one iteration -------------------------------
    state = {
        i: {
            "p": list(d["p"]), "y": list(d["y"]),
            "bias": d["bias"], "norm": d["norm"],
        }
        for i, d in v0.items()
    }
    # phase 1: each user's second slot <- p_u + norm_u * sum(y_items)
    items_of = {1: [100, 101], 2: [100]}
    for uid, its in items_of.items():
        s = [sum(state[i]["y"][d] for i in its) for d in range(2)]
        state[uid]["y"] = [
            state[uid]["p"][d] + state[uid]["norm"] * s[d] for d in range(2)
        ]
    # phase 2: per-edge deltas, summed per vertex, applied once
    dp = {i: [0.0, 0.0] for i in state}
    dy = {i: [0.0, 0.0] for i in state}
    db = {i: 0.0 for i in state}
    for src, dst, r in edges:
        usr, itm = state[src], state[dst]
        q, u2 = itm["p"], usr["y"]
        pred = u + usr["bias"] + itm["bias"] + sum(
            q[d] * u2[d] for d in range(2)
        )
        pred = min(max(pred, MINV), MAXV)
        err = r - pred
        for d in range(2):
            dp[src][d] += (q[d] * err - usr["p"][d] * G7) * G2
            dp[dst][d] += (u2[d] * err - q[d] * G7) * G2
            upd_y = (q[d] * err * usr["norm"] - itm["y"][d] * G7) * G2
            dy[src][d] += upd_y
            dy[dst][d] += upd_y
        db[src] += (err - G6 * usr["bias"]) * G1
        db[dst] += (err - G6 * itm["bias"]) * G1
    expected = {
        i: {
            "p": [state[i]["p"][d] + dp[i][d] for d in range(2)],
            "y": [state[i]["y"][d] + dy[i][d] for d in range(2)],
            "bias": state[i]["bias"] + db[i],
        }
        for i in state
    }

    got, _ = svd_plus_plus(
        ratings, rank=2, max_iters=1, min_val=MINV, max_val=MAXV,
        gamma1=G1, gamma2=G2, gamma6=G6, gamma7=G7,
    )
    for r in got.collect():
        e = expected[r.id]
        assert all(
            math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
            for a, b in zip(r.p, e["p"])
        ), (r.id, "p", list(r.p), e["p"])
        assert all(
            math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)
            for a, b in zip(r.y, e["y"])
        ), (r.id, "y", list(r.y), e["y"])
        assert math.isclose(r.bias, e["bias"], rel_tol=1e-9)


def test_personalized_pagerank_concentrates_on_seed(spark):
    """PPR on a star: seed at the hub — rank mass stays near the hub;
    a far leaf of a chain gets less than a near one; non-seed graph
    with no path from seed gets zero."""
    from spark_monotasks_spark.graph.algorithms import personalized_pagerank

    # chain 1->2->3->4 plus isolated pair 10->11
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "src long, dst long"
    )
    r = {row.id: row.rank for row in
         personalized_pagerank(edges, [1], num_iters=8).collect()}
    assert r[1] > r[2] > r[3] > r[4] > 0
    assert r[10] == 0.0 and r[11] == 0.0  # unreachable from the seed
    import pytest as _pt
    with _pt.raises(ValueError):
        personalized_pagerank(edges, [])


def test_k_core_planted_shapes(spark):
    """A 5-clique survives 3-core peeling intact (core_deg 4 each); a
    path hanging off it peels away COMPLETELY over multiple rounds
    (each cut lowers the next vertex's degree — the chain the
    fixpoint loop must follow); k larger than any degree empties the
    graph."""
    from spark_monotasks_spark.graph.algorithms import k_core

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    edges = spark.createDataFrame(clique + path, "src long, dst long")

    core = {r["id"]: r["core_deg"] for r in k_core(edges, k=3).collect()}
    assert core == {0: 4, 1: 4, 2: 4, 3: 4, 4: 4}

    assert k_core(edges, k=5).count() == 0


def test_k_core_degree_counts_distinct_neighbors(spark):
    """Parallel/duplicate edges collapse before degrees are counted —
    a doubled edge must not fake a higher degree."""
    from spark_monotasks_spark.graph.algorithms import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    # degrees: 1->1 (only neighbor 2), 2->2, 3->1 ; k=2 empties it
    assert k_core(edges, k=2).count() == 0


def test_k_core_sym_dedup_skip_bipartite_equal(spark):
    """sym_dedup=False (the graph_kcore entry's disjoint-domain
    precondition) must return exactly the dedup'ed result on a
    distinct bipartite edge list — same cores, same degrees."""
    from spark_monotasks_spark.graph.algorithms import k_core

    # bipartite: left ids 1-4, right ids 101-104, distinct edges only
    pairs = [
        (l, r)
        for l in range(1, 5)
        for r in range(101, 105)
        if (l + r) % 7 != 0
    ]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    a = sorted(map(tuple, k_core(edges, k=2).collect()))
    b = sorted(map(tuple, k_core(edges, k=2, sym_dedup=False).collect()))
    assert a == b and len(a) > 0
    # ADVICE r8: the small-graph fast path was absorbing this test, so
    # the distributed half-pin round-0 state (lazy union over one
    # half-size cache + prev_pin unpersist bookkeeping) had no local
    # unit coverage — force the distributed loop explicitly
    c = sorted(
        map(
            tuple,
            k_core(
                edges, k=2, sym_dedup=False, small_graph_threshold=0
            ).collect(),
        )
    )
    assert a == c


def test_k_core_small_graph_fast_path_equals_distributed(spark):
    """The r8 driver fast path (bounded toPandas + vectorized peel)
    must return exactly the distributed loop's result — same ids, same
    within-core degrees, same schema — on a shape that needs multiple
    peel rounds (clique + chain) plus isolated extra components."""
    from spark_monotasks_spark.graph.algorithms import k_core

    clique = [(a, b) for a in range(5) for b in range(5) if a < b]
    path = [(4, 10), (10, 11), (11, 12)]
    tri = [(20, 21), (21, 22), (20, 22)]
    edges = spark.createDataFrame(clique + path + tri, "src long, dst long")

    fast = k_core(edges, k=3)
    slow = k_core(edges, k=3, small_graph_threshold=0)
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, slow.collect())
    )
    assert [f.dataType for f in fast.schema.fields] == [
        f.dataType for f in slow.schema.fields
    ]
    assert fast.columns == slow.columns

    # max_rounds raise parity: a 13-vertex chain with k=1... chains
    # peel fully in one round under simultaneous deletion; instead use
    # a long path with k=2, which peels one vertex per end per round
    long_path = [(i, i + 1) for i in range(30)]
    e2 = spark.createDataFrame(long_path, "src long, dst long")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="fixpoint"):
        k_core(e2, k=2, max_rounds=3)
    with _pytest.raises(RuntimeError, match="fixpoint"):
        k_core(e2, k=2, max_rounds=3, small_graph_threshold=0)
