"""Property tests for the r7 operators: pure-Python replays on random
data, beyond the single-dataset oracle checks in test_oracle_parity."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from spark_monotasks_spark.ml.evaluation import (
    binary_auc,
    calibration_bins,
    ks_two_sample,
)
from spark_monotasks_spark.operators.spatial import grid_radius_knn
from spark_monotasks_spark.pipeline.entity import blocked_entity_resolution


def _auc_bruteforce(pairs):
    """AUC = P(score_pos > score_neg) + 0.5 P(tie), all pos/neg pairs."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    wins = ties = 0
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    return (wins + 0.5 * ties) / (len(pos) * len(neg))


def test_binary_auc_matches_pairwise_bruteforce(spark):
    rng = random.Random(11)
    # coarse scores force heavy ties — the average-rank path must agree
    # with the pairwise definition exactly
    pairs = [
        (float(rng.randint(0, 20)), rng.randint(0, 1)) for _ in range(400)
    ]
    df = spark.createDataFrame(pairs, "score double, label int")
    row = binary_auc(df, "score", "label", round_to=9).collect()[0]
    expect = _auc_bruteforce(pairs)
    assert math.isclose(row.auc, expect, abs_tol=1e-8), (row.auc, expect)
    assert row.n_pos == sum(1 for _, y in pairs if y == 1)
    assert row.n_neg == len(pairs) - row.n_pos


def test_auc_extremes(spark):
    """Perfectly separated scores → AUC 1; inverted → 0."""
    rows = [(float(i), 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "score double, label int")
    assert binary_auc(df, "score", "label").collect()[0].auc == 1.0
    inv = spark.createDataFrame(
        [(s, 1 - y) for s, y in rows], "score double, label int"
    )
    assert binary_auc(inv, "score", "label").collect()[0].auc == 0.0


def test_ks_two_sample_matches_bruteforce(spark):
    rng = random.Random(7)
    rows = [
        (float(rng.randint(0, 30)) / 2.0, rng.randint(0, 1))
        for _ in range(500)
    ]
    df = spark.createDataFrame(rows, "v double, a int")
    got = ks_two_sample(df, "v", "a", round_to=9).collect()[0]
    a = sorted(v for v, g in rows if g == 1)
    b = sorted(v for v, g in rows if g == 0)
    vals = sorted({v for v, _ in rows})
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in vals
    )
    assert math.isclose(got.ks_stat, d, abs_tol=1e-8), (got.ks_stat, d)
    assert got.n_a == len(a) and got.n_b == len(b)
    # identical samples → D = 0, never rejects
    same = spark.createDataFrame(
        [(float(i % 13), g) for i in range(260) for g in (0, 1)],
        "v double, a int",
    )
    z = ks_two_sample(same, "v", "a").collect()[0]
    assert z.ks_stat == 0.0 and z.reject_05 == 0


def test_calibration_bins_partition_and_rates(spark):
    rows = [(i / 100.0, 1 if i % 3 == 0 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "p double, y int")
    out = calibration_bins(df, "p", "y", bins=10).collect()
    assert sum(r.n for r in out) == 100  # bins partition the input
    for r in out:
        assert 0 <= r.pos_rate <= 1 and 0 <= r.mean_pred <= 1
    # p = 1.0 lands in the TOP bin, not an overflow bin
    edge = spark.createDataFrame([(1.0, 1)], "p double, y int")
    assert calibration_bins(edge, "p", "y", bins=10).collect()[0].bin == 9


def test_grid_radius_knn_matches_bruteforce(spark):
    rng = random.Random(3)
    left = [(i, rng.uniform(0, 200), rng.uniform(0, 200)) for i in range(60)]
    right = [(j, rng.uniform(0, 200), rng.uniform(0, 200)) for j in range(80)]
    ldf = spark.createDataFrame(left, "lid long, x double, y double")
    rdf = spark.createDataFrame(right, "rid long, x double, y double")
    radius = 35.0
    got = {
        (r.lid, r.rid): r.dist2
        for r in grid_radius_knn(
            ldf, rdf, "lid", "rid", radius=radius, k=None
        ).collect()
    }
    expect = {}
    for li, lx, ly in left:
        for rj, rx, ry in right:
            d2 = (lx - rx) ** 2 + (ly - ry) ** 2
            if d2 <= radius * radius:
                expect[(li, rj)] = d2
    assert set(got) == set(expect)  # grid candidates are LOSSLESS
    for k, v in got.items():
        assert math.isclose(v, expect[k], rel_tol=1e-12)


def test_grid_radius_knn_topk_deterministic_ties(spark):
    # four right points at identical distance — k=2 must keep the two
    # smallest rids
    ldf = spark.createDataFrame([(0, 0.0, 0.0)], "lid long, x double, y double")
    rdf = spark.createDataFrame(
        [(7, 3.0, 0.0), (5, -3.0, 0.0), (9, 0.0, 3.0), (2, 0.0, -3.0)],
        "rid long, x double, y double",
    )
    got = sorted(
        r.rid
        for r in grid_radius_knn(ldf, rdf, "lid", "rid", radius=5.0, k=2)
        .collect()
    )
    assert got == [2, 5]


def test_entity_resolution_singletons_and_chains(spark):
    # a,b,c chain within one block (a~b, b~c but a!~c) must close into
    # ONE cluster; x stays singleton
    rows = [
        (1, "aaaa##zz"),
        (2, "aaab##zz"),   # 1 edit from row 1
        (3, "aabb##zz"),   # 1 edit from row 2, 2 from row 1
        (9, "qqqq##zz"),   # same block, far from everything
    ]
    df = spark.createDataFrame(rows, "rid long, name string")
    got = {
        r.rid: r.cluster
        for r in blocked_entity_resolution(
            df, "rid", "name", F.expr("right(name, 4)"), max_edit=1
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 9: 9}


def test_entity_resolution_no_edges_all_singletons(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "zzzzzz")], "rid long, name string"
    )
    got = {
        r.rid: r.cluster
        for r in blocked_entity_resolution(
            df, "rid", "name", F.expr("right(name, 3)"), max_edit=1
        ).collect()
    }
    assert got == {1: 1, 2: 2}


def test_compaction_execute_one_file_per_bin(spark, tmp_path):
    """The executed compaction must actually reduce file counts: 16
    small sorted files in, one data file per planned bin out, with
    every row preserved."""
    import os

    from spark_monotasks_spark.operators.layout import (
        compaction_bins,
        write_sorted_with_manifest,
    )

    src = str(tmp_path / "small")
    out = str(tmp_path / "compacted")
    df = spark.range(20000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    write_sorted_with_manifest(df, src, "k", num_files=16)
    files = [
        (os.path.join(src, f), os.path.getsize(os.path.join(src, f)))
        for f in sorted(os.listdir(src))
        if f.endswith(".parquet")
    ]
    assert len(files) == 16
    fdf = spark.createDataFrame(files, "path string, bytes long")
    total = sum(b for _, b in files)
    plan = compaction_bins(fdf, target_bytes=max(1, total // 4),
                           order_col="path")
    bin_map = {r["path"]: r["bin"] for r in plan.select("path", "bin").collect()}
    n_bins = len(set(bin_map.values()))
    assert 1 < n_bins < 16  # actually compacting, not a no-op
    data = spark.read.parquet(src).withColumn(
        "_file", F.regexp_replace(F.input_file_name(), "^file:/+", "/")
    )
    mapping = spark.createDataFrame(list(bin_map.items()),
                                    "_file string, bin long")
    routed = data.join(F.broadcast(mapping), on="_file").drop("_file")
    routed.repartition(n_bins, "bin").write.partitionBy("bin").parquet(out)
    # one data file per bin directory
    for d in os.listdir(out):
        if not d.startswith("bin="):
            continue
        parts = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".parquet")]
        assert len(parts) == 1, (d, parts)
    back = spark.read.parquet(out)
    assert back.count() == 20000
    assert back.agg(F.sum("k")).collect()[0][0] == sum(range(20000))


def test_spearman_extremes_and_ties(spark):
    from spark_monotasks_spark.ml.evaluation import spearman_corr

    # perfectly monotone (nonlinear!) → rho exactly 1
    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(100)], "x double, y double"
    )
    assert spearman_corr(mono, "x", "y").collect()[0].rho == 1.0
    # anti-monotone → -1
    anti = spark.createDataFrame(
        [(float(i), float(-i)) for i in range(100)], "x double, y double"
    )
    assert spearman_corr(anti, "x", "y").collect()[0].rho == -1.0


def test_spearman_matches_bruteforce_with_ties(spark):
    import random as _random

    from spark_monotasks_spark.ml.evaluation import spearman_corr

    rng = _random.Random(5)
    rows = [
        (float(rng.randint(0, 9)), float(rng.randint(0, 9)))
        for _ in range(300)
    ]
    got = spearman_corr(
        spark.createDataFrame(rows, "x double, y double"), "x", "y",
        round_to=9,
    ).collect()[0]

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + 1 + j + 1) / 2.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    ra, rb = avg_ranks(xs), avg_ranks(ys)
    n = len(rows)
    sa, sb = sum(ra), sum(rb)
    sab = sum(a * b for a, b in zip(ra, rb))
    saa = sum(a * a for a in ra)
    sbb = sum(b * b for b in rb)
    expect = (n * sab - sa * sb) / math.sqrt(
        (n * saa - sa * sa) * (n * sbb - sb * sb)
    )
    assert math.isclose(got.rho, expect, abs_tol=1e-8), (got.rho, expect)
