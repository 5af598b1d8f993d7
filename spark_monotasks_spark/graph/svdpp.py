"""SVD++ (graphx lib/SVDPlusPlus.scala) on DataFrames — the last §2.12
algorithm row.

Reference semantics (SVDPlusPlus.scala:85-210, after Koren KDD'08 §5):
bipartite rating graph with users as edge sources and items as edge
destinations (one shared vertex-id space, so user and item ids must be
disjoint); prediction rule

    r̂_ui = μ + b_u + b_i + q_i · (p_u + |N(u)|^{-1/2} Σ_{j∈N(u)} y_j)

clipped to [min_val, max_val].  Each iteration is the reference's two
aggregateMessages phases, reproduced exactly:

- phase 1: every user's second factor slot becomes
  p_u + norm_u · Σ y_j over its items (SVDPlusPlus.scala:141-152);
- phase 2: per-edge batch-gradient updates to p/q, the shared y slot,
  and both biases with the γ1/γ2/γ6/γ7 learning/regularization rates
  (sendMsgTrainF, :117-139 — including the reference quirk that the y
  update is ALSO added to the user's temporary second slot, :164-171).

Differences, both deliberate: factor initialization is a seeded hash
(deterministic re-runs; the reference used unseeded Random.nextDouble,
:87-95), and the final per-item squared-error pass is returned as an
explicit column instead of overwriting the norm slot (:178-195).

Scale shape: one vertex DataFrame (id, p, y, bias, norm), one edge
DataFrame; every phase is join + groupBy on vertex ids (the same
superstep shape as the other graph algorithms, so co-partitioning
carries across iterations).  Vector sums aggregate as exploded
(id, dim, val) rows — rank× more shuffle rows but each tiny, and the
hash aggregate collapses them map-side, so no per-group degree-sized
buffers (a collect_list fold would buffer degree×rank doubles for
power users).  Each iteration ends at a :func:`barrier` (reliable
checkpointing available like every iterative operator here).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_monotasks_spark.barrier import barrier


def _vadd(a: Column, b: Column) -> Column:
    return F.zip_with(a, b, lambda x, y: x + y)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _hash_unit_vector(id_col: Column, rank: int, salt: str, seed: int) -> Column:
    """Deterministic per-(vertex, dim) uniform [0, 1) draws — the seeded
    stand-in for the reference's Random.nextDouble initialization."""
    return F.array(
        *[
            (
                F.pmod(
                    F.xxhash64(id_col, F.lit(salt), F.lit(d), F.lit(seed)),
                    F.lit(1_000_000_007),
                )
                / 1_000_000_007.0
            )
            for d in range(rank)
        ]
    )


def _vector_sum(df: DataFrame, key: str, vec: str, rank: int) -> DataFrame:
    """Element-wise sum of ``vec`` arrays per ``key``: explode to
    (key, dim, val), partial-agg map-side, reassemble the rank-sized
    array.  Returns (key, vsum)."""
    exploded = df.select(
        key, F.posexplode(vec).alias("_dim", "_val")
    )
    summed = exploded.groupBy(key, "_dim").agg(F.sum("_val").alias("_s"))
    return (
        summed.groupBy(key)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_dim", "_s"))),
                lambda s: s["_s"],
            ).alias("vsum")
        )
    )


def svdpp_t0(edges: DataFrame, rank: int = 4, seed: int = 42) -> DataFrame:
    """The t0 vertex state of SVD++ (SVDPlusPlus.scala:106-114): per
    vertex, incident (count, sum) of ratings → ``bias`` = incident mean,
    ``norm`` = 1/sqrt(degree), plus the seeded-hash ``p``/``y`` factor
    vectors and the user/item flag.  ``edges`` is (src, dst, rating)
    with disjoint user/item id spaces.

    bias/norm/is_user are exact relational quantities (union of the two
    edge endpoints → one groupBy) — the SQL-expressible observable that
    oracle-backs the otherwise solver-order-specific SVD++ training
    (catalog entry ``graph_svdpp_t0``).  Empty edges yield an empty
    state (training itself requires rows and raises)."""
    # r9 (guide §2.1/§2.4): is_user is just "did the id ever appear as
    # src", so melt each edge into its two tagged endpoint rows with ONE
    # explode and fold the flag in the SAME aggregate that computes
    # degree/bias — semantically identical to the old
    # unionAll + distinct + left-join (coalesce(_isu,false) == max of
    # the per-row flags) but the caller's edge subtree is evaluated
    # once instead of three times and the whole state is ONE exchange
    # (the groupBy) with no join at all.
    incident = edges.select(
        F.explode(
            F.array(
                F.struct(F.col("src").alias("id"), F.lit(True).alias("_isu")),
                F.struct(F.col("dst").alias("id"), F.lit(False).alias("_isu")),
            )
        ).alias("_e"),
        "rating",
    ).select(F.col("_e.id").alias("id"), "rating", F.col("_e._isu").alias("_isu"))
    degrees = incident.groupBy("id").agg(
        F.count("*").alias("_deg"),
        F.avg("rating").alias("bias"),
        F.max("_isu").alias("_is_user"),
    )
    return degrees.select(
        "id",
        F.col("_is_user").alias("is_user"),
        _hash_unit_vector(F.col("id"), rank, "p", seed).alias("p"),
        _hash_unit_vector(F.col("id"), rank, "y", seed).alias("y"),
        "bias",
        (F.lit(1.0) / F.sqrt("_deg")).alias("norm"),
    )


def svd_plus_plus(
    ratings: DataFrame,
    rank: int = 4,
    max_iters: int = 3,
    min_val: float = 0.0,
    max_val: float = 5.0,
    gamma1: float = 0.007,
    gamma2: float = 0.007,
    gamma6: float = 0.005,
    gamma7: float = 0.015,
    seed: int = 42,
    reliable: bool = False,
) -> tuple[DataFrame, float]:
    """Train SVD++ on ``ratings`` (src=user id, dst=item id, rating);
    user and item ids must be disjoint (shared vertex space, like the
    reference's Graph.fromEdges).  Returns (vertices, u) where
    ``vertices`` is (id, is_user, p, y, bias, norm) and ``u`` is the
    global rating mean; feed both to :func:`svdpp_predict`."""
    edges = ratings.select(
        F.col("src").cast("long"), F.col("dst").cast("long"),
        F.col("rating").cast("double"),
    )
    edges = barrier(edges, reliable)
    row = edges.agg(
        F.avg("rating").alias("u"), F.count("*").alias("n")
    ).first()
    if not row["n"]:
        raise ValueError("cannot train SVD++ on an empty ratings DataFrame")
    u = float(row["u"])

    verts = barrier(svdpp_t0(edges, rank=rank, seed=seed), reliable)

    for _ in range(max_iters):
        # phase 1: user second slot ← p_u + norm_u · Σ y_items
        item_y = verts.select(F.col("id").alias("dst"), F.col("y").alias("_iy"))
        ysum = _vector_sum(
            edges.join(item_y, on="dst").select("src", "_iy"), "src", "_iy", rank
        ).select(F.col("src").alias("id"), F.col("vsum").alias("_ys"))
        verts = verts.join(ysum, on="id", how="left").select(
            "id", "is_user", "p",
            F.when(
                F.col("_ys").isNotNull(),
                _vadd(
                    F.col("p"),
                    F.transform(F.col("_ys"), lambda x: x * F.col("norm")),
                ),
            ).otherwise(F.col("y")).alias("y"),
            "bias", "norm",
        )
        verts = barrier(verts, reliable)

        # phase 2: per-edge gradients (sendMsgTrainF, :117-139)
        usr = verts.select(
            F.col("id").alias("src"), F.col("p").alias("_up"),
            F.col("y").alias("_u2"), F.col("bias").alias("_ub"),
            F.col("norm").alias("_un"),
        )
        itm = verts.select(
            F.col("id").alias("dst"), F.col("p").alias("_iq"),
            F.col("y").alias("_iy"), F.col("bias").alias("_ib"),
        )
        tri = edges.join(usr, on="src").join(itm, on="dst")
        pred = F.least(
            F.greatest(
                F.lit(u) + F.col("_ub") + F.col("_ib")
                + _dot(F.col("_iq"), F.col("_u2")),
                F.lit(min_val),
            ),
            F.lit(max_val),
        )
        err = (F.col("rating") - pred).alias("_err")
        g2, g7 = F.lit(gamma2), F.lit(gamma7)
        upd_p = F.zip_with(
            F.col("_iq"), F.col("_up"),
            lambda q, p: (q * F.col("_err") - p * g7) * g2,
        )
        upd_q = F.zip_with(
            F.col("_u2"), F.col("_iq"),
            lambda u2, q: (u2 * F.col("_err") - q * g7) * g2,
        )
        upd_y = F.zip_with(
            F.col("_iq"), F.col("_iy"),
            lambda q, y: (q * F.col("_err") * F.col("_un") - y * g7) * g2,
        )
        msgs = tri.withColumn("_err", err).select(
            "src", "dst", "_ub", "_ib", "_err",
            upd_p.alias("_dp"), upd_q.alias("_dq"), upd_y.alias("_dy"),
        )
        to_src = msgs.select(
            F.col("src").alias("id"), F.col("_dp").alias("_dvec1"),
            F.col("_dy").alias("_dvec2"),
            ((F.col("_err") - F.lit(gamma6) * F.col("_ub")) * F.lit(gamma1)
             ).alias("_db"),
        )
        to_dst = msgs.select(
            F.col("dst").alias("id"), F.col("_dq").alias("_dvec1"),
            F.col("_dy").alias("_dvec2"),
            ((F.col("_err") - F.lit(gamma6) * F.col("_ib")) * F.lit(gamma1)
             ).alias("_db"),
        )
        deltas = to_src.unionAll(to_dst)
        dv1 = _vector_sum(deltas, "id", "_dvec1", rank).select(
            "id", F.col("vsum").alias("_d1")
        )
        dv2 = _vector_sum(deltas, "id", "_dvec2", rank).select(
            "id", F.col("vsum").alias("_d2")
        )
        db = deltas.groupBy("id").agg(F.sum("_db").alias("_dbias"))
        verts = (
            verts.join(dv1, on="id", how="left")
            .join(dv2, on="id", how="left")
            .join(db, on="id", how="left")
            .select(
                "id", "is_user",
                F.when(
                    F.col("_d1").isNotNull(), _vadd(F.col("p"), F.col("_d1"))
                ).otherwise(F.col("p")).alias("p"),
                F.when(
                    F.col("_d2").isNotNull(), _vadd(F.col("y"), F.col("_d2"))
                ).otherwise(F.col("y")).alias("y"),
                (F.col("bias") + F.coalesce("_dbias", F.lit(0.0))).alias("bias"),
                "norm",
            )
        )
        verts = barrier(verts, reliable)
    return verts, u


def svdpp_predict(
    vertices: DataFrame,
    u: float,
    pairs: DataFrame,
    min_val: float = 0.0,
    max_val: float = 5.0,
) -> DataFrame:
    """Clipped SVD++ predictions for (src=user, dst=item) ``pairs``
    using trained ``vertices`` — the reference's sendMsgTestF rule
    (SVDPlusPlus.scala:178-188).  Returns pairs' columns + ``pred``."""
    usr = vertices.select(
        F.col("id").alias("src"), F.col("y").alias("_u2"),
        F.col("bias").alias("_ub"),
    )
    itm = vertices.select(
        F.col("id").alias("dst"), F.col("p").alias("_iq"),
        F.col("bias").alias("_ib"),
    )
    joined = pairs.join(usr, on="src").join(itm, on="dst")
    pred = F.least(
        F.greatest(
            F.lit(u) + F.col("_ub") + F.col("_ib")
            + _dot(F.col("_iq"), F.col("_u2")),
            F.lit(min_val),
        ),
        F.lit(max_val),
    )
    return joined.select(*pairs.columns, pred.alias("pred"))
