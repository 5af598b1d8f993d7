"""Spatial primitives: grid-bucketed radius / nearest-neighbor joins
(beyond-reference, marked).

The reference has no spatial operators; these fill the gap the
Spark-first way — a fixed-grid spatial index expressed as ordinary
equi-joins so Catalyst plans hash joins, never a cross product:

* each right-side point is keyed by its grid cell ``(floor(x/c),
  floor(y/c))``;
* each left-side point probes its own cell plus the 8 neighbors —
  with ``cell_size >= radius`` every point within ``radius`` is
  guaranteed to lie in that 3x3 neighborhood, so the candidate join is
  LOSSLESS (proved by the brute-force oracle of the catalog entry);
* the exact distance filter + per-left top-k ranking run on the
  candidates only.

Scale shape: ONE shuffle of each side on the cell key (the left side
x9 via an in-row explode, still narrow), candidate volume proportional
to local density rather than |L|x|R|, and the top-k window partitioned
by the left key — never global.  At 100 TB this is the standard
billion-x-billion spatial-join layout; skewed cells (urban hotspots)
can further salt the cell key.

Exactness: squared Euclidean distance uses only IEEE subtract /
multiply / add — each correctly rounded, evaluated in the same literal
order as the DuckDB oracle, hence bit-identical cross-engine (the same
portability argument as the repo's dyadic-literal entries; no trig, no
libm).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def grid_radius_knn(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    x_col: str = "x",
    y_col: str = "y",
    radius: float = 25.0,
    k: int | None = None,
) -> DataFrame:
    """All right-side neighbors within ``radius`` of each left point
    (optionally the nearest ``k``), via the 3x3 grid-cell candidate
    join described in the module docstring.

    Both inputs need columns ``(id, x, y)`` (names configurable).
    Returns (left_id, right_id, dist2) — squared distance, exact.
    Ties on dist2 rank by ``right_id`` so top-k is deterministic.
    """
    cell = float(radius)  # cell >= radius ⇒ 3x3 neighborhood is lossless
    r2 = radius * radius

    r_keyed = right.select(
        F.col(right_id),
        F.col(x_col).alias("_rx"),
        F.col(y_col).alias("_ry"),
        F.floor(F.col(x_col) / cell).cast("long").alias("_cx"),
        F.floor(F.col(y_col) / cell).cast("long").alias("_cy"),
    )
    offsets = F.array(*[F.lit(d) for d in (-1, 0, 1)])
    l_probed = (
        left.select(
            F.col(left_id),
            F.col(x_col).alias("_lx"),
            F.col(y_col).alias("_ly"),
            F.floor(F.col(x_col) / cell).cast("long").alias("_lcx"),
            F.floor(F.col(y_col) / cell).cast("long").alias("_lcy"),
        )
        .withColumn("_dx", F.explode(offsets))
        .withColumn("_dy", F.explode(offsets))
        .select(
            left_id,
            "_lx",
            "_ly",
            (F.col("_lcx") + F.col("_dx")).alias("_cx"),
            (F.col("_lcy") + F.col("_dy")).alias("_cy"),
        )
    )
    ddx = F.col("_lx") - F.col("_rx")
    ddy = F.col("_ly") - F.col("_ry")
    cand = l_probed.join(r_keyed, on=["_cx", "_cy"]).withColumn(
        "dist2", ddx * ddx + ddy * ddy
    )
    within = cand.filter(F.col("dist2") <= F.lit(r2)).select(
        left_id, right_id, "dist2"
    )
    if k is None:
        return within
    w = Window.partitionBy(left_id).orderBy("dist2", right_id)
    return (
        within.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def hash_coords(
    id_col: Column | str,
    salt_x: str = "gx#",
    salt_y: str = "gy#",
) -> tuple[Column, Column]:
    """Deterministic synthetic (x, y) in [0, 1000) derived from an id —
    the documented projection the spatial catalog entries use (the
    TPC-H-ish testdata has no native coordinates).  md5 → 48-bit int →
    mod 10^6 → one IEEE division by 1000: every step bit-identical in
    DuckDB (``CAST('0x' || substr(md5(...), 1, 12) AS BIGINT) % 1000000
    / 1000.0``)."""
    ident = (F.col(id_col) if isinstance(id_col, str) else id_col).cast(
        "string"
    )

    def _axis(salt: str) -> Column:
        h = F.conv(
            F.substring(F.md5(F.concat(F.lit(salt), ident).cast("binary")), 1, 12),
            16,
            10,
        ).cast("long")
        return (h % F.lit(1000000)) / F.lit(1000.0)

    return _axis(salt_x), _axis(salt_y)
