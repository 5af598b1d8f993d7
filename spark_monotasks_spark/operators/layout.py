"""Data-layout optimization: Z-order (Morton) keys for multi-column
data skipping.

Sorting / range-partitioning a 100 TB table by ONE column gives perfect
min/max pruning on that column and none on any other; interleaving the
bits of two (or more) quantized columns into a single Morton key makes
files cluster in BOTH dimensions, so parquet zone maps prune on either
predicate (the OPTIMIZE ZORDER pattern).  Pure bit-arithmetic inside
whole-stage codegen — the key costs one projection, and the layout is
realized with the ordinary repartitionByRange + sortWithinPartitions
write path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints:
    result bit 2i = bit i of ``a``, bit 2i+1 = bit i of ``b``.  Inputs
    must already be quantized into [0, 2^bits) — see
    :func:`quantize`."""
    ca = (F.col(a) if isinstance(a, str) else a).cast("long")
    cb = (F.col(b) if isinstance(b, str) else b).cast("long")
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftrightunsigned(ca, i) % 2, 2 * i)
            + F.shiftleft(F.shiftrightunsigned(cb, i) % 2, 2 * i + 1)
        )
    return key


def quantize(col: Column | str, lo: float, hi: float, bits: int = 16) -> Column:
    """Map a numeric column into [0, 2^bits) by linear scaling with
    clamping — the per-column preparation for :func:`zorder_key`."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    n = (1 << bits) - 1
    scaled = ((c - lo) / (hi - lo) * n).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n), scaled))


def zorder_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The SAME interleave as :func:`zorder_key`, rendered as portable
    SQL arithmetic — lets an external engine (the catalog oracle)
    recompute keys byte-for-byte."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a_expr}) // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({b_expr}) // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


def compaction_bins(
    files: DataFrame,
    size_col: str = "bytes",
    order_col: str = "path",
    target_bytes: int = 128 * 1024 * 1024,
    bin_col: str = "bin",
) -> DataFrame:
    """Small-file compaction plan (the OPTIMIZE/bin-packing step a
    table maintenance job runs): walk the file manifest in
    ``order_col`` order and cut contiguous bins of ~``target_bytes``
    — file i goes to bin ``(cum_before_i) div target``, so every bin
    except the last holds at least ``target_bytes`` and overflows by
    less than one file.  Contiguity in the chosen order preserves any
    clustering the manifest order encodes (e.g. a Z-order write).

    The global running size is the distributed two-pass prefix sum
    (operators.indexing.running_total) — the manifest may be billions
    of rows at warehouse scale, never a one-task window.  Pure integer
    arithmetic (``div``), so any engine replays the plan exactly.
    Output: every input column plus ``cum_bytes`` and ``bin_col``."""
    from spark_monotasks_spark.operators.indexing import running_total

    run = running_total(
        files, size_col, [F.col(order_col)], total_col="cum_bytes"
    )
    return run.withColumn(
        bin_col,
        F.expr(f"(cum_bytes - {size_col}) div {int(target_bytes)}").cast(
            "long"
        ),
    )
