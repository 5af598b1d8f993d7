"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design notes (the whole point of these shapes):

- **exact**: one hash-groupBy on a fingerprint — shuffle is O(|docs|)
  with tiny rows, the canonical first pass at 100 TB.
- **MinHash+LSH**: per-doc signature in ONE linear pass (element-wise
  min over shingle hash arrays — no |shingles|×|hashes| row blow-up),
  then banding so the candidate-pair join is bucket-local.  All-pairs
  O(n²) never happens; the only quadratic term is within-bucket, which
  banding keeps tiny.
- **SimHash**: 64-bit signature via per-bit majority vote, again one
  linear pass + one groupBy; near-dup candidates via band equality.
- **n-gram Jaccard**: exact verification on candidate pairs only.

Everything is built-in F.* higher-order functions — no Python UDFs.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


from spark_monotasks_spark.partitioning import spread_to_cluster as _spread


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------

def exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group identical texts: fingerprint → (n_copies, keep_id, dup_ids).

    ``keep_id`` = min id (deterministic canonical survivor); ``dup_ids``
    = every member id, sorted (ids only — the payload never shuffles).
    """
    fp = F.md5(F.col(text_col).cast("binary"))
    return (
        df.select(F.col(id_col), fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keep_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
    )


def drop_exact_duplicates(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep exactly one row (min id) per distinct text — the scalable
    survivor-selection pattern: min-id per fingerprint then semi join,
    never a full-row shuffle of the payload."""
    keep = exact_duplicates(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# ---------------------------------------------------------------------------
# shingles + MinHash + LSH
# ---------------------------------------------------------------------------

def shingles(col: Column | str, k: int = 3, sep: str = " ") -> Column:
    """Token k-shingles as an array<string> (distinct).  For k=1 this is
    the token set.  ``sep`` is treated as a literal separator (escaped
    before the regex-based split, so '.' or '|' work as given)."""
    toks = F.split(col, re.escape(sep))
    if k == 1:
        return F.array_distinct(toks)
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.array_distinct(
        F.when(
            n >= k,
            F.transform(idx, lambda i: F.concat_ws(sep, F.slice(toks, i + 1, k))),
        ).otherwise(F.array(F.concat_ws(sep, toks)))
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    keep_shingles: bool = False,
) -> DataFrame:
    """Per-doc MinHash signature as (id, sig array<bigint>[, sh]).

    Shape chosen deliberately: explode (shingle, hash-index) pairs to
    rows, take ``min(xxhash64(shingle, i))`` per (id, i), re-assemble
    the index-ordered array.  Versus a wide 64-min-column aggregate this
    trades ~2.5× the shuffled bytes (still only ~1.3 KB/doc — partial
    map-side combine keeps both shuffles at |docs|×num_hashes rows of
    20 B, noise next to scanning the corpus text) for a tiny expression
    tree: the wide form pays seconds of Catalyst/Janino compilation for
    its 64-buffer codegen and updates 64 aggregation buffers per row —
    measured ~2× slower end-to-end, cold and warm.

    Steady-state cost (sf0.1, local[32]): ~2.7 s warm vs ~8.5 s cold —
    the bench-visible number is dominated by one-time codegen compile +
    first table load, amortized away on a long-lived cluster.
    """
    df = _spread(df)
    sh = shingles(F.col(text_col), k=shingle_k)
    ex = df.select(F.col(id_col).alias("id"), F.explode(sh).alias("s"))
    pairs = ex.select(
        "id", F.posexplode(F.array_repeat("s", num_hashes)).alias("i", "si")
    ).select("id", "i", F.xxhash64("si", F.col("i")).alias("h"))
    mins = pairs.groupBy("id", "i").agg(F.min("h").alias("m"))
    sig = F.transform(
        F.array_sort(F.collect_list(F.struct("i", "m"))), lambda x: x["m"]
    ).alias("sig")
    grouped = mins.groupBy("id").agg(sig)
    if keep_shingles:
        shs = df.select(F.col(id_col).alias("id"), sh.alias("sh"))
        return grouped.join(shs, on="id")
    return grouped


def minhash_bands(sig: Column, num_bands: int = 16, rows_per_band: int = 4) -> Column:
    """Split a signature into LSH bands; each band → one 64-bit bucket
    hash.  Returns array<struct<band:int, bucket:bigint>>."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_bands - 1)),
        lambda b: F.struct(
            b.cast("int").alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.slice(sig, b * rows_per_band + 1, rows_per_band),
                        lambda v: v.cast("string"),
                    ),
                )
            ).alias("bucket"),
        ),
    )


def minhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """MinHash+LSH near-duplicate pairs with exact-Jaccard verification.

    Plan shape: linear signature pass → explode bands (|docs|×bands
    rows, SMALL — ids + two longs only, never the shingle arrays) →
    bucket self-join (shuffle on bucket) → distinct candidate id pairs →
    join the shingle sets back in (two hash joins on id) → exact Jaccard
    → filter.  Keeping the quadratic join payload to bare ids is the
    scale lever: at 100 TB the banding shuffle is |docs|×bands×24 bytes
    instead of carrying every document's shingle set bands× times.
    Returns (id_a, id_b, jaccard) with id_a < id_b.
    """
    if num_bands < 1 or num_hashes % num_bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"num_bands ({num_bands}); otherwise bands are empty or hashes "
            "are silently discarded"
        )
    rows_per_band = num_hashes // num_bands
    base = minhash_signatures(df, id_col, text_col, shingle_k, num_hashes).select(
        "id",
        minhash_bands(F.col("sig"), num_bands, rows_per_band).alias("bands"),
    )
    banded = base.select("id", F.explode("bands").alias("bb")).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # shingle sets come straight from the source — one narrow pass, no
    # collect_set aggregation, fetched only for verification
    shs = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k=shingle_k).alias("sh")
    )
    pairs = cand.join(
        shs.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")), on="id_a"
    ).join(shs.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")), on="id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.select("id_a", "id_b", F.round(jac, 4).alias("jaccard"))
        .filter(F.col("jaccard") >= jaccard_threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """Per-doc 64-bit SimHash as (id, sig bigint): per-bit majority vote
    of xxhash64(token) bit patterns (frequency-weighted — repeated
    tokens vote repeatedly).

    Same scale shape as minhash_signatures (see its docstring for the
    pair-rows vs wide-columns tradeoff): explode (token-hash, bit-index)
    pairs, sum the ±1 votes per (id, bit) with map-side combine, then
    bit-pack the 64 majority votes back into one bigint per doc."""
    df = _spread(df)
    ex = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    ).select("id", F.xxhash64("tok").alias("h"))
    pairs = ex.select(
        "id", F.posexplode(F.array_repeat("h", bits)).alias("i", "hi")
    ).select(
        "id",
        "i",
        # pyspark's F.shiftright only takes literal shift amounts; the
        # SQL function accepts a column
        F.when(F.expr("shiftright(hi, i)").bitwiseAND(1) == 1, 1)
        .otherwise(-1)
        .alias("vote"),
    )
    votes = pairs.groupBy("id", "i").agg(F.sum("vote").alias("v"))
    # pack: bit i set iff majority positive.  The bit values are
    # disjoint powers of two, so SUM == bitwise OR (no carries) — incl.
    # bit 63, where shiftleft(1L, 63) is the bigint sign bit.
    bitval = F.when(F.col("v") > 0, F.expr("shiftleft(1L, i)")).otherwise(
        F.lit(0).cast("bigint")
    )
    return (
        votes.select("id", bitval.alias("bitval"))
        .groupBy("id")
        .agg(F.sum("bitval").alias("sig"))
    )


def simhash_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit signature into
    ``num_bands`` 16-bit chunks (pigeonhole: hamming ≤ bands-1 ⇒ some
    band equal), bucket-join, verify hamming distance exactly.
    Returns (id_a, id_b, hamming)."""
    if max_hamming > num_bands - 1:
        raise ValueError(
            f"max_hamming ({max_hamming}) > num_bands-1 ({num_bands - 1}) "
            "breaks the pigeonhole guarantee: pairs whose differing bits "
            "touch every band would be silently missed.  Raise num_bands."
        )
    if num_bands < 2 or 64 % num_bands != 0:
        raise ValueError(
            f"num_bands ({num_bands}) must divide 64 and be >= 2 (bands of "
            "64/num_bands bits; num_bands=1 would need an unrepresentable "
            "64-bit mask, non-divisors silently drop the top bits)"
        )
    band_width = 64 // num_bands
    base = simhash_signatures(df, id_col, text_col)
    banded = base.select(
        "id",
        "sig",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("sig"), b * band_width).bitwiseAND(
                        (1 << band_width) - 1
                    )
                    for b in range(num_bands)
                ]
            )
        ).alias("band", "chunk"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            on=(F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, for candidate verification or small sets)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = None,
    n: int = 3,
    threshold: float = 0.3,
) -> DataFrame:
    """Exact n-gram Jaccard over pairs within a blocking key.

    ``block_col`` bounds the quadratic term (all-pairs only within a
    block — at scale, pass a coarse cluster/bucket id, e.g. an LSH
    band or language+length bucket).  With block_col=None a single
    global block is used (only sane for small/test inputs).
    """
    sh = shingles(F.col(text_col), k=n)
    blk = F.col(block_col) if block_col else F.lit(0)
    base = df.select(F.col(id_col).alias("id"), blk.alias("blk"), sh.alias("sh"))
    a = base.alias("a")
    b = base.alias("b")
    pairs = a.join(
        b, on=(F.col("a.blk") == F.col("b.blk")) & (F.col("a.id") < F.col("b.id"))
    )
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    jac = inter / F.greatest(union, F.lit(1))
    return (
        pairs.select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(jac, 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# near-dup clustering: pairs -> components -> canonical survivor
# ---------------------------------------------------------------------------

def near_duplicate_clusters(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Cluster near-duplicates: MinHash pairs -> connected components.

    Pairwise near-dup detection alone under-deduplicates chains (A~B,
    B~C but A!~C must still collapse to ONE kept doc — the standard
    transitive-closure step in pretraining dedup, cf. the reference's
    lib/ConnectedComponents.scala used here via graph.algorithms).

    Scale shape: the label-propagation join runs ONLY on the pair graph
    (docs that matched at least one near-dup — orders of magnitude
    smaller than the corpus); the full corpus is touched by exactly one
    extra left join at the end to give singletons their own cluster id.
    Returns (id, cluster) where cluster = min doc id in the component.
    """
    from spark_monotasks_spark.graph.algorithms import connected_components

    pairs = minhash_near_duplicates(
        df, id_col, text_col, shingle_k, num_hashes, num_bands, jaccard_threshold
    )
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = connected_components(edges)
    return (
        df.select(F.col(id_col).alias("id"))
        .join(comps, on="id", how="left")
        .select("id", F.coalesce("component", F.col("id")).alias("cluster"))
    )


def drop_near_duplicates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    num_hashes: int = 64,
    num_bands: int = 16,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Keep one representative (min id) per near-duplicate cluster.

    Survivor selection shuffles only (id, cluster) longs; the document
    payload re-enters via a final left-semi join on the id — the same
    payload-never-shuffles discipline as drop_exact_duplicates.
    """
    clusters = near_duplicate_clusters(
        df, id_col, text_col, shingle_k, num_hashes, num_bands, jaccard_threshold
    )
    keep = clusters.groupBy("cluster").agg(F.min("id").alias(id_col))
    return df.join(keep.select(id_col), on=id_col, how="left_semi")
