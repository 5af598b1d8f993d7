"""Property tests for the r9 serving/curation operators: IVF-PQ ANN
and span-level decontamination are replayed by independent pure-Python
oracles on planted adversarial shapes (the DuckDB parity sweep in
test_oracle_parity.py covers the catalog entries; these pin OPERATOR
semantics on inputs the table data may not exercise — sub-threshold
overlaps, multi-span docs, planted exact query matches)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_monotasks_spark.pipeline import dedup, similarity


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------

def _py_ivfpq(vecs, qv, k=5, dim=8, n_lists=4, cell_seed=5, n_sub=2,
              n_cent=4, book_seed=7, n_probe=2):
    """Independent serial replay of assign -> residual -> encode -> ADC
    rank, sharing only the deterministic constant generators."""
    cents = similarity.ivf_literal_centroids(dim, n_lists, cell_seed)
    cmap = {cid: c for cid, c in cents}
    probe = similarity.ivfpq_probe_cells(qv, cents, n_probe)
    book = similarity.pq_codebook(dim, n_sub, n_cent, book_seed)
    sub = dim // n_sub
    tables = {}
    for cid in probe:
        qres = [q - x for q, x in zip(qv, cmap[cid])]
        tables[cid] = similarity.pq_adc_table(qres, dim, n_sub, n_cent, book_seed)

    def sq(a, b):
        t = 0.0
        for x, y in zip(a, b):
            d = x - y
            t = t + d * d
        return t

    out = []
    for vid, v in vecs:
        dists = [(sq(v, cmap[c]), c) for c, _ in cents]
        cell = min(dists)[1]
        if cell not in probe:
            continue
        res = [x - y for x, y in zip(v, cmap[cell])]
        codes, est = [], 0.0
        for m in range(n_sub):
            rsub = res[m * sub:(m + 1) * sub]
            code = min((sq(rsub, cent), c) for c, cent in enumerate(book[m]))[1]
            codes.append(code)
            est = est + tables[cell][m][code]
        out.append((est, vid, cell, codes))
    out.sort(key=lambda t: (t[0], t[1]))
    return out[:k]


def test_ivfpq_matches_pure_python_replay(spark):
    """Distributed IVF-PQ == the serial algorithm on a deterministic
    dyadic corpus (multiples of 1/4 spanning all cells), including the
    probe filter, tie-broken codes, and the final (est, id) order."""
    vecs = []
    for i in range(40):
        s = (i * 2654435761) % 2**32
        v = []
        for j in range(8):
            s = (s * 1103515245 + 12345) % 2**31
            v.append(((s >> 8) % 9 - 4) / 4.0)
        vecs.append((i, v))
    qv = similarity.pq_query_vector(8, seed=99)

    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<float>"
    )
    got = similarity.ivfpq_topk(
        df, qv, k=5, dim=8, n_lists=4, cell_seed=5, n_sub=2, n_cent=4,
        book_seed=7, n_probe=2,
    ).collect()
    want = _py_ivfpq(vecs, qv)
    assert len(got) == len(want)
    for g, (est, vid, cell, codes) in zip(got, want):
        assert g["vec_id"] == vid
        assert g["cell"] == cell
        assert [g["code_0"], g["code_1"]] == codes
        assert abs(g["est_dist"] - round(est, 6)) < 1e-12


def test_ivfpq_planted_query_duplicate_ranks_first(spark):
    """A corpus vector EQUAL to the query has residual distance equal
    to its own quantization error — it must beat every other vector
    and its est_dist must equal the query's self-ADC score."""
    qv = similarity.pq_query_vector(8, seed=99)
    rows = [(0, qv)] + [
        (i, [((i * 7 + j) % 9 - 4) / 4.0 for j in range(8)]) for i in range(1, 30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = similarity.ivfpq_topk(
        df, qv, k=3, dim=8, n_lists=4, cell_seed=5, n_sub=2, n_cent=4,
        book_seed=7, n_probe=2,
    ).collect()
    assert got[0]["vec_id"] == 0
    # self-distance = quantization error of the query's own residual
    want = _py_ivfpq([(0, qv)], qv, k=1)
    assert abs(got[0]["est_dist"] - round(want[0][0], 6)) < 1e-12


def test_ivfpq_probe_cells_deterministic_ties():
    """Probe ranking breaks exact distance ties by cell id (ascending),
    and always returns exactly n_probe cells."""
    cents = [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [-1.0, 0.0])]
    probe = similarity.ivfpq_probe_cells([0.0, 0.0], cents, 2)
    assert probe == [0, 1]  # all tie at distance 1.0 -> smallest ids


# ---------------------------------------------------------------------------
# span decontamination
# ---------------------------------------------------------------------------

def _py_scrub(corpus, refs, k=5):
    """Serial replay: reference gram set -> per-doc marked positions ->
    gaps-and-islands merge -> cut."""
    ref_grams = set()
    for r in refs:
        t = r.split(" ")
        for p in range(len(t) - k + 1):
            ref_grams.add(" ".join(t[p:p + k]))
    out = {}
    for did, text in corpus:
        t = text.split(" ")
        marked = [
            p for p in range(len(t) - k + 1)
            if " ".join(t[p:p + k]) in ref_grams
        ]
        spans = []
        for p in marked:
            if spans and p <= spans[-1][1] - (k - 1) + k:
                spans[-1] = (spans[-1][0], p + k - 1)
            else:
                spans.append((p, p + k - 1))
        drop = set()
        for s, e in spans:
            drop |= set(range(s, e + 1))
        clean = " ".join(tok for i, tok in enumerate(t) if i not in drop)
        out[did] = (len(spans), len(drop), clean)
    return out


def test_scrub_contaminated_spans_matches_replay(spark):
    """Planted shapes: full containment, mid-doc quote, TWO disjoint
    quotes, a 4-token overlap (below k=5 -> untouched), and a clean
    doc.  Distributed cut == serial replay on every doc."""
    ref = "the quick brown fox jumps over the lazy dog tonight"
    corpus = [
        (1, "prefix words the quick brown fox jumps over more text"),
        (2, ref),  # full containment
        (3, "aa bb the quick brown fox jumps cc dd over the lazy dog tonight zz"),
        (4, "only the quick brown fox here nothing else shared today"),  # 4-token
        (5, "completely unrelated clean document with its own words"),
    ]
    refs_df = spark.createDataFrame([(100, ref)], "doc_id long, text string")
    corp_df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_spans"], r["tokens_removed"], r["text_clean"])
        for r in dedup.scrub_contaminated_spans(
            corp_df, refs_df, min_tokens=5
        ).collect()
    }
    want = _py_scrub(corpus, [ref], k=5)
    assert got == want
    # the sub-threshold doc and the clean doc pass through VERBATIM
    assert got[4] == (0, 0, corpus[3][1])
    assert got[5] == (0, 0, corpus[4][1])
    # full containment empties the doc
    assert got[2][2] == ""
    # two disjoint quotes -> two spans
    assert got[3][0] == 2


def test_contaminated_span_positions_threshold():
    """Exactly k shared tokens yield one span [p, p+k-1]; k-1 yield
    none — checked in _py_scrub's own terms to pin the test oracle."""
    ref = ["a b c d e f"]
    hit = _py_scrub([(1, "x a b c d e y")], ref, k=5)
    assert hit[1][0] == 1 and hit[1][1] == 5
    miss = _py_scrub([(1, "x a b c d y")], ref, k=5)
    assert miss[1] == (0, 0, "x a b c d y")


# ---------------------------------------------------------------------------
# mixture caps
# ---------------------------------------------------------------------------

def test_mixture_epoch_caps_math(spark):
    """A tiny source gets capped at 4 epochs; a huge one is budget-
    bound; permille epochs are exact integer division."""
    rows = [(i, "w " * 9 + "w", "big", 10) for i in range(98)] + [
        (900, "w w w w w w w w w w", "tiny", 10),
        (901, "w w w w w w w w w w", "tiny", 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    df.createOrReplaceTempView("_mix_docs")
    per = df.groupBy("source").agg(
        F.sum(F.size(F.split(F.col("text"), " "))).alias("tokens")
    )
    tot = per.agg(F.sum("tokens").alias("_t"), F.count(F.lit(1)).alias("_k"))
    j = per.join(F.broadcast(tot)).select(
        "source", "tokens",
        F.expr("_t DIV 2 DIV _k").alias("want"),
        F.least(F.expr("_t DIV 2 DIV _k"), F.col("tokens") * 4).alias("achieved"),
    ).collect()
    m = {r["source"]: r for r in j}
    # total = 1000 tokens; budget 500; per-source want 250
    assert m["big"]["want"] == 250 and m["tiny"]["want"] == 250
    assert m["tiny"]["achieved"] == 80      # 20 tokens * 4 epochs
    assert m["big"]["achieved"] == 250      # budget-bound


# ---------------------------------------------------------------------------
# audio band fingerprint
# ---------------------------------------------------------------------------

def test_audio_band_fingerprint_planted(spark):
    """Silence -> all-zero energies -> fp 0 (no strict increase); a
    clip shorter than n_bands yields NULLs; a planted loud back half
    sets exactly the bit at the quiet->loud boundary."""
    import pandas as pd
    from spark_monotasks_spark.pipeline.multimodal import (
        audio_band_fingerprint, encode_wav,
    )
    import struct

    def pcm_wav(samples):
        data = struct.pack("<%dh" % len(samples), *samples)
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        payload = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
                   + b"data" + struct.pack("<I", len(data)) + data)
        return b"RIFF" + struct.pack("<I", len(payload)) + payload

    rows = [
        (1, encode_wav(8000, 64, pattern="zero")),       # silence
        (2, pcm_wav([0] * 4)),                           # shorter than 8 bands
        (3, pcm_wav([0] * 32 + [100] * 32)),             # loud back half
    ]
    df = spark.createDataFrame(
        pd.DataFrame({"media_id": [r[0] for r in rows],
                      "blob": [r[1] for r in rows]})
    )
    got = {r["media_id"]: r for r in audio_band_fingerprint(df).collect()}
    assert got[1]["fp"] == 0 and got[1]["e0"] == 0
    assert got[2]["fp"] is None and got[2]["n_samples"] is None
    # 64 samples / 8 bands = w 8; bands 0-3 quiet, 4-7 loud (equal) ->
    # only the band-4 > band-3 transition sets a bit: 1 << 3
    assert got[3]["fp"] == 1 << 3
    assert got[3]["e0"] == 0 and got[3]["n_samples"] == 64


# --- filtered vector search (r7) -------------------------------------------

def test_ann_filtered_topk_prefilter_semantics(spark):
    """Every hit satisfies the predicate, k is filled from QUALIFIED
    candidates (pre-filter), and the result is NOT merely the
    unfiltered top-k with losers dropped (post-filter) — the exact
    failure mode metadata-filtered vector search exists to avoid."""
    from tests.conftest import SF_TEST_DIR

    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from spark_monotasks_spark.tables import load_tables

    hits = QUERY_REGISTRY["ann_filtered_topk"](spark, SF_TEST_DIR).collect()
    assert len(hits) == 20
    labels = {
        r.vec_id: r.label
        for r in load_tables(spark, SF_TEST_DIR)["embeddings"]
        .select("vec_id", "label").collect()
    }
    assert all(labels[r.vec_id] == 1 for r in hits)
    unfiltered = QUERY_REGISTRY["ann_ivf_topk"](spark, SF_TEST_DIR).collect()
    post = [r.vec_id for r in unfiltered if labels[r.vec_id] == 1]
    # the unfiltered top-20 holds fewer than 20 label-1 vectors, so a
    # post-filter would under-fill; pre-filter returns a full page
    assert len(post) < 20


def test_bitext_margin_planted(spark):
    """Planted margin semantics: a corpus with ONE strong match for q0
    (margin well over threshold) and a dense near-tie region for q1
    (margin ~1) must accept q0's pair and reject q1's — the criterion
    that distinguishes a translation pair from a generically dense
    embedding neighborhood."""
    import math

    from spark_monotasks_spark.queries.serving_extras import (
        _bitext_queries,
        bitext_margin_mine,
    )
    from spark_monotasks_spark.tables import load_tables

    qs = dict(_bitext_queries())
    q0, q1 = qs[0], qs[1]

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v]

    # corpus: vec 10 == q0's direction (cos 1.0); vecs 20-23 are four
    # small perturbations of q1's direction (near-identical sims);
    # everything else orthogonal-ish noise for rank-4 padding.
    rows = [(10, unit(q0))]
    for j, eps in enumerate((0.0, 1e-3, 2e-3, 3e-3)):
        v = [x + (eps if i == 0 else 0.0) for i, x in enumerate(q1)]
        rows.append((20 + j, unit(v)))
    # fillers: q0's direction blended with a distinct basis vector, so
    # q0's ranks 2-4 sit at a moderate POSITIVE sim (the ratio margin
    # presumes a positively-correlated neighborhood, as real encoder
    # embeddings have) while staying far below the true pair's 1.0.
    dim = len(q0)
    q0u = unit(q0)
    for j in range(4):
        v = list(q0u)
        v[(7 * (j + 1)) % dim] += 2.0
        rows.append((30 + j, unit(v)))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )

    import tempfile, os, shutil
    d = tempfile.mkdtemp()
    try:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r.qid: r for r in bitext_margin_mine(spark, d).collect()}
        assert out[0].best_vec_id == 10 and out[0].accepted
        assert out[0].margin > 1.3
        assert 20 <= out[1].best_vec_id <= 23 and not out[1].accepted
        assert out[1].margin < 1.02
    finally:
        shutil.rmtree(d, ignore_errors=True)
