"""Empirical scale-shape gate: the local stand-in for "would this plan
survive a 100× scale-up?".

For a sample of catalog queries spanning the runtime-dominant families,
run the SAME query end-to-end (noop sink — full compute, no collect) at
sf0.01 and sf0.1 (10× the data) and assert the wall-time ratio stays far
below quadratic.  A linear plan on 10× data with per-query fixed costs
(plan compile, stage launch) lands well under ratio ~6 at this scale; an
accidentally quadratic plan (unblocked self-join, all-pairs verify,
driver-side loop over groups) lands at 30-100× and fails loudly.  The
generous bounds make the test robust to timer noise while still being
impossible for an O(n²) regression to sneak under.

Known super-linear entries get explicitly wider bounds with their
expected exponents documented — see SCALE.md "Scaling shape of the
bench suite".  Runtime budget: well under 5 minutes (each measurement
is min-of-2 of sub-second-to-few-second queries).
"""

from __future__ import annotations

import time

import pytest

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"

#: (query, max wall-time ratio for 10x data, expected asymptote note)
#: linear-plan entries: scan+agg, groupBy dedup, window sessionize,
#: bounded-shuffle sketch, packing window, pure-projection quality rules
LINEAR = [
    ("scan_filter_project", 8.0, "O(n) scan+filter"),
    ("tpch_q1_pricing", 8.0, "O(n) scan + bounded-group agg"),
    ("dedup_exact_groups", 8.0, "O(n) fingerprint groupBy"),
    ("token_stats", 8.0, "O(tokens) projection"),
    ("quality_filter_rules", 8.0, "O(n) codegen projection"),
    ("pack_sequences", 8.0, "O(n) per-shard running-sum window"),
    ("events_sessionize", 8.0, "O(n) one shuffle on user_id"),
    ("cms_heavy_hitters", 8.0, "O(n) build collapsing to depth*width"),
    ("e2e_training_pipeline", 8.0, "O(n) filter->dedup->split"),
    # join families (r5): union-window as-of, bucketed range join, and
    # the two-stage salted skew agg are all one-to-few-shuffle linear
    # shapes — they must never degrade to an all-pairs comparison
    ("asof_join_events", 8.0, "O(n) union + per-key window"),
    ("range_join_sessions", 8.0, "O(n) bucketed equi-join"),
    ("salted_agg_skew", 8.0, "O(n) two-stage salted agg"),
    # web-curation ops (r5): a pure regex projection and the broadcast
    # domain-blocklist semi/anti — both must stay one-pass linear
    ("clean_text_normalize", 8.0, "O(n) codegen regex projection"),
    ("url_blocklist_filter", 8.0, "O(urls) explode + broadcast semi/anti"),
    # r5 third/fourth batch: broadcast-side warehouse maintenance, the
    # one-scan profiler, codes-only PQ ranking, vocab-sized BPE folds,
    # and the single-Exchange outlier screen — all linear by design
    ("scd2_customer_dim", 8.0, "O(n) broadcast change-detect + anti"),
    ("data_profile_constraints", 8.0, "O(n) one-scan agg (Expand x cols)"),
    ("ann_pq_topk", 8.0, "O(n) encode scan + TakeOrdered"),
    ("bpe_encode_tokens", 8.0, "O(tokens) explode + vocab-sized folds"),
    ("iqr_outlier_orders", 8.0, "O(n) single-Exchange rank+fence"),
    # r5 sixth batch: bigram LM scoring is explode + count joins over
    # the gram stream; the ORC roundtrip is a linear write + pruned read
    ("bigram_logprob_score", 8.0, "O(grams) explode + count joins"),
    ("orc_partitioned_roundtrip", 8.0, "O(n) columnar write + pruned scan"),
    # r6 late batch: the ExactSubstr gram cover is O(tokens) — explode,
    # one rank shuffle of (fp,id,pos) keys, islands over marked rows
    # only (marked <= grams, so duplication growth cannot exceed O(n));
    # the split is a single codegen projection
    ("exact_substring_spans", 8.0, "O(tokens) gram explode + rank"),
    ("exact_substring_spans_scale", 8.0, "O(tokens) gram explode + rank"),
    ("leakage_safe_split", 8.0, "O(n) md5-bucket projection"),
    # prefix filtering keys candidates on the globally-rarest shingles,
    # so bucket sizes stay bounded as the corpus grows (measured 3.2x
    # at 10x data); the budget cut is the two-pass prefix-sum shape
    ("jaccard_similarity_join", 8.0, "O(n) prefix-filtered candidates"),
    ("token_budget_select", 8.0, "O(n) two-pass distributed prefix sum"),
    ("domain_cap_select", 8.0, "O(n) per-domain partitioned window"),
    ("ngram_novelty_score", 8.0, "O(grams) distinct-set left join"),
    ("shuffle_skew_report", 8.0, "O(n) per-key count + bounded top-k"),
    ("compaction_bin_plan", 8.0, "O(n) two-pass prefix sum + int div"),
    ("encoding_quality_screen", 8.0, "O(n) codegen regex projection"),
    ("dup_downweight_docs", 8.0, "O(n) fingerprint groupBy + join-back"),
    ("corpus_data_card", 8.0, "O(n) fingerprint join-back + group agg"),
    ("chunk_reassembly_roundtrip", 8.0, "O(tokens) chunk + doc-id regroup"),
    # r7: rank-statistic AUC is one agg + the two-pass prefix sum; the
    # KS twin shares the shape; feature hashing is explode + one agg;
    # the spatial join's candidates scale with local density (uniform
    # here); pair co-occurrence is bounded-basket linear; the salted
    # join is one exploded-dim shuffle; the KMV sketches are
    # TakeOrdered heaps
    ("eval_auc_score", 8.0, "O(n) agg + two-pass prefix sum"),
    ("stat_ks_two_sample", 8.0, "O(n) agg + multi-col prefix sum"),
    ("feature_hash_encode", 8.0, "O(tokens) explode + one agg"),
    ("spatial_grid_knn", 8.0, "O(n) cell equi-join, density-bounded"),
    ("item_cooccurrence_pairs", 8.0, "O(baskets) bounded-basket pairs"),
    ("skew_salted_join", 8.0, "O(n) salted shuffle, dim x16"),
    ("kmv_distinct_setops", 8.0, "O(n) hash + TakeOrdered sketches"),
    # r7 second batch: all prefix-sum / bounded-broadcast shapes
    ("stat_spearman_corr", 8.0, "O(n) two prefix sums + rank join-backs"),
    ("exact_quantiles_prefix", 8.0, "O(n) prefix sum + bounded crossJoin"),
    ("quantile_normalize_scores", 8.0, "O(n) windows + bucketed range join"),
    ("bootstrap_mean_ci", 8.0, "O(32n) explode + one aggregate"),
    # r8: CUSUM's cumulative windows see one row per DAY (bounded
    # aggregate), so the whole query is the daily groupBy; the rolling
    # distinct expands each (user, day) into <=7 checked contributions;
    # EWMA/TWAP are one keyed window each; diversity is one gram
    # explode; Benford is a 9-group aggregate
    ("cusum_changepoint", 8.0, "O(n) daily agg + bounded-day windows"),
    ("sliding_distinct_users", 8.0, "O(n) dedup + <=7x bounded explode"),
    ("ewma_dyadic_smooth", 8.0, "O(n) one keyed window, 8 lags"),
    ("twap_event_value", 8.0, "O(n) one keyed window + grouped sum"),
    ("ngram_diversity_by_source", 8.0, "O(grams) explode + distinct agg"),
    ("benford_digit_audit", 8.0, "O(n) scan + 9-group agg"),
    ("rrf_fusion_topk", 8.0, "O(n) two TakeOrdered scans + bounded fusion"),
    # r8 second batch: debounce/rate-limit are one-shuffle rank filters;
    # the transition matrix is one keyed window collapsing to |types|^2;
    # both search entries prune postings to the query terms before any
    # shuffle; k-center is k bounded scans with 1-row broadcasts
    ("event_debounce", 8.0, "O(n) one (key,window) rank shuffle"),
    ("event_rate_limit", 8.0, "O(n) one (key,window) rank shuffle"),
    ("event_transition_matrix", 8.0, "O(n) keyed window + bounded matrix"),
    ("conjunctive_search", 8.0, "O(tokens) pruned posting intersection"),
    ("phrase_search_positional", 8.0, "O(postings) adjacency equi-join"),
    ("kcenter_coreset", 8.0, "O(k*n) chained scans, 1-row broadcasts"),
    # r8 third batch: MASE runs on the bounded daily aggregate; the
    # keyword top-k shuffles (doc, term) postings only; the bounded
    # funnel's stage relations shrink monotonically from one scan
    ("seasonal_naive_mase", 8.0, "O(n) daily agg + bounded lag window"),
    ("doc_keywords_topk", 8.0, "O(tokens) posting aggs + per-doc rank"),
    ("funnel_time_bound", 8.0, "O(n) conditional aggs + keyed joins"),
    # r8 fourth batch: the skyline runs on the two-pass running_max
    # (one range exchange); MAD is two rank passes on one group-key
    # exchange; linterp is the resample_ffill grid shape
    ("pareto_docs_frontier", 8.0, "O(n) range exchange + prefix max"),
    ("mad_outlier_orders", 8.0, "O(n) one keyed exchange, two ranks"),
    ("timeseries_linterp", 8.0, "O(keys x buckets) grid + key windows"),
    # r8 fifth batch: the doubling closure is O(n*depth) pairs over
    # log-depth joins; the FK audit is two broadcast left joins; lift
    # pairs are top-k-blocked (<= C(50,2) per doc)
    ("hierarchy_subtree_rollup", 8.0, "O(n*depth) doubling closure"),
    ("fk_integrity_audit", 8.0, "O(n) two key-projected left joins"),
    ("token_lift_pairs", 8.0, "O(docs*k^2) top-k-blocked pair join"),
    # r9: IVF-PQ is one encode scan + probe filter + TakeOrdered (and
    # the recall eval adds one more full-scan TakeOrdered); the sweep
    # line runs the two-pass prefix sum over distinct timestamps; the
    # planner stats ship (key,count) pairs only; kappa/mixture are one
    # aggregate each; winsorize is one bounded-key rank exchange; span
    # scrub is the ExactSubstr gram-explode shape with a semi-join
    # probe against the vocabulary-bounded reference gram set
    ("ann_ivfpq_topk", 8.0, "O(n) encode scan + probe + TakeOrdered"),
    ("ann_recall_eval", 8.0, "O(n) two scans + bounded join"),
    ("session_concurrency_peak", 8.0, "O(n) sessionize + two-pass prefix sum"),
    ("join_size_stats", 8.0, "O(n) key-projected degree joins"),
    ("cohens_kappa_labelers", 8.0, "O(n) one boolean aggregate"),
    ("winsorize_totalprice", 8.0, "O(n) bounded-key rank exchange"),
    ("contamination_span_scrub", 8.0, "O(tokens) gram explode + semi probe"),
    ("mixture_epoch_caps", 8.0, "O(n) one groupBy(source)"),
    ("skipgram_pair_counts", 8.0, "O(2*tokens) map-side pairs + one agg"),
    ("audio_band_fingerprint", 8.0, "O(samples) partition-local decode"),
    ("ann_batch_queries", 8.0, "O(Q*n) one scan + WindowGroupLimit"),
    ("embedding_int8_quantize", 8.0, "O(dims*n) explode, 2 linear aggs"),
    ("atomic_multi_table_snapshot", 8.0, "O(n) two agg writes + 4 reads"),
    ("zorder_box_scan", 8.0, "O(n) zorder write + pruned box read"),
    ("snapshot_incremental_read", 8.0, "O(n) two agg writes + delta read"),
    ("weak_label_vote", 8.0, "O(n) one conditional aggregate"),
    ("langid_confusion_eval", 8.0, "O(n) scorer + bounded groupBy"),
    ("event_value_percentiles", 8.0, "O(n) bounded-key rank exchange"),
    ("video_content_neardup", 8.0, "O(videos) partition-local decode"),
    ("audio_content_neardup", 8.0, "O(clips) partition-local decode"),
    # r8: the Zipf-skew pair must stay linear in the fact side — the
    # AQE split and the x16 salt both bound the hot partition's task
    # size, so 10x data is 10x work spread over more tasks, never a
    # quadratic blowup or a single 10x-longer straggler
    ("skew_zipf_join_aqe", 8.0, "O(n) skewed shuffle, AQE-split"),
    ("skew_zipf_join_salted", 8.0, "O(n) salted shuffle, dim x16"),
    # DSIR: one gram explode + one bucket groupBy (<=4096 buckets);
    # the lambda table broadcasts back, the rank runs on the doc-
    # bounded weight relation
    ("dsir_importance_select", 8.0, "O(grams) explode + bounded buckets"),
]

#: super-linear entries: bounded above by documented exponents, still
#: far below quadratic.  minhash: candidate pairs grow with within-
#: bucket collisions (~n^1.2 on this corpus); contamination: 5-gram
#: join output grows with n-gram overlap (~n log n).
SUPERLINEAR = [
    ("minhash_near_dups", 18.0, "~n^1.2 banding collisions"),
    ("contamination_check", 18.0, "~n log n n-gram join"),
    # steady-state near-dup ingest: same banding-collision growth as
    # minhash_near_dups plus the history probe (melted-key equi-join);
    # both families — the benched xxhash64 scale path and the oracle
    # md5mod audit twin — carry the bound
    ("incremental_minhash_batch", 18.0, "~n^1.2 banding + history probe"),
    ("incremental_minhash_scale", 18.0, "~n^1.2 banding + history probe"),
    # the transitive split composes the portable near-dup clustering —
    # same banding-collision envelope plus the O(log n) closure rounds
    ("leakage_safe_split_neardup", 18.0, "~n^1.2 banding + CC closure"),
    # r6 (verdict ask #5): the two iterative heavies, with documented
    # wider bounds.  Star-CC runs O(log n) rounds of per-round fixed
    # cost (localCheckpoint + 2 probes) — at sf0.01 the whole run is
    # fixed overhead, so the 10x ratio mostly measures round count
    # growth (components stay small); 24x bounds rounds+data together.
    ("graph_connected_components", 24.0, "O(log n) star rounds, "
     "per-round fixed cost dominates at small SF"),
    # r7: entity resolution = linear block join + Levenshtein filter,
    # then star-CC closure over the (tiny) match graph — the iterative
    # rounds' fixed cost dominates at small SF exactly like graph CC
    ("entity_resolution_cluster", 24.0, "O(n) block join + star-CC "
     "rounds over planted size-2 clusters"),
    # FP-growth's mined-pattern count depends on the support threshold
    # relative to corpus size: 10x data at the entry's fixed relative
    # support keeps pattern counts bounded, but tree mining is
    # library-side and super-linear in pattern density — 24x documents
    # the expected envelope rather than a linear claim.
    ("ml_fpgrowth_itemsets", 24.0, "support-dependent FP-tree mining"),
    # r9: the quality-aware survivor composes the portable near-dup
    # clustering — the same banding-collision + CC-closure envelope as
    # leakage_safe_split_neardup; the argmax window adds linear work
    ("neardup_best_survivor", 18.0, "~n^1.2 banding + CC closure"),
    # the banding P/R eval composes two gated families (minhash
    # banding + the prefix-filtered exact join) — inherits their bound
    ("lsh_banding_pr_eval", 18.0, "~n^1.2 banding + prefix-join truth"),
    ("lsh_threshold_sweep", 18.0, "~n^1.2 banding + prefix-join truth"),
    # k-core peels data-dependent rounds of fixed per-round cost — the
    # same iterative envelope as graph CC (degrees RISE with SF here,
    # so rounds stay small; the bound covers rounds+data together)
    ("graph_kcore", 24.0, "O(rounds) degree aggregate + semi prunes"),
]


def _run_secs(spark, name: str, sf_dir: str) -> float:
    from spark_monotasks_spark.queries import QUERY_REGISTRY

    fn = QUERY_REGISTRY[name]
    best = float("inf")
    for _ in range(2):  # min-of-2 absorbs one-off JIT/page-cache cost
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return best


@pytest.mark.parametrize(
    "name,bound,note", LINEAR + SUPERLINEAR, ids=lambda v: str(v)
)
def test_wall_time_scales_subquadratically(spark, name, bound, note):
    small = _run_secs(spark, name, SF_SMALL)
    big = _run_secs(spark, name, SF_BIG)
    # floor the denominator: sub-100ms timings are all fixed cost and
    # would make the ratio meaninglessly jumpy
    ratio = big / max(small, 0.1)
    assert ratio < bound, (
        f"{name} ({note}): 10x data took {ratio:.1f}x the time "
        f"({small:.3f}s -> {big:.3f}s), bound {bound}x — plan has gone "
        "super-linear beyond its documented shape (accidental quadratic?)"
    )
