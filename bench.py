"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_volume",
    "q14_brand_revenue",
    "events_sessionize",
    "events_cumulative_value",
    "dedup_exact_orders",
    "events_daily_stats",
]
# widened as operator families land (see SURVEY.md section 2)
EXTRA = [
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "embedding_dedup_cosine",
    "ann_cosine_topk",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "asof_purchase_attribution",
    "q13_order_count_distribution",
    "text_quality",
    "doc_fingerprint",
    "events_typed_extract",
    "lockup_locked_supply",
    # round 4 additions (SURVEY r5 rows)
    "semdedup_embeddings",
    "quality_filter_c4",
    "corpus_shard_pack",
    "receipt_descendants",
    "multimodal_feature_stats",
    # round 5 additions
    "dedup_span_runs",
    "dedup_edit_verify",
    "events_interval_join",
    "bpe_train_merges",
    "rp_project_embeddings",
    "events_value_equidepth",
    "orders_retention_cohorts",
    "events_markov_transitions",
    "ivfpq_ann_topk",
    "data_quality_report",
    # round 5 session-2 additions
    "events_activity_streaks",
    "events_time_weighted_value",
    "nation_trade_pagerank",
    "orders_zorder_layout",
    "bpe_encode_corpus",
    "source_overlap_matrix",
    "topic_cluster_terms",
    "opq_rotate_quantize",
    "events_value_anomalies",
    "customer_rfm_scores",
    "dedup_pair_alignment",
    "lineitem_orderkey_gaps",
    "lineitem_correlations",
    "vocab_zipf_fit",
    "cluster_silhouette",
    "events_session_lift",
    "dedup_threshold_curve",
    "customer_revenue_gini",
    "events_ohlc_hourly",
    "embedding_split_drift",
    # user_state_scd2 is deliberately NOT benchmarked: its output is a
    # full-table row explosion (every event becomes a version row), so
    # the timing measures result materialization, not the one window
    # pass — the gate verifies it; the bench tracks plan execution.
    # scd2_stream_replay / cohort_stream_replay are excluded for the
    # same reason squared: they run whole streaming pipelines with
    # temp-dir I/O (replay harness cost, not plan cost).
    # round 6 additions
    "dedup_edit_banded",
    "dedup_longest_substring",
    "dedup_containment",
    "corpus_chunk_windows",
    "corpus_weighted_sample",
    "bigram_backoff_xent",
    "events_value_robust_anomalies",
    "bloom_seen_filter",
    # frozen-index serving twins: run 1 of the best-of-3 pays the
    # index build (memoized per session), runs 2-3 measure the pure
    # probe/encode/score serving leg — the regression canary the r5
    # verdict asked to separate from training cost
    "ivfpq_ann_serve",
    "opq_quantize_serve",
    "topic_terms_serve",
    # round 7 additions: the frozen LSH candidate relation served
    # directly, and the three sketch-contract projections
    "lsh_candidates_serve",
    "approx_distinct_contract",
    "approx_percentiles_contract",
    "heavy_hitters_contract",
    # round 7 session-2 additions: DSIR importance weights, interpolated
    # Kneser-Ney scoring, cumulative-distinct decomposition
    "dsir_importance_weights",
    "kneser_ney_bigram_xent",
    "events_cumulative_distinct_users",
    "lsh_s_curve",
    "ann_hard_negatives",
    "events_ewma_value",
    "minhash_bbit_estimate",
    "embedding_top_component",
    "events_value_cusum",
    "bm25_search",
    "quality_budget_curve",
    "events_daily_autocorrelation",
    "ivf_nprobe_recall_curve",
    "events_funnel_latency",
    "token_kl_drift",
    "minhash_width_curve",
    "receipt_depth_histogram",
    # round 7 session-3 additions
    "dedup_winnowing",
    "dedup_keep_best",
    "part_copurchase_triangles",
    "embedding_isotropy",
    "events_dow_seasonality",
    "packing_efficiency_curve",
    "vocab_growth_heaps",
    "doc_novelty",
    "dedup_savings_report",
    "attribution_models",
    "engagement_dau_wau_mau",
    "split_leakage_report",
    # round 7 session-4 additions
    "orders_benford_digits",
    "supplier_market_hhi",
    "orders_monthly_gapfill",
    "parts_abc_pareto",
    "events_daily_trend",
    "centroid_assign_confusion",
    "ann_rerank_int8",
    "term_burstiness",
    "skipgram_cooc_pmi",
    "dedup_method_agreement",
    "events_top_paths",
    "matryoshka_ann_topk",
    "induced_stopwords",
    "embedding_anisotropy_whiten",
    "cohort_ltv_curves",
    "user_event_entropy",
    "cross_lang_vocab_overlap",
    "dedup_pair_features",
    "shard_skew_report",
    "embedding_norm_outliers",
    "ann_rerank_curve",
    "borderline_docs",
    "order_ship_latency",
    "dau_new_vs_returning",
    "dedup_cluster_sizes",
    "events_hourly_profile",
    "ann_hubness_report",
    # round 7 session-5 additions
    "customer_survival_curve",
    "order_backlog_daily",
    "dedup_incremental_cohort",
    "simhash_hamming_curve",
    "user_interarrival_stats",
    "bpe_merge_curve",
    "vocab_oov_curve",
    "trending_users_decayed",
    "contamination_ngram_curve",
    "events_weekly_mix_drift",
    "lsh_probe_budget_curve",
    "orders_duplicate_payments",
    "ivf_list_balance",
    "dedup_chain_gap_report",
    "events_daily_decomposition",
    "shingle_df_cap_curve",
    "weekly_top_movers",
    "retention_curve_fit",
    "matryoshka_dim_curve",
    "weekly_amount_drift",
    "lsh_bucket_balance",
    "nation_trade_reciprocity",
    "keep_best_quality_lift",
    "embedding_bitwidth_curve",
    "winnowing_window_curve",
    "session_duration_stats",
    "receipt_data_edges",
    "receipt_data_readiness",
    "account_changes_by_reason",
    "boilerplate_segments",
    # round 8 session-2 additions (dedup_components added so the B20
    # label-propagation BUILD stays benched now that keep_best and its
    # reports serve from the frozen labeling)
    "dedup_components",
    "quality_filter_gopher",
    "lang_id_margin",
    "pii_incidence_by_source",
    "token_fertility_by_lang",
    "kmeans_elbow_curve",
    "quality_rules_agreement",
    "mixture_epoch_plan",
    "doc_length_lognormal_fit",
    "embedding_dim_stats",
    # round 9 additions: the real-codec multimodal pipeline (stdlib
    # PNG encode -> inflate+unfilter decode inside one Arrow kernel)
    "multimodal_png_roundtrip",
    "multimodal_wav_roundtrip",
    "multimodal_image_dhash",
    "multimodal_image_dhash_pairs",
    "multimodal_audio_energy",
    "dedup_modality_agreement",
    # round 10 additions (srm_stream_replay / forecast_backtest_stream_
    # replay excluded: replay-harness cost, not plan cost — the
    # scd2/cohort precedent)
    "events_forecast_backtest",
    "events_srm_check",
    "events_value_winsorized",
    "events_changepoint_binseg",
    "scrub_effectiveness",
    "doc_char_entropy",
    "lang_id_confusion",
    "dedup_normalization_lift",
    "multimodal_image_histogram",
    "multimodal_audio_downsample",
    "multimodal_gif_roundtrip",
    "dedup_boundary_stitch",
    "quality_signal_calibration",
    "orders_weekday_anova",
    "event_type_user_overlap",
    "dedup_growth_curve",
    "multimodal_media_router",
    "text_readability",
    # round 11 additions (replay twins stay excluded: harness cost,
    # not plan cost — BENCH_BASELINE.md protocol)
    "args_base64_extract",
    # ordered AFTER the build-inclusive router row so its frozen mixed
    # column is already materialized: this row is the serving cost
    "multimodal_media_router_serve",
    # the uncompressed real codec: the per-byte floor the LZW row's
    # native-swap argument is measured against
    "multimodal_bmp_roundtrip",
    # r11 wave 2: filtered vector search (exact baseline + the
    # post-filter IVF recall curve), stratified sampling, and the
    # real-decode 2x box downsample
    "ann_filtered_topk",
    "ann_filtered_ivf_recall",
    "corpus_stratified_sample",
    "multimodal_image_downsample2x",
    "ann_label_probe_recall",
    "multimodal_gif_frame_sample",
    "multimodal_scene_cuts",
    "multimodal_audio_windows",
    "orders_basket_rules",
    "events_power_analysis",
    "events_bootstrap_ci",
    "events_mann_whitney",
    "lineitem_discount_elasticity",
    # round 12 additions (replay-contract twins stay excluded:
    # harness cost, not plan cost)
    "actions_typed_args",
    "access_keys_state",
    "accounts_state",
    "access_keys_with_genesis",
    "accounts_with_genesis",
    # round 13 additions.  supply_catchup_incremental measures ONE
    # incremental WAP catch-up cycle under its own name (r12 verdict
    # nit #3: the kernel was previously benched only through its
    # replay twins, which stay excluded as harness cost); the frozen
    # base publish is paid by the first run, so the min-of-3 is the
    # steady-state cycle.
    "supply_catchup_incremental",
    # keyset pagination: pushed composite residual + TakeOrdered —
    # the lake analog of the reference's index walk
    "events_page_after",
    # the typed account-changes surface: map-only projection, the
    # account-grain arg-max fold, and the full-outer genesis SMJ
    "account_changes_typed",
    "account_balances_state",
    "account_balances_with_genesis",
    # the per-account newest-first page (DESC TakeOrdered)
    "account_changes_page_after",
    # code-vs-prose routing (map-only codegen features) and the PNG
    # ancillary-chunk privacy scrub (map-only Arrow kernel)
    "text_code_detect",
    "multimodal_png_meta_scrub",
]

# best-of-N: single-shot timings at sf0.1 are dominated by whole-stage
# codegen compilation noise (q3 measured 3.1s cold vs ~0.7s repeat);
# the minimum is the stable plan-execution signal BENCH_BASELINE.md
# tracks per round.
N_RUNS = 3


def main() -> None:
    import __spark_entry__ as e
    from near_indexer_for_explorer_spark.session import get_spark

    spark = get_spark(app_name="nifes-bench")
    qs = e.queries()
    names = [n for n in HEADLINE + EXTRA if n in qs]

    # warm the JVM + parquet footer cache once so per-query timings
    # measure the plan, not session startup
    qs[names[0]](spark, SF_DIR).count()

    timings: dict[str, float] = {}
    for name in names:
        best, n = None, 0
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            df = qs[name](spark, SF_DIR)
            n = df.count()
            took = time.perf_counter() - t0
            best = took if best is None else min(best, took)
        timings[name] = round(best, 4)
        print(f"# {name}: best-of-{N_RUNS} {timings[name]:.3f}s rows={n}", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf else None,
        # The last QUIESCENT canonical min-of-3 subtotal recorded in
        # BENCH_BASELINE.md (sf0.1 local[32]) — emitted so the driver's
        # artifact self-documents its load-window factor: driver-run
        # totals measured 1.3-1.5x the canonical under concurrent load
        # (BENCH_r07 analysis), inflating scan-only rows uniformly.
        # Update when a new canonical table is recorded.
        "canonical_subtotal_ref": {"sec": 186.83, "n_queries": 219,
                                   "sf": 0.1,
                                   "round": "r13 definitive (canonical 216 + 3 addendum rows)"},
    }
    # Archival line: full roster at 4dp (local runs / BENCH_BASELINE.md
    # workflow read this).  NOT the driver's line — see below.
    print(json.dumps(payload))

    # The driver's capture keeps only the LAST ~2000 chars of merged
    # output and parses the final complete JSON line it finds; r6's
    # 66-query 4dp line overran that window and recorded parsed=null.
    # Emit a LAST line that is guaranteed to fit: drop precision first,
    # then (only if the roster outgrows even 2dp) fold the FASTEST
    # queries into one subtotal — the slow rows are the regression
    # signal worth per-query resolution.
    _FIT = 1900

    def _compact(q: dict[str, float], nd: int) -> str:
        body = dict(payload)
        body["queries"] = {k: round(v, nd) for k, v in q.items()}
        return json.dumps(body, separators=(",", ":"))

    line = None
    for nd in (3, 2):
        cand = _compact(timings, nd)
        if len(cand) <= _FIT:
            line = cand
            break
    if line is None:
        q = dict(timings)
        folded_n, folded_sum = 0, 0.0
        for name in sorted(timings, key=timings.get):
            if len(_compact(q, 2)) <= _FIT - 60:
                break
            folded_sum += q.pop(name)
            folded_n += 1
        body = dict(payload)
        body["queries"] = {k: round(v, 2) for k, v in q.items()}
        body["n_folded_fast"] = folded_n
        body["folded_fast_subtotal"] = round(folded_sum, 2)
        line = json.dumps(body, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
