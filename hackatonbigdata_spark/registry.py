"""Query registry: the engine's operator catalog.

Every operator from SURVEY.md §2 is registered here as a named query —
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent ANSI SQL string a DuckDB oracle can run on the same parquet
tables.  The driver's correctness gate compares the two per query.

Conventions that keep Spark and DuckDB hash-comparable:
- alias every computed column identically in both
- round floating aggregates with ``round(x, 4)`` on both sides
- day-of-week is ISO (1=Mon..7=Sun) everywhere
- never depend on row order (the compare is order-insensitive)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    """Import every operator module so decorators run."""
    from hackatonbigdata_spark.operators import (  # noqa: F401
        aggregates,
        drift,
        forecast,
        io_queries,
        llm,
        multimodal,
        relational,
        scalars,
        sequence,
        series_kernels,
        streaming_batch,
        windows,
    )


# Explicit verification priority: the driver's correctness gate walks the
# queries() dict in insertion order and checks a bounded prefix per round, so
# queries that are new, recently modified, or not yet driver-verified must
# come first.  Names listed here lead (in this order); everything else follows
# in registration order.  Rotate per round as coverage lands.
_PRIORITY: list[str] = [
    # --- round 5: new or newly-oracled queries first -----------------------
    "calibration_conformal",
    "calibration_temperature",
    "calibration_quantile_band",
    "calibration_subsample_uncertainty",
    "corpus_mixture_weights",
    "dedup_report_by_source",
    "stacking_ridge_weights",
    "ensemble_dynamic_weights",
    "feature_importance_topk",
    "dedup_cluster_largestar",  # graduated rows-only -> oracled this round
    "agg_sketches_only",  # new rows-only production sketch path
    "ar2_yule_walker_per_series",  # new kernel, graduated to oracled (r5)
    "ar2_yule_walker_sql",  # new pure-SQL twin (r5)
    "croston_per_series",  # graduated rows-only -> oracled (r5)
    "croston_ses_sql",  # new pure-SQL twin (r5)
    "cdc_scd2_user_state",  # new r5: CDC -> SCD2 history build
    "diag_skew_heavy_hitters",  # new r5: shuffle-skew diagnostic
    "sample_reservoir_per_group",  # new r5: deterministic per-group sample
    "ann_recall_at_k",  # new r5: oracled IVF recall evaluation
    "text_dupgram_fraction",  # new r5: duplicate-ngram quality filter
    "dedup_incremental_vs_snapshot",  # new r5: incremental exact dedup
    "corpus_resample_ncopies",  # new r5: mixture-weight resampling
    "seq_event_transitions",  # new r5b: Markov transition matrix
    "interval_merge_coverage",  # new r5b: overlapping-interval union
    "graph_pagerank_parts",  # new r5b: integer-exact PageRank
    "snapshot_table_diff",  # new r5b: full-outer snapshot reconciliation
    "io_partitioned_prune",  # new r5b: hive-partitioned sink + pruned read
    "text_bigram_logprob",  # new r5b: second-order LM quality score
    "anomaly_mad_flags",  # new r5b: robust MAD outlier detection
    "calibration_platt_exact",  # new r5b: fully-oracled GD logistic fit
    "io_bucketed_join",  # new r5b: shuffle-free bucketed fact-fact join
    "encode_target_oof",  # new r5b: leakage-safe OOF target encoding
    "window_rolling_distinct",  # new r5b: rolling COUNT(DISTINCT) rewrite
    "time_weighted_avg",  # new r5b: irregular-interval TWA
    "join_salted_skew",  # new r5b: salted shuffle join, result-transparent
    "io_clustered_stats_prune",  # new r5b: range-clustered write + file skipping
    "attribution_multitouch_linear",  # new r5b: fractional-credit attribution
    "drift_psi_distribution",  # new r5b: PSI distribution-shift monitor
    "drift_performance_periods",  # new r5b: WMAPE degradation monitor
    "window_rank_movers",  # new r5b: month-over-month rank movers
    "grouping_sets_custom",  # new r5b: arbitrary GROUPING SETS lattice
    "eval_confusion_by_store",  # new r5b: exact confusion matrix + P/R/F1
    "eval_decile_lift",  # new r5b: decile lift & gains table
    "ab_test_welch",  # new r5b: exact Welch t experiment readout
    "corr_spearman_store",  # new r5b: tie-aware exact Spearman
    "price_elasticity_brand",  # new r5b: log-log OLS elasticity
    "ab_test_ks",  # new r5b: exact two-sample KS per event type
    "audit_benford_digits",  # new r5b: Benford first-digit audit
    "survival_km_signup_purchase",  # new r5b: Kaplan-Meier in log2 domain
    "seq_path_trigrams",  # new r5b: top 3-step journey paths
    "anomaly_poisson_spikes",  # new r5b: LOO Poisson rate-spike detection
    "text_zipf_slope",  # new r5b: Zipf-law corpus health fit
    "quantile_normalize_store",  # new r5b: grouped quantile normalization
    "io_schema_evolution",  # new r5b: mergeSchema evolution roundtrip
    "ab_test_cuped",  # new r5b: CUPED variance-reduced readout
    "cohort_ltv_curve",  # new r5b: cohort lifetime-value curve
    "window_cusum_changepoint",  # new r5b: exact-integer CUSUM break detection
    "postproc_topdown_reconcile",  # new r5b: integer top-down allocation
    "io_incremental_rollup",  # new r5b: mergeable incremental view maintenance
    "queue_backlog_lindley",  # new r5b: Lindley backlog in closed form
    "embedding_centroid_drift",  # new r5b: vector-modality drift monitor
    "seasonal_strength_store",  # new r5b: STL-lite seasonal strength
    "concentration_gini_brand",  # new r5b: exact-rank Gini concentration
    "window_max_drawdown",  # new r5b: peak-to-trough demand drawdown
    "orders_ship_sla",  # new r5b: order-to-ship SLA compliance
    "ab_test_mannwhitney",  # new r5b: tie-corrected rank test
    "alert_error_burnrate",  # new r5b: multi-window burn-rate paging
    "sample_weighted_aexpj",  # new r5b: deterministic weighted sampling
    # --- oracle SQL edited since the query's last driver check -------------
    "stacking_predictions_join",  # refactored onto shared _OOF_SQL (r5)
    "feature_matrix_daily_store",  # refactored onto shared _FM_CTES (r5)
    "monthly_store_volume",  # month-trunc oracle edit (r4 cffe292)
    "postproc_lifecycle_promo",  # promo oracle edit (r4 cffe292)
    "embedding_quantize_int8",  # zero-range guard edit (r4 f39baf5)
    # --- stalest driver evidence: last checked in round 1 ------------------
    "corr_matrix_top_parts",
    "postproc_outlier_dampening",
    "cv_hierarchical_folds",
    "calibration_interval_coverage",
    "prophet_prep_segments",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_ivf_bucketed",
    # --- last checked in round 2 (oldest evidence after the r1 set) --------
    "metric_suite_global",
    "metric_abc_tiers",
    "heuristic_blend_forecast",
    "store_coldstart_fallback",
    "residual_diagnostics_store",
    "calibration_curve_bins",
    "metric_wmape_weighted",
    "customer_rfm_segments",
    "unpivot_store_metrics",
    "text_tfidf_topterms",
    "dedup_fuzzy_names",
    "text_scrub_numbers",
    "scan_project_filter",
    "sample_scan",
    "filter_quantile_band",
    "filter_date_range_valid",
    "dedup_keep_first",
    "join_multiway_enrich",
    "join_anti_orphans",
    "join_semi_active_customers",
    "share_window_vs_join_back",
    "union_slices",
    "topk_orders_by_value",
    "cooccurrence_pairs",
    "join_integrity_check",
    "data_quality_profile",
    "join_range_price_band",
    "binning_quantile_ntile",
    # ---- the r5b additions grew the lead block past 50: a 50-slot driver
    # window now covers all 40 never-driver-checked r5/r5b names, the 5
    # edited-oracle names, and the first ~5 r1-stale names.  Everything
    # below the cut is re-verified at sf0.001 by tests/test_oracle_parity.py
    # every session (and the whole registry by the driver-sim sweep), so
    # prioritizing never-checked over stale is the right trade. ------------
    "window_lag_family",
    "window_rolling_stats",
    "window_rolling_median_skew",
    "window_rolling_slope",
    "window_rank_volume",
    "window_interarrival",
    "window_zero_streaks",
    "window_seasonal_dow",
    "window_centered_smoothing",
    "window_growth_cap",
    "holt_level_trend",
    "window_rolling_multiscale",
    "window_expanding_stats",
]


def _ordered(mapping: dict[str, "QueryFn | str"]) -> dict:
    # Every _PRIORITY name must exist in the full registry: a name that
    # resolves to nothing would silently shrink the driver's verification
    # window and record phantom work as planned-and-placed (round-3 lesson).
    unknown = set(_PRIORITY) - set(_QUERIES)
    if unknown:
        raise ValueError(f"_PRIORITY names not registered anywhere: {sorted(unknown)}")
    lead = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in lead}
    return {**lead, **tail}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)
