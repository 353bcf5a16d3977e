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
    # === ROUND 10 BUDGET (50-slot driver window) ===========================
    # Plan: (1) every name whose code is new or edited in r10 leads (10
    # names — 7 new operators + the residual-encoding rework that touched
    # the shared PQ encoder + the _unigram_nl_scores refactor — all fully
    # oracled); (2) the ENTIRE 35-name r4-latest backlog (r9 verdict
    # "missing" #1) is retired — 25 oracled names first, the 9 rows-only
    # MLlib/kernel names last (text_unigram_logprob, the 35th, already
    # leads as an r10-edited name); (3) the remaining 6 slots start on
    # the 45-name r5-latest backlog in registration order, oracled names
    # first (the 39 r5 names below the cut queue for the r11 rotation:
    # audit_benford_digits, drift_psi_distribution, calibration_conformal,
    # ensemble_dynamic_weights,
    # feature_importance_topk, calibration_temperature,
    # calibration_quantile_band, calibration_subsample_uncertainty,
    # eval_confusion_by_store, eval_decile_lift, io_partitioned_prune,
    # io_bucketed_join, dedup_cluster_largestar, corpus_mixture_weights,
    # dedup_report_by_source, ann_recall_at_k, text_dupgram_fraction,
    # dedup_incremental_vs_snapshot, corpus_resample_ncopies,
    # sample_reservoir_per_group, anomaly_mad_flags, join_salted_skew,
    # encode_target_oof, seq_event_transitions, interval_merge_coverage,
    # graph_pagerank_parts, window_rolling_distinct, time_weighted_avg,
    # attribution_multitouch_linear, survival_km_signup_purchase,
    # seq_path_trigrams, croston_ses_sql, ar2_yule_walker_sql,
    # cdc_scd2_user_state, snapshot_table_diff, window_rank_movers, then
    # the rows-only agg_sketches_only, croston_per_series,
    # ar2_yule_walker_per_series.)
    # --- round 10: new queries and edited-after-r9-check code -------------
    "corpus_doremi_weights",  # r10 NEW: learned mixture reweighting
    "similarity_ivf_nprobe_sweep",  # r10 NEW: multi-probe recall/cost curve
    "stream_hourly_hll",  # r10 NEW: exact twin of the HyperLogLog kernel
    "stream_hll_daily_merge",  # r10 NEW: cross-window HLL register merge
    "mm_phash_dedup",  # r10 NEW: perceptual-hash (aHash) image dedup
    "io_zorder_prune",  # r10 NEW: z-order clustering + 2-D file skipping
    "text_kneser_ney_logprob",  # r10 NEW: interpolated KN bigram scorer
    "similarity_ivfpq_topk",  # r10: + residual-encoding variant
    "embedding_pq_eval",  # r10: shares the reworked _pq_codes encoder
    "text_unigram_logprob",  # r10: _unigram_nl_scores refactor (also r4)
    # --- r4-latest backlog: all 35, retired this round (oracled first) ----
    "postproc_business_rules",
    "postproc_seasonal_nudge",
    "kpi_quality_bands",
    "error_decomposition_brand",
    "cv_blocked_folds",
    "kpi_directional_accuracy",
    "meta_features_ensemble",
    "io_compact_roundtrip",
    "io_upsert_roundtrip",
    "sample_stratified_split",
    "contamination_ngram_overlap",
    "seqpack_greedy_bins",
    "text_repetition_ratio",
    "flagship_weekly_brand_demand",
    "stream_tumbling_hourly",
    "stream_sliding_1h_30m",
    "stream_session_windows",
    "stream_threshold_alerts",
    "stream_alert_rate_limit",
    "stream_dedup_within_watermark",
    "stream_late_data_policy",
    "stream_json_props_extract",
    "event_cohort_retention",
    "event_funnel_conversion",
    "join_asof_view_attribution",
    # --- r4-latest rows-only MLlib/kernel names (weaker rows-only check) --
    "zero_inflated_hurdle_mllib",
    "calibration_isotonic",
    "dedup_minhash_mllib",
    "similarity_brp_lsh_mllib",
    "similarity_ivf_kmeans",
    "similarity_pca_cosine",
    "sequential_clamp_per_series",
    "rolling_autocorr_per_series",
    "holt_winters_per_series",
    # --- oldest remaining evidence: first 6 oracled r5-latest names -------
    "diag_skew_heavy_hitters",
    "grouping_sets_custom",
    "ab_test_welch",
    "corr_spearman_store",
    "price_elasticity_brand",
    "ab_test_ks",
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
