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
    # === ROUND 9 BUDGET (50-slot driver window) ============================
    # Plan: (1) every name whose code is new or edited in r9 leads (7
    # names — all fully oracled); (2) the ENTIRE 39-name r3-latest backlog
    # (r8 verdict "missing" #1) is retired; (3) the remaining 5 slots
    # start on the 39-name r4-latest backlog, oracled names first (the 35
    # r4 names below the cut — incl. the 9 rows-only MLlib/kernel names,
    # which rank last at equal staleness — queue for the r10 rotation:
    # postproc_business_rules, postproc_seasonal_nudge, kpi_quality_bands, error_decomposition_brand,
    # cv_blocked_folds, kpi_directional_accuracy, meta_features_ensemble,
    # flagship_weekly_brand_demand, stream_session_windows,
    # stream_dedup_within_watermark, event_cohort_retention,
    # event_funnel_conversion, join_asof_view_attribution,
    # stream_tumbling_hourly, stream_threshold_alerts,
    # stream_json_props_extract, stream_sliding_1h_30m,
    # stream_alert_rate_limit, stream_late_data_policy,
    # io_compact_roundtrip, io_upsert_roundtrip, sample_stratified_split,
    # contamination_ngram_overlap, seqpack_greedy_bins,
    # text_repetition_ratio, text_unigram_logprob, then the rows-only
    # zero_inflated_hurdle_mllib, dedup_minhash_mllib,
    # similarity_ivf_kmeans, similarity_pca_cosine, calibration_isotonic,
    # holt_winters_per_series, similarity_brp_lsh_mllib,
    # sequential_clamp_per_series, rolling_autocorr_per_series.)
    # --- round 9: new queries and edited-after-r8-check code --------------
    "dedup_lsh_calibration",  # r9: candidates-only true-Jaccard scoring
    "dedup_lines_ccnet",  # r9 NEW: CCNet/C4 line-level keep-first dedup
    "dedup_savings_report",  # r9: + line_first_seen policy row
    "embedding_pq_eval",  # r9 NEW: product-quantization ADC retrieval eval
    "mm_ppm_pixel_stats",  # r9 NEW: codec-free PPM (P6) image decode
    "stream_hourly_bloom",  # r9 NEW: exact twin of the Bloom stream kernel
    "similarity_ivfpq_topk",  # r9 NEW: composed IVF-PQ index recall eval
    # --- r3-latest backlog: all 39, retired this round ---------------------
    "agg_multistat_product",
    "agg_moments_brand",
    "agg_distinct_counts",
    "agg_grouped_quantiles",
    "market_share_brand",
    "entropy_store_portfolio",
    "hhi_by_type",
    "top5_share_per_store",
    "mode_share_store",
    "zero_ratio_per_part",
    "weekday_profile",
    "pivot_brand_by_status",
    "basket_stats",
    "corr_price_quantity",
    "rollup_type_brand",
    "cube_flag_status",
    "global_describe",
    "calendar_extract",
    "cyclical_fourier",
    "binning_fixed_tiers",
    "string_normalize",
    "null_strategies",
    "frequency_encoding",
    "label_encode_other",
    "holiday_proximity",
    "business_calendar_flags",
    "window_ffill",
    "window_group_transform",
    "window_momentum_accel",
    "window_decline_indicator",
    "ewm_daily_store",
    "cv_walkforward_folds",
    "postproc_clip_caps",
    "similarity_topk_cosine",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_metadata",
    # --- oldest remaining evidence: first 5 of the 39 r4-latest names -----
    "customer_proxy_daily",
    "agg_salted_skew",
    "metric_wmape_by_store",
    "intermittency_classify",
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
