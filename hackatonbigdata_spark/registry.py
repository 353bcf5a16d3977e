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
        forecast,
        llm,
        multimodal,
        relational,
        scalars,
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
    # flagship + queries modified or added this round
    "flagship_weekly_brand_demand",
    "metric_suite_global",
    "metric_abc_tiers",
    "heuristic_blend_forecast",
    "binning_quantile_ntile",
    "window_rolling_stats",
    "window_rolling_median_skew",
    "stream_session_windows",
    "stream_dedup_within_watermark",
    "holt_level_trend",
    "store_coldstart_fallback",
    "sample_scan",
    "stacking_predictions_join",
    "residual_diagnostics_store",
    "calibration_curve_bins",
    "text_tfidf_topterms",
    "window_rolling_multiscale",
    "metric_wmape_weighted",
    "data_quality_profile",
    "customer_rfm_segments",
    "dedup_cluster_components",
    "event_cohort_retention",
    "event_funnel_conversion",
    "join_asof_view_attribution",
    "join_range_price_band",
    "agg_approx_sketches",
    "unpivot_store_metrics",
    "dedup_fuzzy_names",
    "text_scrub_numbers",
    "window_expanding_stats",
    # relational — never driver-checked in round 1
    "scan_project_filter",
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
    # windows — never driver-checked in round 1
    "window_lag_family",
    "window_rolling_slope",
    "window_rank_volume",
    "window_interarrival",
    "window_zero_streaks",
    "window_seasonal_dow",
    "window_centered_smoothing",
    "window_growth_cap",
    "window_group_transform",
    "window_ffill",
    "window_momentum_accel",
    "window_decline_indicator",
    "ewm_daily_store",
    # scalars + streaming batch twins, interleaved so both families land in
    # the driver's bounded check window — none were driver-checked in round 1
    "calendar_extract",
    "cyclical_fourier",
    "null_strategies",
    "holiday_proximity",
    "clip_and_rewrite",
    "stream_tumbling_hourly",
    "stream_threshold_alerts",
    "stream_json_props_extract",
    "stream_sliding_1h_30m",
    "stream_alert_rate_limit",
    # below here: checked only if the driver's window extends past 50
    "binning_fixed_tiers",
    "string_normalize",
    "frequency_encoding",
    "label_encode_other",
    "business_calendar_flags",
    "stream_late_data_policy",
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_metadata",
    "multimodal_frame_sample",
    "multimodal_decode_stub",
    # rows-only kernels last among the unverified
    "similarity_brp_lsh_mllib",
    "ewm_pandas_per_series",
    "croston_per_series",
    "sequential_clamp_per_series",
    "rolling_autocorr_per_series",
]


def _ordered(mapping: dict[str, "QueryFn | str"]) -> dict:
    lead = {n: mapping[n] for n in _PRIORITY if n in mapping}
    tail = {n: v for n, v in mapping.items() if n not in lead}
    return {**lead, **tail}


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return _ordered(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return _ordered(_ORACLES)
