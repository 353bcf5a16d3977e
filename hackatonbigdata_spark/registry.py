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
    # --- round 3: the 27 oracled queries never yet in a driver window ------
    # scalars / calendar family
    "calendar_extract",
    "cyclical_fourier",
    "null_strategies",
    "holiday_proximity",
    "clip_and_rewrite",
    "binning_fixed_tiers",
    "string_normalize",
    "frequency_encoding",
    "label_encode_other",
    "business_calendar_flags",
    # streaming batch twins
    "stream_tumbling_hourly",
    "stream_threshold_alerts",
    "stream_json_props_extract",
    "stream_sliding_1h_30m",
    "stream_alert_rate_limit",
    "stream_late_data_policy",
    # windows
    "window_group_transform",
    "window_ffill",
    "window_momentum_accel",
    "window_decline_indicator",
    "ewm_daily_store",
    # text + multimodal
    "text_lang_id",
    "text_quality_score",
    "text_token_count",
    "text_fingerprint",
    "multimodal_binary_metadata",
    "multimodal_frame_sample",
    # --- queries modified or added this round (need re-verification) -------
    "similarity_topk_cosine",
    "dedup_cluster_components",
    "io_compact_roundtrip",
    "io_upsert_roundtrip",
    "flagship_weekly_brand_demand",
    # --- refresh: oracled queries whose only evidence is round 1 -----------
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
    "monthly_store_volume",
    "pivot_brand_by_status",
    "basket_stats",
    "corr_price_quantity",
    "rollup_type_brand",
    "postproc_clip_caps",
    "cv_walkforward_folds",
    # ---- slot 50 boundary: below here only if the driver window extends ----
    # new rows-only queries this round (weaker rows-only driver check)
    "similarity_ivf_kmeans",
    "similarity_pca_cosine",
    "calibration_isotonic",
    # remaining oracled refreshes
    "cube_flag_status",
    "global_describe",
    "customer_proxy_daily",
    "agg_salted_skew",
    "metric_wmape_by_store",
    "intermittency_classify",
    "postproc_business_rules",
    "postproc_seasonal_nudge",
    "kpi_quality_bands",
    "error_decomposition_brand",
    "cv_blocked_folds",
    "kpi_directional_accuracy",
    "meta_features_ensemble",
    "corr_matrix_top_parts",
    "postproc_outlier_dampening",
    "cv_hierarchical_folds",
    "feature_matrix_daily_store",
    "calibration_interval_coverage",
    "prophet_prep_segments",
    "postproc_lifecycle_promo",
    # rows-only kernels last (they can only yield err: no_oracle)
    "agg_approx_sketches",
    "multimodal_decode_stub",
    "similarity_brp_lsh_mllib",
    "dedup_minhash_mllib",
    "zero_inflated_hurdle_mllib",
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
