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
    # === ROUND 7 BUDGET (50-slot driver window) ============================
    # 16 r7-new/rewritten + 19 edited-after-their-last-driver-check (r6
    # verdict "What's missing" #1) + 15 oldest r2-stale = 50.  After this
    # window lands, zero queries have code newer than their driver evidence
    # and the r2-latest backlog is down to 18 names (the trade taken for
    # the seven r7b operators; r8 burns them all with 32 slots to spare).
    # --- round 7: rewritten this round (HOF byte kernels, degree-ordered
    #     triangles) and brand-new queries -- freshest code leads ---------
    "stream_hourly_heavy_hitters",  # r7b NEW: top-3/hour, sketch twin
    "text_chunk_windows",  # r7b NEW: 64/48 overlap token chunking
    "text_gopher_rules",  # r7b NEW: Gopher hard-threshold quality battery
    "corpus_bpe_merges",  # r7b NEW: BPE merge learning (rows-only, pinned)
    "dedup_substring_spans",  # r7b NEW: exact-substring dup spans (Lee et al.)
    "text_bm25_topk",  # r7b NEW: BM25 ranked retrieval
    "dedup_semdedup_ivf",  # r7b NEW: SemDeDup inside IVF buckets
    "mm_payload_entropy",  # r7: rowwise HOF histogram (explode removed)
    "mm_patch_byte_stats",  # r7: per-patch HOF stats (byte explode removed)
    "mm_wav_pcm_stats",  # r7: HOF sample stats + header-only hex decode
    "graph_triangle_count",  # r7: degree-ordered compact-forward
    "session_gaps_custom_close",  # r7 NEW: batch twin of the timeout kernel
    "dedup_pipeline_report",  # r7 NEW: 4-method dedup overlap matrix
    "calibration_quantile_fit",  # r7: flat-aggregate GD loop (same state)
    "calibration_platt_exact",  # r7: same GD rework + shared checkpoint
    "multimodal_frame_sample",  # r7: n_frames >= 1 empty-payload guard
    # --- edited after their last driver check (r6 verdict list #1) --------
    "io_clustered_stats_prune",  # post-r5 empty-keep-list guard
    "stacking_ridge_weights",  # post-r5 shared-constant touch
    "dedup_cluster_components",  # post-r4 shared-helper touch
    "agg_approx_sketches",  # post-r4 (rows-only by design)
    "stream_interval_join_views",  # post-r4 oracle touch
    "io_csv_roundtrip",  # post-r4 touch
    "calibration_platt",  # post-r4 (rows-only by design)
    "corpus_curation_pipeline",  # post-r4 touch
    "multimodal_decode_stub",  # post-r4 (rows-only by design)
    "ewm_pandas_per_series",  # post-r4 (rows-only by design)
    "clip_and_rewrite",  # post-r3 touch
    "store_coldstart_fallback",  # r2-latest + later touch
    "calibration_curve_bins",  # r2-latest + later touch
    "text_tfidf_topterms",  # r2-latest + later touch
    "customer_rfm_segments",  # r2-latest + later touch
    "join_range_price_band",  # r2-latest + later touch
    "unpivot_store_metrics",  # r2-latest + later touch
    "text_scrub_numbers",  # r2-latest + later touch
    "window_expanding_stats",  # r2-latest + later touch
    # --- oldest driver evidence: last checked in round 2 ------------------
    "metric_suite_global",
    "metric_abc_tiers",
    "heuristic_blend_forecast",
    "residual_diagnostics_store",
    "metric_wmape_weighted",
    "dedup_fuzzy_names",
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
    "binning_quantile_ntile",
    "window_lag_family",
    # ---- below the likely 50-cut: the remaining 11 r2-latest names queue
    # for the r8 rotation; everything in the registry is re-verified at
    # sf0.001 by tests/test_oracle_parity.py every session (and the whole
    # registry by the driver-sim sweep at sf0.01). -------------------------
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
