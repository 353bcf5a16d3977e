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
    # === ROUND 6 BUDGET (50-slot driver window) ============================
    # 13 new-r6 + 18 never-checked r5b + 6 edited-oracle + 11 r1-stale = 48
    # of the 50 slots; the first 2 r2-stale names take the remainder.
    # CORRECTNESS_r05 confirmed the r5 window stopped at seq_path_trigrams,
    # so everything from anomaly_poisson_spikes down had NO driver evidence —
    # those 18 names lead right after the r6 additions, per the r5 verdict.
    # --- round 6: new queries (inserted as implemented) --------------------
    "calibration_quantile_fit",  # r6: fitted pinball-GD quantile regressors
    "mm_magic_format_detect",  # r6: magic-byte container survey
    "mm_payload_entropy",  # r6: byte-histogram entropy screen
    "mm_patch_byte_stats",  # r6: per-patch byte statistics
    "stacking_gbt_meta",  # r6: MLlib GBT meta-learner (rows-only)
    "eval_roc_auc",  # r6: exact Mann-Whitney ROC AUC per store
    "eval_brier_decomposition",  # r6: Murphy Brier decomposition
    "cv_purged_embargo",  # r6: purged K-fold CV with embargo
    "text_pii_scrub",  # r6: PII detection + redaction
    "graph_triangle_count",  # r6: triangles + clustering coefficient
    "basket_association_rules",  # r6: support/confidence/lift rules
    "dedup_containment_pairs",  # r6: asymmetric containment near-dup
    "corpus_softdedup_weights",  # r6: duplicate down-weighting report
    "join_asof_interpolate",  # r6: grid-aligned linear interpolation join
    "mm_wav_pcm_stats",  # r6: real PCM-WAV decode, oracled in SQL
    # --- r5b queries with NO driver evidence (r5 window cut at 50) ---------
    "anomaly_poisson_spikes",  # r5b: LOO Poisson rate-spike detection
    "text_zipf_slope",  # r5b: Zipf fit (r6: bucketed-rank rewrite)
    "quantile_normalize_store",  # r5b: grouped quantile normalization
    "io_schema_evolution",  # r5b: mergeSchema evolution roundtrip
    "ab_test_cuped",  # r5b: CUPED readout (r6: exact mean_post)
    "cohort_ltv_curve",  # r5b: cohort lifetime-value curve
    "window_cusum_changepoint",  # r5b: exact-integer CUSUM break detection
    "postproc_topdown_reconcile",  # r5b: integer top-down allocation
    "io_incremental_rollup",  # r5b: mergeable incremental view maintenance
    "queue_backlog_lindley",  # r5b: Lindley backlog in closed form
    "embedding_centroid_drift",  # r5b: vector-modality drift monitor
    "seasonal_strength_store",  # r5b: STL-lite seasonal strength
    "concentration_gini_brand",  # r5b: exact-rank Gini concentration
    "window_max_drawdown",  # r5b: peak-to-trough demand drawdown
    "orders_ship_sla",  # r5b: order-to-ship SLA compliance
    "ab_test_mannwhitney",  # r5b: tie-corrected rank test
    "alert_error_burnrate",  # r5b: multi-window burn-rate paging
    "sample_weighted_aexpj",  # r5b: deterministic weighted sampling
    # --- oracle/query edited since the name's last driver check ------------
    "stacking_predictions_join",  # refactored onto shared _OOF_SQL (r5)
    "feature_matrix_daily_store",  # refactored onto shared _FM_CTES (r5)
    "monthly_store_volume",  # r3-checked; month-trunc oracle edit (r4)
    "postproc_lifecycle_promo",  # r1-checked; promo oracle edit (r4)
    "embedding_quantize_int8",  # r4-checked; zero-range guard edit (r5 f39baf5)
    "drift_performance_periods",  # r5-checked; F.round->r4 fix (r6)
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
    # --- r2-stale backlog: burn down across r6/r7 as slots allow -----------
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
    # ---- below the likely 50-cut: everything here is re-verified at
    # sf0.001 by tests/test_oracle_parity.py every session (and the whole
    # registry by the driver-sim sweep at sf0.01), so never-checked and
    # edited-oracle names outrank stale-but-green ones. ---------------------
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
