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
    # === ROUND 8 BUDGET (50-slot driver window) ============================
    # Plan: (1) every name whose code is new or edited in r8 leads (32
    # names by round end); (2) the ENTIRE 18-name r2-latest backlog (r7
    # verdict "missing" #1) is retired — that fills the window exactly;
    # the 39 r3-latest names (all oracled) queue for the r9 rotation.
    # Oracled names outrank rows-only names of equal staleness (r7
    # verdict "wrong" #1) — the one rows-only r8 name (corpus_bpe_encode)
    # sits last in the r8-edited block for exactly that reason.
    # --- round 8: new queries and edited-after-r7-check code --------------
    "corpus_vocab_coverage",  # r8 NEW: top-K vocab coverage sizing report
    "corpus_novelty_curve",  # r8 NEW: first-occurrence novelty by doc order
    "text_winnowing_stats",  # r8 NEW: robust winnowing fingerprints
    "corpus_cross_source_overlap",  # r8 NEW: cross-source leakage matrix
    "corpus_ccnet_buckets",  # r8 NEW: CCNet per-source LM terciles
    "text_bigram_logprob",  # r8: score core factored into _bigram_nl_scores
    "quality_classifier_gd",  # r8 NEW: exact-GD logistic quality classifier
    "stream_hourly_cms",  # r8 NEW: exact twin of the count-min kernel
    "dedup_bloom_gate",  # r8 NEW: Bloom-filter ingestion gate
    "stream_hourly_value_quantiles",  # r8 NEW: exact twin, histogram kernel
    "corpus_budget_selection",  # r8 NEW: token-budget greedy selection
    "dedup_savings_report",  # r8 NEW: token savings per dedup policy
    "embedding_int8_ranking",  # r8 NEW: int8 retrieval fidelity eval
    "dedup_chunk_incremental",  # r8 NEW: ingestion-gate chunk dedup
    "corpus_source_kl",  # r8 NEW: per-source KL vs corpus unigrams
    "corpus_source_report",  # r8 NEW: per-source curation dashboard
    "search_hybrid_rrf",  # r8 NEW: BM25 + cosine reciprocal-rank fusion
    "stream_user_trailing_count",  # r8 NEW: exact twin of the DGIM kernel
    "corpus_vocab_growth",  # r8 NEW: Heaps-law vocabulary growth curve
    "stream_hourly_sample",  # r8 NEW: exact twin of the bottom-k kernel
    "dedup_lsh_calibration",  # r8 NEW: MinHash estimator calibration
    "dedup_minhash_lsh",  # r8: candidate generation split into shared helper
    "corpus_mixture_temperature",  # r8 NEW: temperature-sampled mixture
    "similarity_matryoshka_eval",  # r8 NEW: truncation retrieval ablation
    "similarity_hamming_binary",  # r8 NEW: sign-bit Hamming retrieval eval
    "corpus_dsir_weights",  # r8 NEW: DSIR importance weighting
    "stream_hourly_distinct",  # r8 NEW: exact twin of the KMV stream kernel
    "dedup_chunk_hashes",  # r8 NEW: chunk-level dedup over chunk hashes
    "mm_payload_entropy",  # r8: order-free 1e-4-grid entropy fold
    "text_gopher_rules",  # r8: quantized r_symbol band edge
    "dedup_pipeline_report",  # r8: broadcast hints dropped (AQE decides)
    "corpus_bpe_encode",  # r8 NEW: BPE application (rows-only, pinned)
    # --- r2-latest backlog: all 18, retired this round --------------------
    "union_slices",
    "topk_orders_by_value",
    "cooccurrence_pairs",
    "join_integrity_check",
    "data_quality_profile",
    "binning_quantile_ntile",
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
    # --- oldest remaining evidence: the 39 r3-latest names (~26 fit the
    #     window; the tail below the cut queues for the r9 rotation) ------
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
