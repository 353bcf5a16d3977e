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
    # === ROUND 12 BUDGET (50-slot driver window) ===========================
    # Plan: (1) every name whose code is new or edited in r12 leads — 4 new
    # operators (all fully oracled: the graph-ANN index, merge-on-read
    # compaction, snapshot time travel, the KLL quantile sketch) + 2
    # edited-after-check names (io_zorder_prune: the _morton_spread input
    # mask; search_mmr_rerank: the oracle's redundancy-max lookup hardened
    # to a LEFT join with COALESCE so a sparsified sim pool can't silently
    # filter candidates — semantics unchanged today, re-proved this round);
    # (2) the ENTIRE 44-name r6-latest backlog (r11 verdict "missing" #1)
    # is retired — 43 oracled names in registration order, the one
    # rows-only name (stacking_gbt_meta) last.  6 + 44 fills the window
    # exactly.  r12 landed TWENTY-EIGHT further operators beyond the
    # window budget (io_time_travel_changes, io_equality_deletes,
    # similarity_nndescent_build, stream_interval_join_full_outer,
    # pareto_skyline_parts, attribution_markov_removal,
    # io_bloom_skip_lookup, trend_theilsen_brand, tokenizer_unigram_em,
    # sketch_kll_merge_daily, ab_test_chi2_independence,
    # tokenizer_unigram_encode, ab_test_power_mde, graph_link_prediction,
    # io_snapshot_expire, metric_mase_seasonal_naive,
    # explain_linear_contributions, graph_kcore_decomposition,
    # search_rocchio_feedback, eval_pr_auc, metric_pinball_loss,
    # decompose_stl_residuals, graph_eigencentrality, ab_test_srm_check,
    # window_changepoint_binseg, eval_ndcg_retrieval,
    # encode_feature_hashing, calibration_ece_summary — ALL fully
    # oracled, each pinned by an
    # independent pure-Python/numpy test and driver-sim-proven at sf0.01
    # under UTC and America/New_York); per this plan's carry rule they
    # sit at positions 51+ and LEAD the r13 window.  After this rotation
    # the oldest driver evidence is r7; the r13 window should lead with
    # those twenty-eight carried names plus r13-new/edited names (28 +
    # new fills most of the window), then spend any remaining slots on
    # the r7-latest backlog in registration order (oracled first),
    # carrying the rest to r14 exactly as this note does.
    # --- round 12: new queries -------------------------------------------
    "similarity_graph_ann",  # r12 NEW: k-NN graph + fixed-beam greedy search
    "io_mor_compact",  # r12 NEW: merge-on-read delete-file compaction
    "io_time_travel",  # r12 NEW: manifest-versioned snapshot reads
    "sketch_kll_quantiles",  # r12 NEW: bounded quantile sketch, oracled twin
    # --- round 12: edited-after-check code --------------------------------
    "io_zorder_prune",  # r12: _morton_spread input mask (ADVICE #1)
    "search_mmr_rerank",  # r12: oracle redundancy-max left-join hardening
    # --- r6-latest backlog: all 44, retired this round (oracled first) ----
    "monthly_store_volume",
    "ab_test_cuped",
    "concentration_gini_brand",
    "ab_test_mannwhitney",
    "drift_performance_periods",
    "corr_matrix_top_parts",
    "postproc_outlier_dampening",
    "cv_hierarchical_folds",
    "feature_matrix_daily_store",
    "calibration_interval_coverage",
    "prophet_prep_segments",
    "postproc_lifecycle_promo",
    "stacking_predictions_join",
    "postproc_topdown_reconcile",
    "eval_roc_auc",
    "eval_brier_decomposition",
    "cv_purged_embargo",
    "io_schema_evolution",
    "io_incremental_rollup",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "similarity_ivf_bucketed",
    "embedding_quantize_int8",
    "text_zipf_slope",
    "embedding_centroid_drift",
    "text_pii_scrub",
    "dedup_containment_pairs",
    "corpus_softdedup_weights",
    "mm_magic_format_detect",
    "sample_weighted_aexpj",
    "quantile_normalize_store",
    "anomaly_poisson_spikes",
    "cohort_ltv_curve",
    "basket_association_rules",
    "alert_error_burnrate",
    "join_asof_interpolate",
    "window_cusum_changepoint",
    "queue_backlog_lindley",
    "seasonal_strength_store",
    "window_max_drawdown",
    "orders_ship_sla",
    # --- r6-latest rows-only name (weaker rows-only check) ----------------
    "stacking_gbt_meta",
    # --- r12 overflow: carried to lead the r13 window (positions 51+) -----
    "io_time_travel_changes",  # r12 NEW: incremental changes-between read
    "io_equality_deletes",  # r12 NEW: Iceberg-style key-valued deletes
    "similarity_nndescent_build",  # r12 NEW: sub-quadratic k-NN graph build
    "stream_interval_join_full_outer",  # r12 NEW: both-flank outer interval join
    "pareto_skyline_parts",  # r12 NEW: 2-D skyline via per-price prefix max
    "attribution_markov_removal",  # r12 NEW: absorbing-chain removal effects
    "io_bloom_skip_lookup",  # r12 NEW: per-file Bloom index point-lookup skipping
    "trend_theilsen_brand",  # r12 NEW: robust median-of-slopes trend
    "tokenizer_unigram_em",  # r12 NEW: oracled unigram-LM tokenizer (2 EM rounds)
    "sketch_kll_merge_daily",  # r12 NEW: level-wise KLL sketch merge read
    "ab_test_chi2_independence",  # r12 NEW: contingency chi-square + Cramér V
    "tokenizer_unigram_encode",  # r12 NEW: per-source apply of the unigram vocab
    "ab_test_power_mde",  # r12 NEW: MDE + achieved power, A&S normal CDF
    "graph_link_prediction",  # r12 NEW: CN/Adamic-Adar/Jaccard non-edge scores
    "io_snapshot_expire",  # r12 NEW: snapshot expiry + orphan-file vacuum
    "metric_mase_seasonal_naive",  # r12 NEW: Hyndman scaled error vs lag-7 naive
    "explain_linear_contributions",  # r12 NEW: exact linear-SHAP attribution
    "graph_kcore_decomposition",  # r12 NEW: capped k-core peel, fixed-round oracle
    "search_rocchio_feedback",  # r12 NEW: pseudo-relevance feedback retrieval eval
    "eval_pr_auc",  # r12 NEW: average precision + lift, block-exact
    "metric_pinball_loss",  # r12 NEW: quantile scoring rule + coverage gap
    "decompose_stl_residuals",  # r12 NEW: trend/seasonal/residual + 2-sigma flags
    "graph_eigencentrality",  # r12 NEW: integer power-method top eigenvector
    "ab_test_srm_check",  # r12 NEW: sample-ratio-mismatch guardrail
    "window_changepoint_binseg",  # r12 NEW: exact single-split localization
    "eval_ndcg_retrieval",  # r12 NEW: NDCG@5 / precision@5 / MRR, integer-exact
    "encode_feature_hashing",  # r12 NEW: signed hashing trick + collision report
    "calibration_ece_summary",  # r12 NEW: ECE/MCE reliability summary
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
