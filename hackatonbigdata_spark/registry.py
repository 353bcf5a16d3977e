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
    # === ROUND 13 BUDGET (50-slot driver window) ===========================
    # Plan (exactly the r12 carry rule + the r12 verdict's #1): (1) the 28
    # r12-overflow names lead in their carried order — every one fully
    # oracled, each independently pinned; four of them are ALSO r13-edited
    # code (tokenizer_unigram_encode: the per-distinct-word Viterbi moved
    # from a driver loop to an executor-side SQL fold; io_snapshot_expire:
    # manifest swap now precedes the orphan deletes; graph_kcore_
    # decomposition: convergence accepted after the final filter pass;
    # ab_test_power_mde: s2 accumulated in decimal(38,0); and
    # similarity_nndescent_build: its build core factored into the shared
    # _nnd_build helper) so their window check doubles as the edited-name
    # re-proof.  (2) r13 new/edited names: 3 NEW operators
    # (similarity_graph_ann_nnd — the composed build-then-search recall
    # decomposition; io_partition_evolution — spec-A/spec-B layout
    # evolution with per-generation pruning; mm_ppm_resize — box-filter
    # downsample of the decoded PPM) and 2 edited names not already in
    # the window (similarity_graph_ann: walk factored into the shared
    # _gann_walk helper the composed query reuses, gaining fused
    # multi-variant support — semantics unchanged, re-proven;
    # ab_test_welch: the same decimal(38,0) s2 fix as power_mde).
    # (3) the remaining 15 slots retire the HEAD of the
    # 47-name r7-latest backlog in registration order (oracled first).
    # After this window the oldest driver evidence is r7 with 32 names
    # left (27 oracled + 5 rows-only); r14 should lead with any new/edited
    # names, then continue the r7 backlog from 'dedup_cluster_components'
    # in registration order, then start the r8-latest backlog.
    # --- r12 overflow: carried names lead (positions 1-28) ----------------
    "io_time_travel_changes",  # r12 NEW: incremental changes-between read
    "io_equality_deletes",  # r12 NEW: Iceberg-style key-valued deletes
    "similarity_nndescent_build",  # r12 NEW (+r13 refactor): sub-quadratic build
    "stream_interval_join_full_outer",  # r12 NEW: both-flank outer interval join
    "pareto_skyline_parts",  # r12 NEW: 2-D skyline via per-price prefix max
    "attribution_markov_removal",  # r12 NEW: absorbing-chain removal effects
    "io_bloom_skip_lookup",  # r12 NEW: per-file Bloom index point-lookup skipping
    "trend_theilsen_brand",  # r12 NEW: robust median-of-slopes trend
    "tokenizer_unigram_em",  # r12 NEW: oracled unigram-LM tokenizer (2 EM rounds)
    "sketch_kll_merge_daily",  # r12 NEW: level-wise KLL sketch merge read
    "ab_test_chi2_independence",  # r12 NEW: contingency chi-square + Cramér V
    "tokenizer_unigram_encode",  # r12 NEW + r13 EDIT: executor-side Viterbi fold
    "ab_test_power_mde",  # r12 NEW + r13 EDIT: decimal(38,0) s2 accumulation
    "graph_link_prediction",  # r12 NEW: CN/Adamic-Adar/Jaccard non-edge scores
    "io_snapshot_expire",  # r12 NEW + r13 EDIT: manifest swap before deletes
    "metric_mase_seasonal_naive",  # r12 NEW: Hyndman scaled error vs lag-7 naive
    "explain_linear_contributions",  # r12 NEW: exact linear-SHAP attribution
    "graph_kcore_decomposition",  # r12 NEW + r13 EDIT: final-pass convergence
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
    # --- round 13: new queries ---------------------------------------------
    "similarity_graph_ann_nnd",  # r13 NEW: walk over the NND graph vs exact graph
    "io_partition_evolution",  # r13 NEW: spec evolution, per-generation pruning
    "mm_ppm_resize",  # r13 NEW: box-filter downsample of the decoded PPM
    "graph_label_propagation",  # r13 NEW: synchronous LPA communities
    "graph_modularity_score",  # r13 NEW: Newman Q of the LPA partition
    # --- round 13: edited-after-check code (not already in the window) ----
    "similarity_graph_ann",  # r13: walk factored into _gann_walk (fused variants)
    "ab_test_welch",  # r13: decimal(38,0) s2 accumulation (ADVICE #3)
    # --- r7-latest backlog: first 15 in registration order (all oracled) --
    "unpivot_store_metrics",
    "metric_suite_global",
    "metric_abc_tiers",
    "heuristic_blend_forecast",
    "store_coldstart_fallback",
    "residual_diagnostics_store",
    "calibration_curve_bins",
    "metric_wmape_weighted",
    "customer_rfm_segments",
    "stacking_ridge_weights",
    "calibration_platt_exact",
    "calibration_quantile_fit",
    "io_csv_roundtrip",
    "io_clustered_stats_prune",
    "text_tfidf_topterms",
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
