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
    # === ROUND 11 BUDGET (50-slot driver window) ===========================
    # Plan: (1) every name whose code is new or edited in r11 leads — 6 new
    # operators (all fully oracled) + 5 edited-after-check names (the
    # z-order Morton-spread/date-scaling fix, and the four sketch twins
    # whose constants/oracle fragments moved into sketch_params.py /
    # gained prefix parameters — all re-verified byte-identical or
    # re-parity-checked this round); (2) the ENTIRE 39-name r5-latest
    # backlog (r10 verdict "missing" #1) is retired — 36 oracled names in
    # registration order, the 3 kernel names last (agg_sketches_only is
    # rows-only by design; the croston/AR(2) per-series kernels carry
    # oracles).  11 + 39 fills
    # the window exactly.  After this rotation the oldest driver evidence
    # is r6; the r12 window should lead with r12-new/edited names and then
    # burn the r6-latest backlog in registration order (oracled first).
    # --- round 11: new queries -------------------------------------------
    "similarity_ivfpq_nprobe",  # r11 NEW: multi-probe composed IVF-PQ search
    "stream_interval_join_outer",  # r11 NEW: left-outer interval join twin
    "stream_hll_returning_users",  # r11 NEW: HLL inclusion-exclusion set op
    "search_mmr_rerank",  # r11 NEW: greedy MMR diversified re-rank
    "sketch_kmv_overlap",  # r11 NEW: exact-under-budget bottom-k overlap
    "io_mor_deletes",  # r11 NEW: merge-on-read positional delete files
    # --- round 11: edited-after-check code --------------------------------
    "io_zorder_prune",  # r11: Morton spread landed + date domain scaling
    "stream_hourly_hll",  # r11: constants hoisted to sketch_params
    "stream_hll_daily_merge",  # r11: constants hoisted to sketch_params
    "stream_hourly_bloom",  # r11: constants hoisted to sketch_params
    "dedup_bloom_gate",  # r11: constants hoisted to sketch_params
    # --- r5-latest backlog: all 39, retired this round (oracled first) ----
    "audit_benford_digits",
    "drift_psi_distribution",
    "calibration_conformal",
    "ensemble_dynamic_weights",
    "feature_importance_topk",
    "calibration_temperature",
    "calibration_quantile_band",
    "calibration_subsample_uncertainty",
    "eval_confusion_by_store",
    "eval_decile_lift",
    "io_partitioned_prune",
    "io_bucketed_join",
    "dedup_cluster_largestar",
    "corpus_mixture_weights",
    "dedup_report_by_source",
    "ann_recall_at_k",
    "text_dupgram_fraction",
    "dedup_incremental_vs_snapshot",
    "corpus_resample_ncopies",
    "sample_reservoir_per_group",
    "anomaly_mad_flags",
    "join_salted_skew",
    "encode_target_oof",
    "seq_event_transitions",
    "interval_merge_coverage",
    "graph_pagerank_parts",
    "window_rolling_distinct",
    "time_weighted_avg",
    "attribution_multitouch_linear",
    "survival_km_signup_purchase",
    "seq_path_trigrams",
    "croston_ses_sql",
    "ar2_yule_walker_sql",
    "cdc_scd2_user_state",
    "snapshot_table_diff",
    "window_rank_movers",
    # --- r5-latest kernel names (agg_sketches_only: rows-only check) ------
    "agg_sketches_only",
    "croston_per_series",
    "ar2_yule_walker_per_series",
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
