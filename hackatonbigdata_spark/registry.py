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
    # === ROUND 14 BUDGET (optimization round 1/2; 50-slot driver window) ===
    # Plan: (1) the 4 names REGISTERED mid-build after the r13 verdict and
    # never driver-checked lead (the weighted graph trio + the
    # planted-cluster ANN regime); (2) every query whose CODE PATH this
    # optimization round edited (the IVF broadcast retrofit, the
    # nprobe exact-side thread overlap, the MMR greedy fold, the rocchio
    # lazy checkpoints, the LPA linear-chain checkpoint drop, and the
    # _gann_walk executor-side fold) — semantics re-proved against the
    # oracle at sf0.01+sf0.001 before placement, the window check is the
    # audited re-proof; (3) the entire 27-name r7-latest ORACLED backlog
    # in registration order (the r13 verdict's #1: retires the r7 cohort);
    # (4) the 5 r7-latest rows-only names LAST — they record no_oracle by
    # documented design (allow-listed in tests/test_oracle_parity.py,
    # each independently pinned), so they spend window slots only after
    # every oracled proof has landed.  4+11+27+5 = 47 <= 50; the oldest
    # driver evidence moves to r8 if the window completes.
    # --- (1) registered mid-build, never driver-checked -------------------
    "similarity_graph_ann_clustered",  # r14 NEW: planted-cluster ANN regime
    "graph_label_propagation_weighted",  # r14 NEW: weighted LPA communities
    "graph_modularity_weighted",  # r14 NEW: weighted Newman Q
    "graph_pagerank_weighted",  # r14 NEW: strength-normalized PageRank
    # --- (2) optimization-round edits (oracle re-proved, window re-proof) --
    "similarity_graph_ann",  # r14 EDIT: _gann_walk -> one executor-side fold
    "similarity_graph_ann_nnd",  # r14 EDIT: same fold, fused variants
    "similarity_ivf_bucketed",  # r14 EDIT: bucket join -> broadcast coded side
    "similarity_ivf_kmeans",  # r14 EDIT: same broadcast retrofit
    "similarity_ivfpq_topk",  # r14 EDIT: ADC bucket-pair join -> broadcast
    "ann_recall_at_k",  # r14 EDIT: consumes the retrofitted IVF kernel
    "similarity_ivfpq_nprobe",  # r14 EDIT: exact side thread-overlapped
    "search_mmr_rerank",  # r14 EDIT: greedy loop -> executor-side fold
    "search_rocchio_feedback",  # r14: lazy checkpoints tried and REVERTED to
    #   eager (multi-referenced frames raced under one action) — window
    #   re-proof of the net-zero touch
    "graph_label_propagation",  # r14 EDIT: linear-chain checkpoint drop
    "graph_modularity_score",  # r14 EDIT: consumes the LPA chain
    # --- (3) the r7-latest oracled backlog, registration order ------------
    "dedup_cluster_components",
    "dedup_fuzzy_names",
    "text_scrub_numbers",
    "corpus_curation_pipeline",
    "dedup_substring_spans",
    "text_bm25_topk",
    "dedup_semdedup_ivf",
    "text_chunk_windows",
    "multimodal_frame_sample",
    "mm_patch_byte_stats",
    "mm_wav_pcm_stats",
    "scan_project_filter",
    "sample_scan",
    "filter_quantile_band",
    "filter_date_range_valid",
    "dedup_keep_first",
    "join_multiway_enrich",
    "join_anti_orphans",
    "join_semi_active_customers",
    "share_window_vs_join_back",
    "join_range_price_band",
    "clip_and_rewrite",
    "graph_triangle_count",
    "session_gaps_custom_close",
    "stream_interval_join_views",
    "stream_hourly_heavy_hitters",
    "window_expanding_stats",
    # --- (4) r7-latest rows-only names: placed last by design -------------
    "agg_approx_sketches",
    "calibration_platt",
    "corpus_bpe_merges",
    "multimodal_decode_stub",
    "ewm_pandas_per_series",
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
