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
    # === ROUND 15 BUDGET (optimization round 2/2; 50-slot driver window) ===
    # Plan: (1) every query whose CODE PATH this round touched leads — the
    # _gann_walk guard/NULLS-LAST comparator (3 consumers), the _nnd_build
    # per-round checkpoint fusion (build + 2 composed consumers), and the
    # rocchio net-zero touch (respread/broadcast candidates measured and
    # rejected) — each re-proved against the oracle at sf0.001+sf0.01
    # (UTC and America/New_York) before placement; the window check is
    # the audited re-proof.  (2) the entire 26-name
    # r8-latest ORACLED backlog in registration order (the r14 verdict's
    # item 8: the rotation moves to the r8 cohort).  (3) the 4 r9-latest
    # names not re-verified since r9 (similarity_ivfpq_topk already sat in
    # the r14 window).  (4) the r8 rows-only name LAST (corpus_bpe_encode
    # records no_oracle by documented design, allow-listed in
    # tests/test_oracle_parity.py and pinned end-to-end in
    # tests/test_r8_semantics.py).  5+26+4+1 = 36 <= 50; the oldest driver
    # evidence moves to r10 next rotation.
    # --- (1) r15 optimization-round edits (oracle re-proved) --------------
    "similarity_graph_ann",  # r15 EDIT: map guard + NULLS-LAST comparator
    "similarity_graph_ann_nnd",  # r15 EDIT: same walk + fused NND rounds
    "similarity_graph_ann_clustered",  # r15 EDIT: same walk + fused rounds
    "similarity_nndescent_build",  # r15 EDIT: 1 eager ckpt/round, not 2
    "search_rocchio_feedback",  # r15: respread + broadcast(mu) tried and
    #   REJECTED (plan-identical / flat A/B) — window re-proof of the
    #   net-zero touch (comment-only change at the qf construction)
    # --- (2) the r8-latest oracled backlog, registration order ------------
    "corpus_novelty_curve",
    "text_winnowing_stats",
    "corpus_cross_source_overlap",
    "corpus_ccnet_buckets",
    "corpus_vocab_coverage",
    "dedup_chunk_hashes",
    "similarity_matryoshka_eval",
    "similarity_hamming_binary",
    "corpus_dsir_weights",
    "dedup_lsh_calibration",
    "corpus_mixture_temperature",
    "corpus_vocab_growth",
    "search_hybrid_rrf",
    "corpus_source_report",
    "corpus_source_kl",
    "dedup_chunk_incremental",
    "embedding_int8_ranking",
    "dedup_savings_report",
    "quality_classifier_gd",
    "dedup_bloom_gate",
    "corpus_budget_selection",
    "stream_hourly_distinct",
    "stream_hourly_sample",
    "stream_user_trailing_count",
    "stream_hourly_cms",
    "stream_hourly_value_quantiles",
    # --- (3) r9-latest names without driver evidence since r9 -------------
    "dedup_lines_ccnet",
    "embedding_pq_eval",
    "mm_ppm_pixel_stats",
    "stream_hourly_bloom",
    # --- (4) r8 rows-only name: placed last by design ----------------------
    "corpus_bpe_encode",
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
