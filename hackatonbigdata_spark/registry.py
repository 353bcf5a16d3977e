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


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_all()
    return dict(_ORACLES)
