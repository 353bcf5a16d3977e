"""Shared scalar/aggregate expression helpers.

These mirror the reference's hand-rolled numpy helpers as Catalyst
expressions (JVM-side, codegen'd — no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def r4(col: Column | str) -> Column:
    """Round to 4 decimals — the cross-engine float-stability convention.

    Aggregation order affects float sums; both the Spark query and the DuckDB
    oracle round identically so the driver's value-hash matches
    (SURVEY.md §7.4 item 4).
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c.cast("double"), 4)


def safe_div(num: Column, den: Column, eps: float = 1e-8) -> Column:
    """x/(y+eps) — the reference's pervasive safe-divide
    (/root/reference/src/features/business_features_engine.py:237-242)."""
    return num / (den + F.lit(eps))


def iso_dow(col: Column | str) -> Column:
    """ISO day of week, 1=Monday..7=Sunday.

    Spark's dayofweek() is 1=Sunday; DuckDB's is 0=Sunday.  Both engines use
    this ISO convention instead (oracle side: ``isodow(d)``).
    """
    c = F.col(col) if isinstance(col, str) else col
    return ((F.dayofweek(c) + 5) % 7) + 1


def wmape_expr(actual: Column, forecast: Column) -> Column:
    """WMAPE = sum(|actual - forecast|) / sum(|actual|) * 100.

    The reference's primary metric
    (/root/reference/src/evaluation/metrics.py:12-57) as a single
    distributed aggregate — partial aggregation happens map-side, so this is
    one shuffle of two doubles per partition at any scale.
    """
    return F.sum(F.abs(actual - forecast)) / F.sum(F.abs(actual)) * 100.0
