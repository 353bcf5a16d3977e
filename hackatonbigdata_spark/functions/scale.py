"""Skew and co-location utilities for the 100 TB path (SURVEY.md §4).

The reference's EDA shows heavy key skew — 5.3% of products carry 79.9% of
volume, one region 62% (/root/reference/src/features/
aggregation_features_engine.py:7-10).  AQE skew-join splitting (enabled in
the session factory) covers joins; these helpers cover the two remaining
cases:

- ``salted_agg``: two-phase aggregation for algebraic aggregates on skewed
  group keys — phase 1 aggregates (key, salt) so a hot key's rows spread
  over N reducers, phase 2 merges the N partials.  Results are identical to
  a direct groupBy (asserted by the oracle-matched ``salted_volume_by_part``
  query in operators/aggregates or tests).
- ``write_bucketed`` / bucketed joins: persist both join sides bucketed by
  the join key so repeated joins are shuffle-free (asserted by
  tests/test_scale.py on the physical plan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# algebraic aggregates: (phase-1 partial expr, phase-2 merge expr)
_MERGEABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    aggs: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation of ``value`` by ``keys``.

    ``aggs`` ⊆ {sum, count, min, max} (algebraic — mergeable partials; avg
    is derived as sum/count by the caller).  Output columns are named
    ``<agg>_value``.

    Phase 1 groups by (keys..., salt) — a key with 10⁹ rows becomes
    ``n_salts`` partial groups on different reducers; phase 2 merges
    ``n_salts`` rows per key, which is negligible.  Total: two shuffles,
    the first uniformly spread regardless of skew.
    """
    unknown = [a for a in aggs if a not in _MERGEABLE]
    if unknown:
        raise ValueError(f"non-algebraic aggregates {unknown}; supported: {sorted(_MERGEABLE)}")
    v = F.col(value) if isinstance(value, str) else value
    salted = df.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[_MERGEABLE[a][0](v).alias(f"_p_{a}") for a in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[_MERGEABLE[a][1](F.col(f"_p_{a}")).alias(f"{a}_value") for a in aggs]
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) external table.

    Two tables bucketed by the same columns into the same bucket count join
    WITHOUT a shuffle — the co-located join strategy for fact tables that
    are joined repeatedly on the same key at 100 TB (the write pays the
    shuffle once; every subsequent join is free)."""
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table_name)
    )
