"""M5+ — model/data drift monitoring, distributed (SURVEY.md §2.9 adjunct).

The reference ships a full drift-detection suite that compares a reference
window against the current window in numpy
(/root/reference/src/evaluation/model_diagnostics.py:96-260: performance
degradation, feature/target distribution shift, prediction drift).  This
module re-expresses the two load-bearing detectors as oracled queries:

- ``drift_psi_distribution`` — Population Stability Index per metric column
  (quintile bins frozen on the reference window, log2 units, per-bin
  contributions integer-quantized so the sum is partition-order-free);
- ``drift_performance_periods`` — per-month WMAPE against the frozen
  reference-window WMAPE with a degradation ratio + alert flag.

Both partition the data by a date cutoff (reference vs current), mirroring
``set_reference_data`` / ``detect_drift`` in the reference, but as one lazy
DAG with no stored state: at 100 TB the reference stats are a broadcast
scalar row, never a driver-side ndarray.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.functions.core import r4
from hackatonbigdata_spark.registry import register

_CUTOFF = "1997-01-01"


def _psi_sql(col: str, label: str) -> str:
    """One PSI pipeline for one metric column (DuckDB side)."""
    return f"""
  SELECT '{label}' AS metric_col, r.n_ref, c.n_cur,
         round(psum.s / 1000000.0, 4) AS psi_bits,
         psum.s / 1000000.0 > 0.25 AS drift_flag
  FROM (
    SELECT CAST(sum(q) AS BIGINT) AS s FROM (
      SELECT CAST(floor((cs - rs) * log2(cs / rs) * 1000000 + 0.5) AS BIGINT) AS q
      FROM (
        SELECT greatest(rcnt * 1.0 / greatest(sum(rcnt) OVER (), 1), 0.0001) AS rs,
               greatest(ccnt * 1.0 / greatest(sum(ccnt) OVER (), 1), 0.0001) AS cs
        FROM (
          SELECT b,
                 sum(CASE WHEN period = 'ref' THEN 1 ELSE 0 END) AS rcnt,
                 sum(CASE WHEN period = 'cur' THEN 1 ELSE 0 END) AS ccnt
          FROM (
            SELECT CASE WHEN l_shipdate < TIMESTAMP '{_CUTOFF}'
                        THEN 'ref' ELSE 'cur' END AS period,
                   1 + (CASE WHEN {col} > e.q1 THEN 1 ELSE 0 END)
                     + (CASE WHEN {col} > e.q2 THEN 1 ELSE 0 END)
                     + (CASE WHEN {col} > e.q3 THEN 1 ELSE 0 END)
                     + (CASE WHEN {col} > e.q4 THEN 1 ELSE 0 END) AS b
            FROM lineitem CROSS JOIN (
              SELECT floor(quantile_cont({col}, 0.2) * 10000 + 0.5) / 10000 AS q1,
                     floor(quantile_cont({col}, 0.4) * 10000 + 0.5) / 10000 AS q2,
                     floor(quantile_cont({col}, 0.6) * 10000 + 0.5) / 10000 AS q3,
                     floor(quantile_cont({col}, 0.8) * 10000 + 0.5) / 10000 AS q4
              FROM lineitem WHERE l_shipdate < TIMESTAMP '{_CUTOFF}'
            ) e
          )
          GROUP BY b
        )
      )
    )
  ) psum
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM lineitem
              WHERE l_shipdate < TIMESTAMP '{_CUTOFF}') r
  CROSS JOIN (SELECT CAST(count(*) AS BIGINT) AS n_cur FROM lineitem
              WHERE l_shipdate >= TIMESTAMP '{_CUTOFF}') c
"""


@register(
    "drift_psi_distribution",
    oracle=f"{_psi_sql('l_quantity', 'l_quantity')}UNION ALL{_psi_sql('l_extendedprice', 'l_extendedprice')}",
)
def drift_psi_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per metric column: freeze quintile edges
    on the reference window (ship dates before {cutoff}), bin both windows
    with those edges, and score the share shift per bin — the standard
    distribution-drift monitor, replacing the reference's numpy
    feature/target drift pass
    (/root/reference/src/evaluation/model_diagnostics.py:180-260) with one
    distributed DAG per column.

    PSI here is in log2 units (bits) with the conventional 1e-4 share
    floor; the 0.25-bit flag threshold sits between the classic 0.1/0.25
    warn/act levels.  Cross-engine exactness: bin counts are integers,
    shares divide identical BIGINTs, and each bin's PSI term is quantized
    to a BIGINT 1e-6 grid before summing (the ``text_unigram_logprob``
    discipline), so the statistic is partition-order-free.

    Scale: per column — one scalar quantile row (broadcast), one keyed
    5-bin aggregate over a single scan carrying a period tag.  Reference
    stats never land on the driver; the 100 TB swap is
    ``percentile_approx`` for the frozen edges."""
    t = Catalog(spark, sf_dir)
    cutoff = F.lit(_CUTOFF).cast("timestamp")

    def one(col: str) -> DataFrame:
        ref = t.lineitem.filter(F.col("l_shipdate") < cutoff)
        edges = ref.agg(
            *[
                r4(F.percentile(col, F.lit(q))).alias(f"q{i}")
                for i, q in enumerate((0.2, 0.4, 0.6, 0.8), start=1)
            ]
        )
        b = F.lit(1)
        for i in range(1, 5):
            b = b + F.when(F.col(col) > F.col(f"q{i}"), 1).otherwise(0)
        binned = t.lineitem.crossJoin(F.broadcast(edges)).select(
            F.when(F.col("l_shipdate") < cutoff, "ref").otherwise("cur").alias(
                "period"
            ),
            b.alias("b"),
        )
        counts = binned.groupBy("b").agg(
            F.sum(F.when(F.col("period") == "ref", 1).otherwise(0)).alias("rcnt"),
            F.sum(F.when(F.col("period") == "cur", 1).otherwise(0)).alias("ccnt"),
        )
        tot = counts.agg(
            F.sum("rcnt").alias("rtot"), F.sum("ccnt").alias("ctot")
        )
        # greatest(total, 1) guard: an empty window (cutoff outside the
        # data's date range) must yield finite shares, not inf/NULL
        shares = counts.crossJoin(F.broadcast(tot)).select(
            F.greatest(
                F.col("rcnt") * F.lit(1.0) / F.greatest(F.col("rtot"), F.lit(1)),
                F.lit(0.0001),
            ).alias("rs"),
            F.greatest(
                F.col("ccnt") * F.lit(1.0) / F.greatest(F.col("ctot"), F.lit(1)),
                F.lit(0.0001),
            ).alias("cs"),
        )
        psum = shares.select(
            F.floor(
                (F.col("cs") - F.col("rs"))
                * F.log2(F.col("cs") / F.col("rs"))
                * F.lit(1000000)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("q")
        ).agg(F.sum("q").alias("s"))
        nr = ref.agg(F.count(F.lit(1)).alias("n_ref"))
        nc = t.lineitem.filter(F.col("l_shipdate") >= cutoff).agg(
            F.count(F.lit(1)).alias("n_cur")
        )
        return (
            psum.crossJoin(F.broadcast(nr))
            .crossJoin(F.broadcast(nc))
            .select(
                F.lit(col).alias("metric_col"),
                "n_ref",
                "n_cur",
                r4(F.col("s") / F.lit(1000000.0)).alias("psi_bits"),
                (F.col("s") / F.lit(1000000.0) > F.lit(0.25)).alias("drift_flag"),
            )
        )

    return one("l_quantity").union(one("l_extendedprice"))


drift_psi_distribution.__doc__ = drift_psi_distribution.__doc__.replace(
    "{cutoff}", _CUTOFF
)


@register(
    "drift_performance_periods",
    oracle=f"""
WITH f0 AS (
  SELECT l_shipdate, l_quantity AS actual,
         CASE WHEN rm_lag IS NULL THEN NULL
              ELSE sign(rm_lag) * (floor(abs(rm_lag) * 10000 + 0.5) / 10000)
         END AS forecast
  FROM (
    SELECT l_suppkey, l_shipdate, l_quantity,
           lag(rm) OVER (PARTITION BY l_suppkey
                         ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rm_lag
    FROM (
      SELECT l_suppkey, l_shipdate, l_orderkey, l_linenumber, l_quantity,
             avg(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS rm
      FROM lineitem
    )
  )
), f AS (SELECT * FROM f0 WHERE forecast IS NOT NULL),
ref AS (
  SELECT round(sum(abs(actual - forecast)) / sum(abs(actual)) * 100, 4)
           AS wmape_ref
  FROM f WHERE l_shipdate < TIMESTAMP '{_CUTOFF}'
)
SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
       CAST(month(l_shipdate) AS INTEGER) AS mth,
       CAST(count(*) AS BIGINT) AS n_rows,
       round(sum(abs(actual - forecast)) / sum(abs(actual)) * 100, 4) AS wmape,
       ref.wmape_ref,
       round(round(sum(abs(actual - forecast)) / sum(abs(actual)) * 100, 4)
             / ref.wmape_ref, 4) AS degradation_ratio,
       round(sum(abs(actual - forecast)) / sum(abs(actual)) * 100, 4)
         / ref.wmape_ref > 1.2 AS drift_alert
FROM f CROSS JOIN ref
WHERE l_shipdate >= TIMESTAMP '{_CUTOFF}'
GROUP BY 1, 2, ref.wmape_ref
""",
)
def drift_performance_periods(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Performance-degradation drift: the frozen reference-window WMAPE vs
    per-month current WMAPE, with a >1.2× degradation alert — the
    ``performance_degradation`` detector from the reference's drift suite
    (/root/reference/src/evaluation/model_diagnostics.py:176-215,
    drift flagged when the error ratio breaches a configured threshold),
    distributed as one scan + two aggregates.

    Scale: the reference WMAPE is a broadcast scalar; the monthly grain is
    a keyed aggregate.  Nothing is stored between runs — pointing the
    cutoff at "deploy date" and the scan at a streaming-appended fact
    table makes this the scheduled monitoring query."""
    from hackatonbigdata_spark.operators.forecast import _with_forecast

    t = Catalog(spark, sf_dir)
    cutoff = F.lit(_CUTOFF).cast("timestamp")
    f = _with_forecast(t).filter(F.col("forecast").isNotNull())
    # r4, NOT F.round: the DuckDB oracle's round(x,4) matches r4's
    # half-away-from-zero on the exact binary value, while Spark's round
    # does HALF_UP on the shortest decimal repr (functions/core.py:r4).
    wm = lambda df: r4(  # noqa: E731 — shared WMAPE shorthand
        F.sum(F.abs(F.col("actual") - F.col("forecast")))
        / F.sum(F.abs(F.col("actual")))
        * 100
    )
    ref = f.filter(F.col("l_shipdate") < cutoff).agg(wm(f).alias("wmape_ref"))
    cur = (
        f.filter(F.col("l_shipdate") >= cutoff)
        .groupBy(
            F.year("l_shipdate").cast("int").alias("yr"),
            F.month("l_shipdate").cast("int").alias("mth"),
        )
        .agg(F.count(F.lit(1)).alias("n_rows"), wm(f).alias("wmape"))
    )
    return cur.crossJoin(F.broadcast(ref)).select(
        "yr",
        "mth",
        "n_rows",
        "wmape",
        "wmape_ref",
        r4(F.col("wmape") / F.col("wmape_ref")).alias("degradation_ratio"),
        (F.col("wmape") / F.col("wmape_ref") > F.lit(1.2)).alias("drift_alert"),
    )
