"""M1 — relational core: scans, filters, joins, dedup, set ops, top-k.

Reimplements the reference's relational surface (SURVEY.md §2.1-2.3, 2.6,
2.7) Spark-first.  Each query is registered with a DuckDB oracle.  Scale
notes per query live in the docstrings; the shared principles:

- dimension joins broadcast (part/supplier/nation/region are tiny vs the
  fact table at any scale — the reference hand-rolled this as per-key dict
  maps, /root/reference/src/utils/data_loader.py:320-421);
- "keep-first" dedup gets an explicit deterministic tie-break (Spark has no
  file order; /root/reference/src/data/clean_data.py:140-147);
- quantile thresholds are computed inside the query (scalar-aggregate
  cross join) so the plan stays one distributed DAG, no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.functions.core import r4
from hackatonbigdata_spark.registry import register


@register(
    "flagship_weekly_brand_demand",
    oracle="""
WITH base AS (
  SELECT CAST(year(l_shipdate) AS INTEGER) AS yr,
         CAST(weekofyear(l_shipdate) AS INTEGER) AS wk,
         coalesce(p_brand, 'Unknown') AS brand,
         l_quantity
  FROM lineitem LEFT JOIN part ON l_partkey = p_partkey
  WHERE l_quantity >= 0 AND l_quantity <= 50
), agg AS (
  SELECT yr, wk, brand,
         round(sum(l_quantity), 4) AS sum_qty,
         round(avg(l_quantity), 4) AS avg_qty,
         round(stddev_samp(l_quantity), 4) AS std_qty,
         count(*) AS n_rows
  FROM base GROUP BY yr, wk, brand
), ranked AS (
  SELECT *,
         round(sum_qty / sum(sum_qty) OVER (PARTITION BY yr, wk), 4) AS wk_share,
         CAST(rank() OVER (PARTITION BY yr, wk
                           ORDER BY sum_qty DESC, brand) AS BIGINT) AS brand_rank
  FROM agg
)
SELECT yr, wk, brand, sum_qty, avg_qty, std_qty, n_rows, wk_share, brand_rank
FROM ranked WHERE brand_rank <= 5
""",
)
def flagship_weekly_brand_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: weekly demand per brand with share + rank + top-k.

    The reference's core analytical skeleton — scan → valid-quantity filter →
    broadcast dim join → calendar group-by → multi-stat agg → global-share
    window → rank → top-k (/root/reference/generate_hackathon_final_perfect.py:126-196,
    /root/reference/src/features/aggregation_features_engine.py:64-151).

    Scale: one shuffle for the groupBy (map-side partial agg first), one for
    the per-week window — the window keys are a prefix of the agg keys so AQE
    can reuse the exchange.  `part` is broadcast; rank ties broken by brand
    name so the result is deterministic under float reordering.
    """
    t = Catalog(spark, sf_dir)
    base = (
        t.lineitem.filter((F.col("l_quantity") >= 0) & (F.col("l_quantity") <= 50))
        .join(
            F.broadcast(t.part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
            "left",
        )
        .select(
            F.year("l_shipdate").alias("yr"),
            F.weekofyear("l_shipdate").alias("wk"),
            F.coalesce("p_brand", F.lit("Unknown")).alias("brand"),
            "l_quantity",
        )
    )
    agg = base.groupBy("yr", "wk", "brand").agg(
        r4(F.sum("l_quantity")).alias("sum_qty"),
        r4(F.avg("l_quantity")).alias("avg_qty"),
        r4(F.stddev("l_quantity")).alias("std_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    wk_win = W.partitionBy("yr", "wk")
    rank_win = wk_win.orderBy(F.col("sum_qty").desc(), F.col("brand"))
    return (
        agg.withColumn("wk_share", r4(F.col("sum_qty") / F.sum("sum_qty").over(wk_win)))
        .withColumn("brand_rank", F.rank().over(rank_win).cast("long"))
        .filter(F.col("brand_rank") <= 5)
    )
