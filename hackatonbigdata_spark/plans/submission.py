"""Entry-point-C pipeline: heuristic forecast → business rules → submission.

The reference's submission flow (/root/reference/
generate_submission_with_trained_model.py:245-292 and
generate_hackathon_final_perfect.py:233-340): predict the
week×store×product grid, apply bounds and integer rounding, emit the
``semana;pdv;produto;quantidade`` CSV.  Here the heuristic coalesce-blend
predictor feeds the post-processing rewrites and the submission sink — one
lazy DAG from parquet scan to CSV.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hackatonbigdata_spark.operators.forecast import heuristic_blend_forecast

N_WEEKS = 4
STORE_CAPACITY = 50_000.0


def build_submission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly per-(store, product) integer forecast for the next N_WEEKS.

    Stages (each a pure DataFrame rewrite, shuffles only on the
    (store, product) grain it already lives at):
    1. base forecast per (store, product) — heuristic coalesce-blend;
    2. replicate across forecast weeks (explode — no shuffle);
    3. non-negativity clip + per-store capacity scaling
       (/root/reference/src/models/business_rules.py:164-208);
    4. integer rounding with zero-below-0.5
       (/root/reference/src/models/business_rules.py:553-690).
    """
    base = heuristic_blend_forecast(spark, sf_dir)
    weekly = base.select(
        F.explode(F.expr(f"sequence(1, {N_WEEKS})")).alias("semana"),
        F.col("l_suppkey").alias("pdv"),
        F.col("l_partkey").alias("produto"),
        F.greatest(F.col("blended_forecast"), F.lit(0.0)).alias("pred"),
    )
    store_total = F.sum("pred").over(W.partitionBy("semana", "pdv"))
    scaled = weekly.withColumn(
        "pred",
        F.when(
            store_total > STORE_CAPACITY,
            F.col("pred") * STORE_CAPACITY / store_total,
        ).otherwise(F.col("pred")),
    )
    return scaled.select(
        "semana",
        "pdv",
        "produto",
        F.when(F.col("pred") < 0.5, F.lit(0))
        .otherwise(F.floor(F.col("pred") + 0.5))
        .cast("long")
        .alias("quantidade"),
    )
