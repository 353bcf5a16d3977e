"""End-to-end submission pipeline: forecast → rules → `;`-CSV → read-back.

The reference's output contract (columns, separator, non-negative integer
quantities, full week×store×product coverage) validated on the actual file
the sink writes."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from hackatonbigdata_spark.plans.submission import N_WEEKS, build_submission
from hackatonbigdata_spark.sources.io import SUBMISSION_COLS, write_submission
from tests.conftest import SF_DIR


def test_submission_roundtrip(spark, tmp_path):
    sub = build_submission(spark, SF_DIR)
    out = str(tmp_path / "submission")
    n = write_submission(sub, out)

    files = glob.glob(f"{out}/*.csv")
    assert len(files) == 1, "submission must be a single CSV file"
    back = spark.read.option("sep", ";").option("header", "true").csv(files[0])
    assert back.columns == SUBMISSION_COLS
    assert back.count() == n

    grid = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .select("l_suppkey", "l_partkey")
        .distinct()
        .count()
    )
    assert n == grid * N_WEEKS, "one row per (week, store, product)"

    q = back.select(F.col("quantidade").cast("long").alias("q"))
    assert q.filter(F.col("q").isNull() | (F.col("q") < 0)).count() == 0

    # capacity rule: no store-week exceeds the configured limit
    tot = (
        back.select(
            F.col("semana"),
            F.col("pdv"),
            F.col("quantidade").cast("double").alias("q"),
        )
        .groupBy("semana", "pdv")
        .agg(F.sum("q").alias("t"))
    )
    # integer rounding can push a scaled store slightly over; allow 1/row slack
    assert tot.filter(F.col("t") > 50_000 * 1.01).count() == 0
