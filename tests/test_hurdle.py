"""Sanity pins for the MLlib zero-inflated hurdle query (rows-only)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR


def test_hurdle_outputs_are_sane(spark):
    out = all_queries()["zero_inflated_hurdle_mllib"](spark, SF_DIR)
    rows = out.count()
    assert rows > 0
    bad_p = out.filter((F.col("p_event") < 0) | (F.col("p_event") > 1)).count()
    assert bad_p == 0, "probabilities must be in [0, 1]"
    # hurdle forecast = p * magnitude must be non-null everywhere
    assert out.filter(F.col("hurdle_forecast").isNull()).count() == 0
