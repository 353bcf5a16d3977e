"""Scale utilities: salted aggregation correctness + shuffle-free bucketed
joins, both asserted on results AND physical plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hackatonbigdata_spark.functions.scale import salted_agg, write_bucketed
from hackatonbigdata_spark.plans.audit import plan_stats
from tests.conftest import SF_DIR


def test_salted_agg_matches_direct_groupby(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    salted = salted_agg(li, ["l_partkey"], "l_quantity", ["sum", "count", "min", "max"])
    direct = li.groupBy("l_partkey").agg(
        F.sum("l_quantity").alias("sum_value"),
        F.count("l_quantity").alias("count_value"),
        F.min("l_quantity").alias("min_value"),
        F.max("l_quantity").alias("max_value"),
    )
    assert salted.exceptAll(direct).count() == 0
    assert direct.exceptAll(salted).count() == 0


def test_salted_agg_rejects_non_algebraic(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_agg(li, ["l_partkey"], "l_quantity", ["median"])


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "t_li_b", str(tmp_path / "li"), ["l_orderkey"], 8)
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "t_ord_b",
        str(tmp_path / "ord"),
        ["l_orderkey"],
        8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a non-broadcast join so the bucketing is what saves the shuffle
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("t_li_b").join(spark.table("t_ord_b"), "l_orderkey")
        s = plan_stats(joined)
        assert s.shuffles == 0, f"bucketed join must not shuffle, got {s.shuffles}"
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_approx_sketches_within_error_bounds(spark):
    """The documented exact->approx switch points must actually be accurate:
    HLL++ distinct counts within 5% and the sketch median within 2.5% of the
    exact interpolated median (the sketch returns a real data point, so at
    sf0.001's 100-300 rows per brand the interpolation gap dominates)."""
    from hackatonbigdata_spark.registry import all_queries

    pdf = all_queries()["agg_approx_sketches"](spark, SF_DIR).toPandas()
    assert (pdf["orders_rel_err"] <= 0.05).all()
    assert (pdf["p50_rel_err"] <= 0.025).all()


def test_sketches_only_matches_audit_query(spark):
    """The production sketch path must emit the same sketch values as the
    audit query's approx columns (same sketch params over the same data) and
    must not pay for the exact twins: no expand-based distinct aggregate in
    its plan."""
    from hackatonbigdata_spark.registry import all_queries

    prod = all_queries()["agg_sketches_only"](spark, SF_DIR).toPandas()
    audit = all_queries()["agg_approx_sketches"](spark, SF_DIR).toPandas()
    m = prod.merge(audit, on="p_brand", suffixes=("", "_audit"))
    assert len(m) == len(prod) == len(audit)
    assert (m["approx_orders"] == m["approx_orders_audit"]).all()
    assert (m["approx_p50"] == m["approx_p50_audit"]).all()
    plan = (
        all_queries()["agg_sketches_only"](spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "count(distinct" not in plan.lower()
