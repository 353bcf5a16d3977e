"""Property pins for the rows-only GBT stacking meta-learner.

``stacking_gbt_meta`` has no SQL oracle (boosted-tree split thresholds are
model internals), so its correctness evidence is: the nonlinear meta-learner
must fit the OOF table at least as well IN-SAMPLE as both the closed-form
ridge (``stacking_ridge_weights``, fully oracled) and the equal-weight
blend, and its feature importances must form a simplex.
"""

from __future__ import annotations

from hackatonbigdata_spark.registry import all_queries
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_gbt_meta_not_worse_than_ridge_and_equal(spark):
    gbt = QUERIES["stacking_gbt_meta"](spark, SF_DIR).collect()[0]
    ridge = QUERIES["stacking_ridge_weights"](spark, SF_DIR).collect()[0]
    assert gbt.n_rows == ridge.n_rows
    # same fit set, same in-sample metric: the nonlinear model must not lose
    # to its linear special cases
    assert gbt.wmape_gbt <= ridge.wmape_ridge, (gbt.wmape_gbt, ridge.wmape_ridge)
    assert gbt.wmape_gbt <= gbt.wmape_equal, (gbt.wmape_gbt, gbt.wmape_equal)
    # equal-blend column must agree with the oracled ridge query's value
    # (same formula, same inputs) up to the two queries' rounding grids
    assert abs(gbt.wmape_equal - ridge.wmape_equal) < 0.05


def test_gbt_meta_shape_and_importances(spark):
    row = QUERIES["stacking_gbt_meta"](spark, SF_DIR).collect()[0]
    assert row.n_trees == 20
    assert row.total_nodes >= row.n_trees  # at least a stump per tree
    fis = [row.fi_mean, row.fi_q75, row.fi_store]
    assert all(fi >= 0.0 for fi in fis)
    assert abs(sum(fis) - 1.0) < 2e-3  # simplex up to per-component rounding
