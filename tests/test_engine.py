"""Engine facade: tables, named queries, free-form SQL."""

from __future__ import annotations

import pytest

from hackatonbigdata_spark.engine import Engine
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def eng(spark):
    return Engine(spark, SF_DIR)


def test_tables_and_query(eng):
    assert "lineitem" in eng.tables()
    assert eng.table("region").count() == 5
    df = eng.query("flagship_weekly_brand_demand")
    assert df.count() > 0


def test_sql_over_views(eng):
    n = eng.sql(
        "SELECT count(*) AS n FROM lineitem JOIN part ON l_partkey = p_partkey"
    ).first().n
    assert n == eng.table("lineitem").count()


def test_unknown_query_is_clear(eng):
    with pytest.raises(KeyError, match="unknown query"):
        eng.query("nope")
