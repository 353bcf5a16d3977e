from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"
SF_DIR_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from hackatonbigdata_spark.session import get_spark

    spark = get_spark("hackatonbigdata-tests")
    yield spark
    spark.stop()
