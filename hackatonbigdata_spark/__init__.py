"""hackatonbigdata_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
HiRenan/HackatonBIGDATA reference (a single-node pandas retail
demand-forecasting pipeline), re-expressed idiomatically on Spark
DataFrame / SQL / Catalyst / Structured Streaming and designed for
100 TB scale.  See SURVEY.md for the operator inventory this implements.
"""

from hackatonbigdata_spark.session import get_spark
from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.registry import all_queries, all_oracles

__all__ = ["get_spark", "Catalog", "all_queries", "all_oracles"]
