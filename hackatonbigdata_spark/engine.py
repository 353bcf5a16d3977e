"""User-facing engine facade.

The one-stop API a user of the reference pipeline switches to: named tables,
the full operator catalog as named queries, free-form Spark SQL over the
registered views, and the sinks.  Everything stays a lazy DataFrame until
the caller acts.

    from hackatonbigdata_spark.engine import Engine

    eng = Engine.local(sf_dir="/root/testdata/sf0.01")
    eng.table("lineitem").count()
    eng.query("flagship_weekly_brand_demand").show()
    eng.sql("SELECT count(*) FROM lineitem JOIN part ON l_partkey = p_partkey")
    eng.write_submission(eng.build_submission(), "/tmp/sub")
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hackatonbigdata_spark.catalog import TABLES, Catalog
from hackatonbigdata_spark.registry import all_queries
from hackatonbigdata_spark.session import get_spark
from hackatonbigdata_spark.sources import io


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        self.catalog = Catalog(spark, sf_dir)
        self._queries = all_queries()
        self._views_registered = False

    @classmethod
    def local(cls, sf_dir: str, app_name: str = "hackatonbigdata_spark") -> Engine:
        return cls(get_spark(app_name), sf_dir)

    # -- tables & SQL -------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        return self.catalog.table(name)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def sql(self, query: str) -> DataFrame:
        """Free-form Spark SQL with every catalog table registered as a
        temp view (lazily, once per engine)."""
        if not self._views_registered:
            self.catalog.register_views()
            self._views_registered = True
        return self.spark.sql(query)

    # -- operator catalog ---------------------------------------------------
    def query(self, name: str) -> DataFrame:
        """Run a named operator query from the registry (SURVEY.md §2)."""
        try:
            fn = self._queries[name]
        except KeyError:
            raise KeyError(
                f"unknown query {name!r}; see Engine.queries()"
            ) from None
        return fn(self.spark, self.sf_dir)

    def queries(self) -> list[str]:
        return sorted(self._queries)

    # -- pipelines & sinks --------------------------------------------------
    def build_submission(self) -> DataFrame:
        from hackatonbigdata_spark.plans.submission import build_submission

        return build_submission(self.spark, self.sf_dir)

    def write_submission(self, df: DataFrame, path: str) -> int:
        return io.write_submission(df, path)

    def write_parquet(
        self, df: DataFrame, path: str, partition_by: list[str] | None = None
    ) -> None:
        io.write_parquet(df, path, partition_by)
