"""Table catalog over a scale-factor directory of parquet files.

Replaces the reference's file-discovery heuristics
(/root/reference/src/utils/data_loader.py:105-185 picks tables by glob +
column probe + size) with an explicit registry: every table has a known name
and location, and reads are plain ``spark.read.parquet`` so Catalyst gets
projection pruning and predicate pushdown for free
(/root/reference/src/data/loaders.py:43-118 did both by hand).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class Catalog:
    """Lazy table accessor: ``Catalog(spark, sf_dir).lineitem`` -> DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        if name == "events":
            # events.ts is parquet TIMESTAMP(NANOS), which the Spark reader
            # rejects; read the raw int64 and truncate ns -> us exactly as
            # DuckDB does, so event-time semantics match the oracle.
            # session.get_spark sets nanosAsLong at build time; this guard
            # only exists for sessions the engine didn't build (the driver's)
            # and is idempotent.
            if self.spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
                self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            return self.spark.read.parquet(f"{self.sf_dir}/events.parquet").withColumn(
                "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
            )
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
