"""Table catalog over a scale-factor directory of parquet files.

Replaces the reference's file-discovery heuristics
(/root/reference/src/utils/data_loader.py:105-185 picks tables by glob +
column probe + size) with an explicit registry: every table has a known name
and location, and reads are plain ``spark.read.parquet`` so Catalyst gets
projection pruning and predicate pushdown for free
(/root/reference/src/data/loaders.py:43-118 did both by hand).
"""

from __future__ import annotations

import os
import threading

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


_PKG_SHIP_LOCK = threading.Lock()


def ensure_package_on_executors(spark: SparkSession) -> None:
    """Ship the engine package to Python workers via ``addPyFile`` — the
    local-mode equivalent of ``spark-submit --py-files``.  Worker processes
    do not inherit the driver's ``sys.path`` edits, so any
    ``mapInPandas``/``applyInPandas`` closure that references a module-level
    name fails with ModuleNotFoundError unless the package is shipped.  On a
    real cluster the deploy does this once per job; here it is one zip of
    the source tree per session (idempotent, guarded).

    r15 hardening (exposed by the thread-pooled test sweeps): the zip is
    now (1) named by a CONTENT hash of the shipped sources — the old
    ``os.getpid()`` key collided across process lifetimes (Linux reuses
    pids), silently shipping a STALE zip from a dead process's run of a
    different source tree; (2) built to a temp name and ``os.replace``d
    atomically — a concurrent caller used to ``addPyFile`` a half-written
    zip, and Spark then failed every task with "exists and does not match
    contents" once the bytes settled; (3) serialized behind a process-wide
    lock with a double-checked session flag."""
    sc = spark.sparkContext
    if getattr(sc, "_hbd_pkg_shipped", False):
        return
    with _PKG_SHIP_LOCK:
        if getattr(sc, "_hbd_pkg_shipped", False):
            return
        import hashlib  # noqa: PLC0415 — driver-side only
        import tempfile  # noqa: PLC0415
        import zipfile  # noqa: PLC0415

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        root = os.path.dirname(pkg_dir)
        srcs: list[str] = []
        for dirpath, dirs, files in os.walk(pkg_dir):
            dirs.sort()
            for fn in sorted(files):
                if fn.endswith(".py"):
                    srcs.append(os.path.join(dirpath, fn))
        h = hashlib.md5()
        for full in srcs:
            h.update(os.path.relpath(full, root).encode())
            with open(full, "rb") as f:
                h.update(f.read())
        zpath = os.path.join(
            tempfile.gettempdir(),
            f"hackatonbigdata_spark_pkg_{h.hexdigest()[:12]}.zip",
        )
        if not os.path.exists(zpath):
            tmp = f"{zpath}.tmp{os.getpid()}"
            with zipfile.ZipFile(tmp, "w") as z:
                for full in srcs:
                    z.write(full, os.path.relpath(full, root))
            os.replace(tmp, zpath)
        sc.addPyFile(zpath)
        sc._hbd_pkg_shipped = True


# Footer-type cache keyed on (probe file, mtime): one pyarrow metadata read
# per events path per process, invalidated if the driver regenerates the
# data in-process with a different physical type.
_EVENTS_TS_NANOS: dict[tuple[str, float], bool] = {}


def events_ts_is_nanos(path: str) -> bool:
    """True when ``events.ts`` is parquet TIMESTAMP(NANOS) — Spark's reader
    rejects that type unless ``nanosAsLong`` makes it a raw int64; False for
    a normal us/ms timestamp column, which reads natively.  Checked from the
    parquet footer (driver-side, milliseconds) instead of being hard-coded,
    because the two generations of test data disagree on the physical type.
    """
    import glob  # noqa: PLC0415 — driver-side only

    probe = path
    if os.path.isdir(probe):
        parts = sorted(
            f
            for f in glob.glob(os.path.join(probe, "**", "*.parquet"), recursive=True)
            if os.path.isfile(f)
        )
        if not parts:
            raise FileNotFoundError(
                f"no .parquet part files found under events path {probe!r}"
            )
        probe = parts[0]
    key = (probe, os.path.getmtime(probe))
    if key not in _EVENTS_TS_NANOS:
        import pyarrow.parquet as pq  # noqa: PLC0415 — driver-side only

        ts_type = str(pq.read_schema(probe).field("ts").type)
        _EVENTS_TS_NANOS[key] = ts_type.startswith("timestamp[ns")
    return _EVENTS_TS_NANOS[key]


def read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dtype-aware events read: footer decides the ``ts`` normalization so
    the engine survives the driver regenerating the data with a different
    physical timestamp type.  Either way the column lands as
    ``timestamp_ntz`` truncated to microseconds — identical to what DuckDB
    sees — so event-time semantics match the oracle."""
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    if events_ts_is_nanos(path):
        # TIMESTAMP(NANOS): readable only as int64; truncate ns -> us.
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        return spark.read.parquet(path).withColumn(
            "ts", F.expr("timestamp_micros(ts div 1000)").cast("timestamp_ntz")
        )
    # us/ms timestamp: native read; normalize to ntz for oracle parity.
    return spark.read.parquet(path).withColumn(
        "ts", F.col("ts").cast("timestamp_ntz")
    )


class Catalog:
    """Lazy table accessor: ``Catalog(spark, sf_dir).lineitem`` -> DataFrame."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        ensure_package_on_executors(spark)

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; known: {TABLES}")
        if name == "events":
            return read_events(self.spark, self.sf_dir)
        return self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return self.table(name)
        raise AttributeError(name)

    def register_views(self) -> None:
        """Register every table as a temp view for spark.sql queries."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)
