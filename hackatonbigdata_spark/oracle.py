"""Local oracle-check harness mirroring the driver's correctness gate.

Runs a registered Spark query and its DuckDB oracle SQL on the same parquet
tables and compares row count, column names, and an order-insensitive
canonical value set.  Used by tests; the real gate is the driver's
CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import duckdb
import pandas as pd

from hackatonbigdata_spark.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Connect DuckDB with every testdata table registered as a view."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v: object, collapse_midnight: bool = False) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 4))
    if isinstance(v, (pd.Timestamp,)):
        if pd.isna(v):
            return "NULL"
        # pandas widens DATE columns to midnight Timestamps (DuckDB .df()
        # does; Spark toPandas keeps datetime.date) — collapse to date only
        # when the WHOLE column is midnight-valued (decided per column by
        # canonical_rows), so a genuine timestamp column with a stray
        # 00:00:00 value still hashes differently from a date column
        if collapse_midnight and v.tz is None and (
            v.hour, v.minute, v.second, v.microsecond
        ) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x, collapse_midnight) for x in v) + "]"
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):  # numpy nan-likes
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def _column_all_midnight(series: pd.Series) -> bool:
    """True when every non-null tz-naive Timestamp in the column sits at
    exactly midnight — the dtype-level signal that the column is a DATE
    widened by pandas, not a genuine TIMESTAMP."""
    saw_ts = False
    for v in series:
        if isinstance(v, pd.Timestamp) and not pd.isna(v):
            if v.tz is not None or (v.hour, v.minute, v.second, v.microsecond) != (
                0, 0, 0, 0,
            ):
                return False
            saw_ts = True
    return saw_ts


def canonical_rows(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    collapse = [_column_all_midnight(df[c]) for c in cols]
    out = [
        tuple(_canon_cell(v, cm) for v, cm in zip(row, collapse))
        for row in df[cols].itertuples(index=False)
    ]
    return sorted(out)


@dataclass
class CompareResult:
    name: str
    ok: bool
    detail: str = ""


def compare_frames(name: str, spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> CompareResult:
    if sorted(spark_pdf.columns) != sorted(oracle_pdf.columns):
        return CompareResult(
            name,
            False,
            f"schema mismatch: spark={sorted(spark_pdf.columns)} oracle={sorted(oracle_pdf.columns)}",
        )
    if len(spark_pdf) != len(oracle_pdf):
        return CompareResult(
            name, False, f"row count mismatch: spark={len(spark_pdf)} oracle={len(oracle_pdf)}"
        )
    s_rows = canonical_rows(spark_pdf)
    o_rows = canonical_rows(oracle_pdf)
    if s_rows != o_rows:
        diffs = [
            f"  spark={s} | oracle={o}"
            for s, o in zip(s_rows, o_rows)
            if s != o
        ][:5]
        return CompareResult(name, False, "value mismatch (first diffs):\n" + "\n".join(diffs))
    return CompareResult(name, True)


def check_query(spark, sf_dir: str, name: str, fn, sql: str | None) -> CompareResult:
    sdf = fn(spark, sf_dir).toPandas()
    if sql is None:
        ok = len(sdf) >= 0
        return CompareResult(name, ok, f"rows-only check: {len(sdf)} rows")
    con = duckdb_connection(sf_dir)
    try:
        odf = con.execute(sql).fetchdf()
    finally:
        con.close()
    return compare_frames(name, sdf, odf)
