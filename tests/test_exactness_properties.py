"""Property tests for the cross-engine exactness toolkit.

The engine's whole correctness story rests on a few arithmetic contracts
(functions/core.py, SURVEY §7.4.4).  These hypothesis tests hammer each
contract against DuckDB directly — no Spark session needed, because the
Spark side evaluates the identical IEEE-double expression tree (Python
floats are the same doubles), and Spark==oracle is separately proven by the
212-query parity suite.
"""

from __future__ import annotations

import hashlib
import math
from datetime import date, timedelta

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def _r4_py(x: float) -> float:
    """The r4 formula as plain IEEE double ops — what Catalyst evaluates."""
    if math.isnan(x):
        return None
    s = -1.0 if x < 0 else 1.0
    return s * (math.floor(abs(x) * 10000.0 + 0.5) / 10000.0)


@settings(max_examples=500, deadline=None)
@given(
    st.floats(
        allow_nan=False, allow_infinity=False, min_value=-1e9, max_value=1e9
    )
)
def test_r4_matches_duckdb_round(x):
    """r4(x) == DuckDB round(x, 4) on every reachable double — the contract
    the whole oracle harness depends on (F.round would NOT satisfy this:
    Spark rounds the shortest decimal repr, DuckDB the binary value)."""
    con = duckdb.connect()
    want = con.execute("SELECT round(CAST(? AS DOUBLE), 4)", [x]).fetchone()[0]
    assert _r4_py(x) == want, (x, _r4_py(x), want)


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=730))
def test_iso_dow_matches_duckdb(offset):
    """The ((dayofweek + 5) % 7) + 1 rewrite equals DuckDB isodow on every
    date (1=Monday..7=Sunday)."""
    con = duckdb.connect()
    d = date(1995, 1, 1) + timedelta(days=offset)
    want = con.execute("SELECT isodow(CAST(? AS DATE))", [d]).fetchone()[0]
    # python weekday(): 0=Monday -> ISO = weekday + 1
    assert d.weekday() + 1 == want


@settings(max_examples=300, deadline=None)
@given(
    st.integers(min_value=0, max_value=10**15),
    st.integers(min_value=1, max_value=10**9),
)
def test_floor_division_agrees_on_nonnegatives(a, b):
    """Spark `div` truncates toward zero, DuckDB `//` floors — the repo's
    rule is to use them only on non-negative operands, where both equal
    Python's floor division."""
    con = duckdb.connect()
    want = con.execute("SELECT CAST(? AS BIGINT) // CAST(? AS BIGINT)", [a, b]).fetchone()[0]
    assert a // b == want  # == truncation too, since a, b >= 0


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=st.characters(codec="ascii"), max_size=64))
def test_md5_hex_prefix_matches_duckdb(s):
    """The shared h32 convention (first 8 hex chars of md5 as the keyed
    hash) produces identical digests in Python/Spark and DuckDB."""
    con = duckdb.connect()
    want = con.execute("SELECT substr(md5(?), 1, 8)", [s]).fetchone()[0]
    assert hashlib.md5(s.encode()).hexdigest()[:8] == want


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, min_value=-1e6, max_value=1e6
        ),
        min_size=1,
        max_size=50,
    )
)
def test_quantized_sum_is_order_free(xs):
    """floor(x*1e4 + 0.5) integer quantization before summation makes the
    sum permutation-invariant — the discipline every oracled aggregate
    uses (raw double sums are accumulation-order dependent)."""
    q = [math.floor(x * 10000 + 0.5) for x in xs]
    assert sum(q) == sum(reversed(q)) == sum(sorted(q))
    # and the quantized values survive a DuckDB round-trip exactly
    con = duckdb.connect()
    want = con.execute(
        "SELECT sum(CAST(floor(x * 10000 + 0.5) AS BIGINT)) FROM (SELECT unnest(?) AS x)",
        [xs],
    ).fetchone()[0]
    assert sum(q) == want
