"""Pin the pandas-kernel math against pure pandas on the same data.

These queries have no DuckDB oracle (rows-only in the driver), so the unit
tests here are their correctness gate.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from hackatonbigdata_spark.registry import all_queries

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def daily_pdf() -> pd.DataFrame:
    con = duckdb.connect()
    pdf = con.execute(
        f"""
        SELECT l_suppkey, l_shipdate,
               floor(sum(l_quantity) * 10000 + 0.5) / 10000 AS qty
        FROM '{SF_DIR}/lineitem.parquet'
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchdf()
    con.close()
    return pdf


def test_ewm_pandas_matches_reference(spark, daily_pdf):
    got = (
        all_queries()["ewm_pandas_per_series"](spark, SF_DIR)
        .toPandas()
        .set_index("l_suppkey")
        .sort_index()
    )
    for key, grp in daily_pdf.groupby("l_suppkey"):
        ema = grp.sort_values("l_shipdate")["qty"].ewm(alpha=0.3, adjust=True).mean()
        assert got.loc[key, "ema_last"] == pytest.approx(round(float(ema.iloc[-1]), 4))
        assert got.loc[key, "n_days"] == len(grp)


def test_sequential_clamp_properties(spark, daily_pdf):
    got = all_queries()["sequential_clamp_per_series"](spark, SF_DIR).toPandas()
    assert len(got) == len(daily_pdf)
    # every step change is within ±50% of the previous clamped value
    for _, grp in got.groupby("l_suppkey"):
        grp = grp.sort_values("l_shipdate")
        prev = None
        for v in grp["qty_clamped"]:
            if prev not in (None, 0):
                # kernel rounds each step to 4dp, so allow that quantum
                assert v <= prev * 1.5 + 1e-4 and v >= prev * 0.5 - 1e-4
            prev = v


def test_croston_positive_and_autocorr_bounded(spark):
    croston = all_queries()["croston_per_series"](spark, SF_DIR).toPandas()
    assert (croston["croston_forecast"].dropna() > 0).all()
    ac = all_queries()["rolling_autocorr_per_series"](spark, SF_DIR).toPandas()
    assert ac["autocorr1"].dropna().between(-1, 1).all()


def test_ar2_yule_walker_recovers_synthetic_ar2():
    from hackatonbigdata_spark.operators.series_kernels import ar2_yule_walker_fit

    # deterministic pseudo-noise (LCG) so the test needs no RNG import
    state, noise = 12345, []
    for _ in range(5000):
        state = (1103515245 * state + 12345) % (2**31)
        noise.append(state / 2**31 - 0.5)
    phi1_true, phi2_true = 0.5, -0.3
    y = [0.0, 0.0]
    for e in noise:
        y.append(phi1_true * y[-1] + phi2_true * y[-2] + e)
    phi1, phi2, sigma2, _fc = ar2_yule_walker_fit(y[500:])
    assert phi1 == pytest.approx(phi1_true, abs=0.05)
    assert phi2 == pytest.approx(phi2_true, abs=0.05)
    assert sigma2 > 0
    # white noise alone → both coefficients near zero
    w1, w2, _, _ = ar2_yule_walker_fit(noise)
    assert abs(w1) < 0.05 and abs(w2) < 0.05


def test_ar2_per_series_stationary_and_complete(spark, daily_pdf):
    got = all_queries()["ar2_yule_walker_per_series"](spark, SF_DIR).toPandas()
    assert set(got["l_suppkey"]) == set(daily_pdf["l_suppkey"])
    fitted = got.dropna(subset=["phi1"])
    assert len(fitted) > 0
    # Yule-Walker on biased autocovariances is always stationary:
    # |φ2| < 1, φ2 ± φ1 < 1 (triangle conditions), σ² > 0
    assert (fitted["phi2"].abs() < 1 + 1e-9).all()
    assert (fitted["phi1"] + fitted["phi2"] < 1 + 1e-9).all()
    assert (fitted["phi2"] - fitted["phi1"] < 1 + 1e-9).all()
    assert (fitted["sigma2"] > 0).all()


@pytest.mark.parametrize(
    "kernel_name,twin_name",
    [
        ("ar2_yule_walker_per_series", "ar2_yule_walker_sql"),
        ("croston_per_series", "croston_ses_sql"),
    ],
)
def test_kernel_equals_sql_twin_bitwise(spark, kernel_name, twin_name):
    """The graduated kernels share their SQL twin's DuckDB oracle, which is
    only sound if kernel and twin are BIT-identical (same sequential fold,
    same rounding).  Compare with == (no approx)."""
    q = all_queries()
    k = q[kernel_name](spark, SF_DIR).toPandas().sort_values("l_suppkey").reset_index(drop=True)
    t = q[twin_name](spark, SF_DIR).toPandas().sort_values("l_suppkey").reset_index(drop=True)
    assert list(k.columns) == list(t.columns)
    pd.testing.assert_frame_equal(k, t, check_exact=True)
