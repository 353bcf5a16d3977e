"""Per-series pandas kernels — the engine's Arrow/`applyInPandas` path.

SURVEY §2.12: four reference operators are genuinely not expressible as
fixed-frame windows (EWM with pandas `adjust=True`, rolling autocorr,
recursive smoothing clamp, per-series model fits like Croston).  Those run
as grouped-map pandas kernels: each (store) / (store, product) series is one
small group, Arrow-batched to Python, processed vectorized, returned.

Scale: key cardinality is millions of small series — the grouped-map
shuffle partitions by key and each kernel call is O(series length).  These
queries are registered WITHOUT oracle SQL (the driver records rows-only
checks); unit tests in tests/test_series_kernels.py pin the math against
pure pandas.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hackatonbigdata_spark.catalog import Catalog
from hackatonbigdata_spark.functions.core import r4
from hackatonbigdata_spark.registry import register


def _daily(t: Catalog) -> DataFrame:
    return t.lineitem.groupBy("l_suppkey", "l_shipdate").agg(
        r4(F.sum("l_quantity")).alias("qty")
    )


@register("ewm_pandas_per_series")
def ewm_pandas_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pandas-exact EWM (alpha=0.3, adjust=True) per store daily series
    (/root/reference/src/features/temporal_features_engine.py:227-259).

    adjust=True weights (1-a)^i / Σ(1-a)^j are not a simple recurrence, so
    this is the honest pandas kernel rather than the HOF fold used by
    `ewm_daily_store`."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate")
        ema = pdf["qty"].ewm(alpha=0.3, adjust=True).mean()
        return pd.DataFrame(
            {
                "l_suppkey": pdf["l_suppkey"].iloc[:1],
                "ema_last": [round(float(ema.iloc[-1]), 4)],
                "ema_mean": [round(float(ema.mean()), 4)],
                "n_days": [len(pdf)],
            }
        )

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(kernel, schema="l_suppkey long, ema_last double, ema_mean double, n_days long")
    )


@register("croston_per_series")
def croston_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Croston's method (SES alpha=0.1 on nonzero sizes and inter-arrival
    intervals) per store series
    (/root/reference/src/models/intermittent_demand.py:44-175).
    Demand event := day with qty above the series median (so intervals are
    non-trivial on this dense dataset)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate").reset_index(drop=True)
        thr = pdf["qty"].median()
        events = pdf.index[pdf["qty"] > thr]
        key = int(pdf["l_suppkey"].iloc[0])
        if len(events) < 2:
            return pd.DataFrame(
                {"l_suppkey": [key], "croston_forecast": [None], "n_events": [len(events)]}
            )
        sizes = pdf.loc[events, "qty"].to_numpy()
        intervals = pd.Series(events).diff().dropna().to_numpy(dtype=float)
        alpha = 0.1
        z, p = float(sizes[0]), float(intervals[0]) if len(intervals) else 1.0
        for s in sizes[1:]:
            z = alpha * float(s) + (1 - alpha) * z
        for iv in intervals[1:]:
            p = alpha * float(iv) + (1 - alpha) * p
        return pd.DataFrame(
            {
                "l_suppkey": [key],
                "croston_forecast": [round(z / p, 4)],
                "n_events": [len(events)],
            }
        )

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(
            kernel, schema="l_suppkey long, croston_forecast double, n_events long"
        )
    )


@register("sequential_clamp_per_series")
def sequential_clamp_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-dependent recursive change-rate limiter: each value may move at
    most ±50% from the PREVIOUS CLAMPED value
    (/root/reference/src/models/business_rules.py:231-293).  Depends on its
    own prior output, so no fixed-frame window can express it (SURVEY
    §7.4.1) — per-key pandas kernel with guaranteed intra-key ordering."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate").reset_index(drop=True)
        vals = pdf["qty"].tolist()
        out = []
        prev = None
        for v in vals:
            if prev is None or prev == 0:
                c = round(v, 4)
            else:
                c = round(min(max(v, prev * 0.5), prev * 1.5), 4)
            out.append(c)
            prev = c
        pdf["qty_clamped"] = out
        return pdf[["l_suppkey", "l_shipdate", "qty", "qty_clamped"]]

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(
            kernel,
            schema="l_suppkey long, l_shipdate timestamp_ntz, qty double, qty_clamped double",
        )
    )


@register("rolling_autocorr_per_series")
def rolling_autocorr_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each store's daily series
    (/root/reference/src/features/temporal_features_engine.py:209-214) —
    pandas kernel (no native Spark autocorr)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate")
        ac = pdf["qty"].autocorr(lag=1)
        return pd.DataFrame(
            {
                "l_suppkey": pdf["l_suppkey"].iloc[:1],
                "autocorr1": [None if pd.isna(ac) else round(float(ac), 4)],
                "n_days": [len(pdf)],
            }
        )

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(kernel, schema="l_suppkey long, autocorr1 double, n_days long")
    )


def ar2_yule_walker_fit(y: list[float]) -> tuple[float, float, float, float] | None:
    """Closed-form AR(2) fit via the Yule-Walker equations over one series:
    returns (phi1, phi2, sigma2, forecast_1d) or None when the series is too
    short or has zero variance.

    Biased autocovariances r_k = (1/n) Σ (y_t - μ)(y_{t+k} - μ); solving
    | r0 r1 | |φ1|   |r1|
    | r1 r0 | |φ2| = |r2|   →  φ1 = r1(r0 - r2)/(r0² - r1²),
                               φ2 = (r0·r2 - r1²)/(r0² - r1²);
    innovation variance σ² = r0 - φ1·r1 - φ2·r2, one-step forecast
    ŷ_{n+1} = μ + φ1(y_n - μ) + φ2(y_{n-1} - μ).  Biased (1/n) covariances
    keep the autocovariance matrix positive-definite, so the solution exists
    whenever the series is non-constant."""
    n = len(y)
    if n < 5:
        return None
    mu = sum(y) / n
    d = [v - mu for v in y]
    r0 = sum(v * v for v in d) / n
    if r0 <= 0.0:
        return None
    r1 = sum(d[i] * d[i + 1] for i in range(n - 1)) / n
    r2 = sum(d[i] * d[i + 2] for i in range(n - 2)) / n
    den = r0 * r0 - r1 * r1
    if den <= 0.0:
        return None
    phi1 = r1 * (r0 - r2) / den
    phi2 = (r0 * r2 - r1 * r1) / den
    sigma2 = r0 - phi1 * r1 - phi2 * r2
    fc = mu + phi1 * (y[-1] - mu) + phi2 * (y[-2] - mu)
    return phi1, phi2, sigma2, fc


@register("ar2_yule_walker_per_series")
def ar2_yule_walker_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(2) per-series fit by the closed-form Yule-Walker equations — the
    autoregressive member of the reference's per-series family
    (/root/reference/src/models/arima_temporal.py: per-series ARIMA fits;
    statsmodels is absent in this container, so the AR(p) core is solved in
    closed form instead of via MLE).  Emits φ1, φ2, the innovation variance,
    a 1-step-ahead forecast, and the lag-1 autocorrelation implied by the
    fit, per store daily series.

    Scale: identical shape to the other per-series kernels — one grouped-map
    shuffle keyed by series, O(series length) per call, no global state.
    Rows-only by design (a two-pass demeaned covariance recursion isn't one
    SQL statement); tests/test_series_kernels.py pins white-noise recovery
    (φ≈0), exact recovery on a synthetic AR(2), and stationarity of the
    fitted pair."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate").reset_index(drop=True)
        key = int(pdf["l_suppkey"].iloc[0])
        fit = ar2_yule_walker_fit([float(v) for v in pdf["qty"]])
        if fit is None:
            return pd.DataFrame(
                {
                    "l_suppkey": [key],
                    "phi1": [None],
                    "phi2": [None],
                    "sigma2": [None],
                    "forecast_1d": [None],
                    "n_days": [len(pdf)],
                }
            )
        phi1, phi2, sigma2, fc = fit
        return pd.DataFrame(
            {
                "l_suppkey": [key],
                "phi1": [round(phi1, 4)],
                "phi2": [round(phi2, 4)],
                "sigma2": [round(sigma2, 4)],
                "forecast_1d": [round(fc, 4)],
                "n_days": [len(pdf)],
            }
        )

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(
            kernel,
            schema=(
                "l_suppkey long, phi1 double, phi2 double, sigma2 double,"
                " forecast_1d double, n_days long"
            ),
        )
    )


def holt_winters_fit(
    y: list[float],
    m: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    horizon: int = 7,
) -> tuple[float, float, float] | None:
    """Additive Holt-Winters recursion over one series: returns (level,
    trend, h-step forecast), or None when the series is shorter than two
    seasons.  Standard initialization: first-season mean level, mean
    season-over-season difference for trend, de-meaned first season for the
    seasonal state."""
    if len(y) < 2 * m:
        return None
    level = float(sum(y[:m]) / m)
    trend = float((sum(y[m : 2 * m]) / m - sum(y[:m]) / m) / m)
    season = [float(v - level) for v in y[:m]]
    for i in range(m, len(y)):
        s = season[i % m]
        prev_level = level
        level = alpha * (y[i] - s) + (1 - alpha) * (level + trend)
        trend = beta * (level - prev_level) + (1 - beta) * trend
        season[i % m] = gamma * (y[i] - level) + (1 - gamma) * s
    fc = level + horizon * trend + season[(len(y) + horizon - 1) % m]
    return level, trend, fc


@register("holt_winters_per_series")
def holt_winters_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive Holt-Winters (level + trend + weekly seasonality) fit per
    store daily series — the closed-form per-series seasonal fit the
    reference runs through Prophet
    (/root/reference/src/models/prophet_seasonal.py:304-367: per-segment
    seasonal model fit + forecast).  Smoothing recursions (alpha=0.3,
    beta=0.1, gamma=0.2, m=7) depend on their own prior state, so this is a
    pandas kernel, not a window rewrite; emits the final state and a 7-day-
    ahead forecast per series.

    Scale: one grouped-map shuffle keyed by series; each kernel call is
    O(series length) with O(m) state.  Millions of series parallelize
    embarrassingly — the same shape as the reference's per-segment loop,
    minus the driver-side iteration."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("l_shipdate").reset_index(drop=True)
        key = int(pdf["l_suppkey"].iloc[0])
        fit = holt_winters_fit([float(v) for v in pdf["qty"]])
        if fit is None:
            return pd.DataFrame(
                {
                    "l_suppkey": [key],
                    "level": [None],
                    "trend": [None],
                    "forecast_7d": [None],
                    "n_days": [len(pdf)],
                }
            )
        level, trend, fc = fit
        return pd.DataFrame(
            {
                "l_suppkey": [key],
                "level": [round(level, 4)],
                "trend": [round(trend, 4)],
                "forecast_7d": [round(fc, 4)],
                "n_days": [len(pdf)],
            }
        )

    t = Catalog(spark, sf_dir)
    return (
        _daily(t)
        .groupBy("l_suppkey")
        .applyInPandas(
            kernel,
            schema=(
                "l_suppkey long, level double, trend double,"
                " forecast_7d double, n_days long"
            ),
        )
    )
