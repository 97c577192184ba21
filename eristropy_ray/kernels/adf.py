"""Augmented Dickey-Fuller unit-root test — pure numpy.

The reference calls ``statsmodels.tsa.stattools.adfuller`` with library
defaults — ``regression='c'``, ``autolag='AIC'`` — and maps a ``ValueError``
(series too short) to p = 1.0 (``/root/reference/eristropy/stationarity.py:150-163``).
statsmodels is not available in this environment, so the test is
implemented from the published method:

- ADF regression:  Δx_t = α + ρ·x_{t-1} + Σ_{k=1..L} φ_k·Δx_{t-k} + ε_t,
  test statistic = t-value of ρ̂.
- Lag selection: L chosen by AIC over L = 0..maxlag on a common sample,
  maxlag = ceil(12·(n/100)^(1/4)) capped at n//2 - 2 (Schwert's rule, the
  statsmodels default); final statistic re-estimated on the longest sample
  for the chosen L.
- p-value: MacKinnon's (1994/2010) response-surface approximation for the
  constant-only case — Φ of a cubic/quadratic polynomial in the statistic,
  with the published tail cutoffs.

``ValueError`` is raised when the series is too short to regress (mirroring
statsmodels), so callers can apply the reference's p = 1.0 fallback.
"""

from __future__ import annotations

import math

import numpy as np

# MacKinnon approximate-p-value surfaces, one unit root (N=1), for the
# constant ('c') and constant+trend ('ct') regressions. Published in
# MacKinnon (1994) "Approximate asymptotic distribution functions for
# unit-root and cointegration tests". The 'ct' row is pinned by its
# published asymptotic critical values in test_adf.py
# (p(-3.96)=0.01, p(-3.41)=0.05, p(-3.12)=0.10) and by small/large
# branch continuity at tau_star.
_TAU_SURFACE = {
    # regression: (tau_max, tau_min, tau_star, smallp, largep)
    "c": (
        2.74, -18.83, -1.61,
        (2.1659, 1.4412, 0.038269),  # p = Phi(c0 + c1 t + c2 t^2)
        (1.7339, 0.93202, -0.12745, -0.010368),
    ),
    "ct": (
        0.7, -16.18, -2.89,
        (3.2512, 1.6047, 0.049588),
        (2.5261, 0.61654, -0.37956, -0.060285),
    ),
}


def _norm_cdf(x: float) -> float:
    return 0.5 * math.erfc(-x / math.sqrt(2.0))


def mackinnon_pvalue(stat: float, regression: str = "c") -> float:
    """Approximate asymptotic p-value of an ADF tau statistic (N=1)."""
    tau_max, tau_min, tau_star, smallp, largep = _TAU_SURFACE[regression]
    if not np.isfinite(stat):
        return float("nan")
    if stat > tau_max:
        return 1.0
    if stat < tau_min:
        return 0.0
    if stat <= tau_star:
        c = smallp
        z = c[0] + c[1] * stat + c[2] * stat * stat
    else:
        c = largep
        z = c[0] + c[1] * stat + c[2] * stat * stat + c[3] * stat**3
    return _norm_cdf(z)


def _ols_tstat0_and_aic(y: np.ndarray, X: np.ndarray) -> tuple[float, float]:
    """(t-stat of first column's coefficient, AIC) of OLS y ~ X."""
    n, k = X.shape
    beta, _, rank, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    # Gaussian log-likelihood at the MLE; AIC = -2 llf + 2 k
    if ssr <= 0.0:
        ssr = np.finfo(np.float64).tiny
    llf = -0.5 * n * (math.log(2.0 * math.pi) + math.log(ssr / n) + 1.0)
    aic = -2.0 * llf + 2.0 * rank
    dof = n - rank
    if dof <= 0:
        return math.nan, aic
    sigma2 = ssr / dof
    xtx_inv = np.linalg.pinv(X.T @ X)
    se0 = math.sqrt(max(sigma2 * xtx_inv[0, 0], 0.0))
    t0 = beta[0] / se0 if se0 > 0 else math.nan
    return float(t0), float(aic)


def _trend_cols(nobs: int, regression: str) -> list[np.ndarray]:
    """Deterministic regressors appended after the stochastic columns:
    'c' -> [1]; 'ct' -> [1, t] with t = 1..nobs (the statsmodels
    ``add_trend`` convention)."""
    cols = [np.ones(nobs)]
    if regression == "ct":
        cols.append(np.arange(1.0, nobs + 1.0))
    return cols


def _design(
    x: np.ndarray, lag: int, regression: str = "c"
) -> tuple[np.ndarray, np.ndarray]:
    """ADF design for a given lag on the longest available sample.

    Columns: [x_{t-1}, Δx_{t-1}, ..., Δx_{t-lag}, 1(, t)].
    """
    dx = np.diff(x)
    nobs = dx.size - lag
    y = dx[lag:]
    cols = [x[lag:-1]]
    for k in range(1, lag + 1):
        cols.append(dx[lag - k : lag - k + nobs])
    cols.extend(_trend_cols(nobs, regression))
    return y, np.column_stack(cols)


def adfuller(
    x: np.ndarray,
    maxlag: int | None = None,
    regression: str = "c",
    autolag: str | None = "AIC",
) -> tuple[float, float, int]:
    """ADF test with the library's configurable surface.

    regression: 'c' (constant — the reference's only configuration) or
        'ct' (constant + linear trend; MacKinnon 'ct' response surface).
    autolag: 'AIC' selects the lag by AIC over 0..maxlag on the common
        sample (library default); None uses ``maxlag`` as the FIXED lag
        (statsmodels ``autolag=None`` semantics; maxlag defaults to 0
        then).

    Returns:
        (statistic, pvalue, usedlag)

    Raises:
        ValueError: series too short for any ADF regression — callers
        mirror the reference's fallback (p = 1.0, stationarity.py:158-163).
    """
    if regression not in _TAU_SURFACE:
        raise ValueError(f"regression must be one of {sorted(_TAU_SURFACE)}")
    if autolag not in ("AIC", None):
        raise ValueError("autolag must be 'AIC' or None (fixed lag)")
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    ntrend = 2 if regression == "ct" else 1
    if n and np.all(x == x[0]):
        # statsmodels raises "Invalid input, x is constant"; callers map
        # the ValueError to the reference's p = 1.0 fallback
        raise ValueError("invalid input, x is constant")
    if maxlag is None:
        if autolag is None:
            maxlag = 0
        else:
            # statsmodels convention: Schwert's rule on the FULL length n
            # (maxlag is chosen BEFORE differencing; its "-1 for the diff"
            # comment refers to the -1 term in the cap n//2 - ntrend - 1,
            # not to measuring the formula on n-1)
            maxlag = int(math.ceil(12.0 * (n / 100.0) ** 0.25))
            maxlag = min(n // 2 - ntrend - 1, maxlag)
    if maxlag < 0 or n < 4:
        raise ValueError("sample size is too short to use selected regression component")
    if autolag is None:
        usedlag = maxlag
    else:
        # AIC selection: all candidate lags fit on the common (shortest) sample
        dx = np.diff(x)
        nobs = dx.size - maxlag
        if nobs < 2:
            raise ValueError("sample size is too short for the maximum lag")
        y = dx[maxlag:]
        level = x[maxlag:-1]
        lag_cols = [
            dx[maxlag - k : maxlag - k + nobs] for k in range(1, maxlag + 1)
        ]
        trend = _trend_cols(nobs, regression)
        best = (math.inf, 0)
        for lag in range(0, maxlag + 1):
            X = np.column_stack([level, *lag_cols[:lag], *trend])
            if X.shape[0] <= X.shape[1]:
                break
            _, aic = _ols_tstat0_and_aic(y, X)
            if aic < best[0]:
                best = (aic, lag)
        usedlag = best[1]
    # final regression on the longest sample for the chosen lag
    y2, X2 = _design(x, usedlag, regression)
    if X2.shape[0] <= X2.shape[1]:
        raise ValueError("sample size is too short for the selected lag")
    stat, _ = _ols_tstat0_and_aic(y2, X2)
    return stat, mackinnon_pvalue(stat, regression), usedlag


def adfuller_c(x: np.ndarray, maxlag: int | None = None) -> tuple[float, float, int]:
    """ADF test (constant regression, AIC lag selection) — the
    reference's only configuration (stationarity.py:155); thin wrapper
    over ``adfuller``."""
    return adfuller(x, maxlag=maxlag, regression="c", autolag="AIC")


def adf_pvalue_or_one(
    x: np.ndarray,
    regression: str = "c",
    autolag: str | None = "AIC",
    maxlag: int | None = None,
) -> float:
    """ADF p-value with the reference's too-short fallback of 1.0.

    Defaults reproduce the reference's only configuration ('c' + AIC);
    the widened surface ('ct', fixed-lag autolag=None) is plumbed from
    ``StationaryConfig.adf_regression`` / ``adf_autolag`` / ``adf_maxlag``.
    """
    try:
        return adfuller(x, maxlag=maxlag, regression=regression, autolag=autolag)[1]
    except (ValueError, np.linalg.LinAlgError):
        return 1.0
