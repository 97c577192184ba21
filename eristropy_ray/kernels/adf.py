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
# no-deterministic ('n'), constant ('c'), constant+trend ('ct') and
# constant+trend+trend² ('ctt') regressions. Published in MacKinnon
# (1994) "Approximate asymptotic distribution functions for unit-root
# and cointegration tests". Each row is pinned in test_adf.py by its
# published asymptotic critical values — e.g. 'ct': p(-3.96)=0.01,
# p(-3.41)=0.05, p(-3.12)=0.10; 'n': p(-2.56)=0.01, p(-1.94)=0.05,
# p(-1.62)=0.10 (the classic Dickey-Fuller no-constant row); 'ctt':
# p(-4.37)=0.01, p(-3.83)=0.05, p(-3.55)=0.10 — and by small/large
# branch continuity at tau_star.
_TAU_SURFACE = {
    # regression: (tau_max, tau_min, tau_star, smallp, largep)
    "n": (
        math.inf, -19.04, -1.04,
        (0.6344, 1.2378, 0.032496),  # p = Phi(c0 + c1 t + c2 t^2)
        (0.4797, 0.93557, -0.06999, 0.033066),
    ),
    "c": (
        2.74, -18.83, -1.61,
        (2.1659, 1.4412, 0.038269),
        (1.7339, 0.93202, -0.12745, -0.010368),
    ),
    "ct": (
        0.7, -16.18, -2.89,
        (3.2512, 1.6047, 0.049588),
        (2.5261, 0.61654, -0.37956, -0.060285),
    ),
    "ctt": (
        0.54, -17.17, -3.21,
        (4.0003, 1.658, 0.048288),
        (3.0778, 0.49529, -0.41477, -0.059359),
    ),
}

# deterministic-regressor count per regression (the cap's subtrahend)
_NTREND = {"n": 0, "c": 1, "ct": 2, "ctt": 3}


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


def _ols_tstat_and_ic(
    y: np.ndarray, X: np.ndarray, col: int = 0
) -> tuple[float, float, float]:
    """(t-stat of column ``col``'s coefficient, AIC, BIC) of OLS y ~ X.

    The AIC float-expression order is pinned by the golden 'c'+AIC path
    (test_adf.py transliteration goldens) — do not reorder.
    """
    n, k = X.shape
    beta, _, rank, _ = np.linalg.lstsq(X, y, rcond=None)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    # Gaussian log-likelihood at the MLE; AIC = -2 llf + 2 k,
    # BIC = -2 llf + log(n) k (statsmodels' definitions)
    if ssr <= 0.0:
        ssr = np.finfo(np.float64).tiny
    llf = -0.5 * n * (math.log(2.0 * math.pi) + math.log(ssr / n) + 1.0)
    aic = -2.0 * llf + 2.0 * rank
    bic = -2.0 * llf + math.log(n) * rank
    dof = n - rank
    if dof <= 0:
        return math.nan, float(aic), float(bic)
    sigma2 = ssr / dof
    xtx_inv = np.linalg.pinv(X.T @ X)
    se = math.sqrt(max(sigma2 * xtx_inv[col, col], 0.0))
    t = beta[col] / se if se > 0 else math.nan
    return float(t), float(aic), float(bic)


def _ols_tstat0_and_aic(y: np.ndarray, X: np.ndarray) -> tuple[float, float]:
    """(t-stat of first column's coefficient, AIC) of OLS y ~ X."""
    t0, aic, _ = _ols_tstat_and_ic(y, X, 0)
    return t0, aic


def _trend_cols(nobs: int, regression: str) -> list[np.ndarray]:
    """Deterministic regressors appended after the stochastic columns:
    'n' -> []; 'c' -> [1]; 'ct' -> [1, t]; 'ctt' -> [1, t, t²] with
    t = 1..nobs (the statsmodels ``add_trend`` convention)."""
    if regression == "n":
        return []
    cols = [np.ones(nobs)]
    if regression in ("ct", "ctt"):
        t = np.arange(1.0, nobs + 1.0)
        cols.append(t)
        if regression == "ctt":
            cols.append(t * t)
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

    regression: 'c' (constant — the reference's only configuration),
        'ct' (constant + linear trend), 'ctt' (constant + linear +
        quadratic trend) or 'n' (no deterministic terms; alias 'nc'),
        each with its MacKinnon response surface.
    autolag: 'AIC' selects the lag by AIC over 0..maxlag on the common
        sample (library default); 'BIC' likewise by BIC; 't-stat' walks
        down from maxlag and keeps the first lag whose highest-order
        Δ-lag coefficient is significant at 5% (|t| > 1.6449, the
        statsmodels convention); None uses ``maxlag`` as the FIXED lag
        (statsmodels ``autolag=None`` semantics; when maxlag is also
        None the Schwert-rule default below is the fixed lag, exactly
        as statsmodels computes the maxlag default before branching on
        autolag).

    Returns:
        (statistic, pvalue, usedlag)

    Raises:
        ValueError: series too short for any ADF regression — callers
        mirror the reference's fallback (p = 1.0, stationarity.py:158-163).
    """
    if regression == "nc":  # statsmodels' deprecated alias
        regression = "n"
    if regression not in _TAU_SURFACE:
        raise ValueError(f"regression must be one of {sorted(_TAU_SURFACE)}")
    if autolag not in ("AIC", "BIC", "t-stat", None):
        raise ValueError(
            "autolag must be 'AIC', 'BIC', 't-stat' or None (fixed lag)"
        )
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    ntrend = _NTREND[regression]
    if n and np.all(x == x[0]):
        # statsmodels raises "Invalid input, x is constant"; callers map
        # the ValueError to the reference's p = 1.0 fallback
        raise ValueError("invalid input, x is constant")
    if maxlag is None:
        # statsmodels convention: Schwert's rule on the FULL length n
        # (maxlag is chosen BEFORE differencing; its "-1 for the diff"
        # comment refers to the -1 term in the cap n//2 - ntrend - 1,
        # not to measuring the formula on n-1). Computed BEFORE the
        # autolag branch — with autolag=None this Schwert value IS the
        # fixed lag, matching statsmodels adfuller(x, autolag=None).
        maxlag = int(math.ceil(12.0 * (n / 100.0) ** 0.25))
        maxlag = min(n // 2 - ntrend - 1, maxlag)
    if maxlag < 0 or n < 4:
        raise ValueError("sample size is too short to use selected regression component")
    if autolag is None:
        usedlag = maxlag
    else:
        # IC selection: all candidate lags fit on the common (shortest) sample
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
        if autolag == "t-stat":
            # statsmodels: walk DOWN from maxlag, keep the first lag whose
            # highest-order coefficient (the level itself at lag 0 —
            # tvalues[-1] with trend prepended) is significant at 5%
            stop = 1.6448536269514722  # Phi^{-1}(0.95)
            usedlag = 0
            for lag in range(maxlag, -1, -1):
                X = np.column_stack([level, *lag_cols[:lag], *trend])
                if X.shape[0] <= X.shape[1]:
                    continue
                t_last, _, _ = _ols_tstat_and_ic(y, X, col=lag)
                if np.isfinite(t_last) and abs(t_last) > stop:
                    usedlag = lag
                    break
        else:
            ic_index = 1 if autolag == "AIC" else 2
            best = (math.inf, 0)
            for lag in range(0, maxlag + 1):
                X = np.column_stack([level, *lag_cols[:lag], *trend])
                if X.shape[0] <= X.shape[1]:
                    break
                ic = _ols_tstat_and_ic(y, X)[ic_index]
                if ic < best[0]:
                    best = (ic, lag)
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
