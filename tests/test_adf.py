"""ADF stationarity test: behavioral invariants + the reference's
too-short fallback contract (stationarity.py:150-163)."""

import math

import numpy as np
import pytest

from eristropy_ray.kernels.adf import (
    adf_pvalue_or_one,
    adfuller_c,
    mackinnon_pvalue,
)
from eristropy_ray.kernels.multitest import holm_sidak


def test_white_noise_rejects(rng):
    x = rng.normal(size=200)
    stat, p, _ = adfuller_c(x)
    assert stat < -5
    assert p < 0.001


def test_random_walk_accepts(rng):
    x = np.cumsum(rng.normal(size=300))
    _, p, _ = adfuller_c(x)
    assert p > 0.05


def test_linear_trend_plus_noise_midground(rng):
    t = np.arange(300.0)
    x = 0.5 * t + rng.normal(size=300)
    # the constant-only ADF has no trend term; detrended residual is what
    # the engine feeds it — that must reject
    resid = x - np.polyval(np.polyfit(t, x, 1), t)
    _, p, _ = adfuller_c(resid)
    assert p < 0.01


def test_deterministic(rng):
    x = rng.normal(size=150)
    assert adfuller_c(x) == adfuller_c(x)


def test_short_series_fallback():
    assert adf_pvalue_or_one(np.array([1.0, 2.0])) == 1.0
    assert adf_pvalue_or_one(np.array([3.0])) == 1.0


def test_mackinnon_monotone_and_cutoffs():
    grid = np.linspace(-18, 2.5, 200)
    ps = [mackinnon_pvalue(t) for t in grid]
    assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
    assert mackinnon_pvalue(-30.0) == 0.0
    assert mackinnon_pvalue(5.0) == 1.0
    # published anchor: the 5% asymptotic critical value for tau_c is about
    # -2.86, so p(-2.86) should be near 0.05
    assert abs(mackinnon_pvalue(-2.86) - 0.05) < 0.01


def test_holm_sidak_known_case():
    p = np.array([0.01, 0.04, 0.03, 0.005])
    reject, adj = holm_sidak(p, alpha=0.05)
    # brute-force step-down oracle
    m = 4
    order = np.argsort(p)
    expect = np.zeros(m, dtype=bool)
    for rank, i in enumerate(order):
        thresh = 1 - (1 - 0.05) ** (1 / (m - rank))
        if p[i] <= thresh and (rank == 0 or expect[order[rank - 1]]):
            expect[i] = True
        else:
            break
    np.testing.assert_array_equal(reject, expect)
    assert (adj >= p - 1e-15).all() and (adj <= 1.0).all()


def test_holm_sidak_extremes():
    r, _ = holm_sidak(np.array([1e-9, 1e-8]), alpha=0.05)
    assert r.all()
    r, _ = holm_sidak(np.array([0.9, 0.99]), alpha=0.05)
    assert not r.any()
    r, a = holm_sidak(np.array([]), alpha=0.05)
    assert r.size == 0 and a.size == 0


def test_stationarity_decision_pipeline(rng):
    """ramp+sine fixture analogue: the differenced ramp and sine both become
    stationary; raw ramp does not (tests/test_stationarity.py:70-75)."""
    ramp = np.linspace(0, 100, 100)
    sine = np.sin(np.linspace(0, 2 * np.pi, 100))
    p_raw = np.array([adf_pvalue_or_one(ramp), adf_pvalue_or_one(sine)])
    reject_raw, _ = holm_sidak(p_raw, alpha=0.05)
    assert not reject_raw[0]  # linear ramp is non-stationary
    p_diff = adf_pvalue_or_one(np.diff(ramp) + rng.normal(scale=0.01, size=99))
    assert p_diff < 0.05


# ---------------------------------------------------------------------------
# statsmodels-convention golden: an INDEPENDENT transliteration of the
# adfuller(x, regression='c', autolag='AIC') flow (lagmat trim='both',
# original='in'; prepended constant during autolag; OLS aic = -2llf + 2k;
# min-(aic, lag) tie rule; longest-sample refit; MacKinnon 1994 surface),
# written against the public statsmodels source/docs — NOT sharing code
# with kernels/adf.py. Verifies lag selection + the p-value surface on
# varied series including boundary lengths where Schwert's rule flips.
# ---------------------------------------------------------------------------


def _sm_ols(y, X):
    beta = np.linalg.solve(X.T @ X, X.T @ y)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    n, k = X.shape
    llf = -0.5 * n * (np.log(2 * np.pi) + np.log(ssr / n) + 1.0)
    aic = -2.0 * llf + 2.0 * k
    sigma2 = ssr / (n - k)
    se = np.sqrt(np.diag(sigma2 * np.linalg.inv(X.T @ X)))
    return beta, beta / se, aic


def _sm_adfuller_c(x):
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    xdiff = np.diff(x)
    nobs_d = xdiff.size
    # statsmodels: nobs = x.shape[0] BEFORE differencing drives both the
    # Schwert formula and the n//2 - ntrend - 1 cap (ntrend=1 for 'c')
    maxlag = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
    maxlag = min(n // 2 - 2, maxlag)
    # lagmat(xdiff, maxlag, 'both', 'in'): rows t = maxlag..nobs_d-1,
    # cols [xdiff_t, xdiff_{t-1}, ..., xdiff_{t-maxlag}]
    nobs = nobs_d - maxlag
    xdshort = xdiff[-nobs:]
    lags = np.column_stack(
        [xdiff[maxlag - k : nobs_d - k] for k in range(1, maxlag + 1)]
    ) if maxlag else np.empty((nobs, 0))
    level = x[-nobs - 1 : -1]
    const = np.ones(nobs)
    best = None
    for nlag in range(0, maxlag + 1):
        X = np.column_stack([const, level, lags[:, :nlag]])
        _, _, aic = _sm_ols(xdshort, X)
        key = (aic, nlag)
        if best is None or key < best:
            best = key
    usedlag = best[1]
    nobs2 = nobs_d - usedlag
    xdshort2 = xdiff[-nobs2:]
    lags2 = np.column_stack(
        [xdiff[usedlag - k : nobs_d - k] for k in range(1, usedlag + 1)]
    ) if usedlag else np.empty((nobs2, 0))
    X2 = np.column_stack([x[-nobs2 - 1 : -1], lags2, np.ones(nobs2)])
    _, tvals, _ = _sm_ols(xdshort2, X2)
    return float(tvals[0]), usedlag


def _golden_series():
    rng = np.random.default_rng(2024)
    out = []
    for n in (30, 50, 99, 100, 101, 150, 200, 257):
        out.append(("rw%d" % n, np.cumsum(rng.normal(size=n))))           # unit root
        out.append(("ar%d" % n, _ar1(rng, n, 0.5)))                        # stationary
    for phi in (0.9, 0.95, 0.99):  # near-alpha cases
        out.append(("near%g" % phi, _ar1(rng, 120, phi)))
    out.append(("trend", 0.05 * np.arange(150) + rng.normal(size=150)))
    out.append(("sine", np.sin(np.arange(130) / 3.0) + 0.1 * rng.normal(size=130)))
    out.append(("ma", np.convolve(rng.normal(size=160), [1, 0.8], "valid")))
    out.append(("het", rng.normal(size=140) * np.linspace(0.5, 3.0, 140)))
    return out


def _ar1(rng, n, phi):
    x = np.zeros(n)
    e = rng.normal(size=n)
    for i in range(1, n):
        x[i] = phi * x[i - 1] + e[i]
    return x


def test_adfuller_matches_statsmodels_conventions():
    from eristropy_ray.kernels.adf import adfuller_c, mackinnon_pvalue

    series = _golden_series()
    assert len(series) >= 20
    for name, x in series:
        want_stat, want_lag = _sm_adfuller_c(x)
        got_stat, got_p, got_lag = adfuller_c(x)
        assert got_lag == want_lag, (name, got_lag, want_lag)
        np.testing.assert_allclose(got_stat, want_stat, rtol=1e-8, err_msg=name)
        np.testing.assert_allclose(
            got_p, mackinnon_pvalue(want_stat), rtol=1e-10, err_msg=name
        )


# ---------------------------------------------------------------------------
# round-5 user-surface widening: regression='ct' and autolag=None, pinned by
# the same independent-transliteration approach plus the published MacKinnon
# 'ct' asymptotic critical values.
# ---------------------------------------------------------------------------


def _sm_adfuller_ct(x):
    """Independent transliteration of adfuller(x, regression='ct',
    autolag='AIC'): add_trend appends const then t=1..nobs; autolag
    design prepends the deterministic terms; final refit appends them."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    xdiff = np.diff(x)
    nobs_d = xdiff.size
    maxlag = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
    maxlag = min(n // 2 - 3, maxlag)  # ntrend=2 cap: n//2 - ntrend - 1
    nobs = nobs_d - maxlag
    xdshort = xdiff[-nobs:]
    lags = np.column_stack(
        [xdiff[maxlag - k : nobs_d - k] for k in range(1, maxlag + 1)]
    ) if maxlag else np.empty((nobs, 0))
    level = x[-nobs - 1 : -1]
    const = np.ones(nobs)
    trend = np.arange(1.0, nobs + 1.0)
    best = None
    for nlag in range(0, maxlag + 1):
        X = np.column_stack([const, trend, level, lags[:, :nlag]])
        _, _, aic = _sm_ols(xdshort, X)
        key = (aic, nlag)
        if best is None or key < best:
            best = key
    usedlag = best[1]
    nobs2 = nobs_d - usedlag
    xdshort2 = xdiff[-nobs2:]
    lags2 = np.column_stack(
        [xdiff[usedlag - k : nobs_d - k] for k in range(1, usedlag + 1)]
    ) if usedlag else np.empty((nobs2, 0))
    X2 = np.column_stack(
        [x[-nobs2 - 1 : -1], lags2, np.ones(nobs2), np.arange(1.0, nobs2 + 1.0)]
    )
    _, tvals, _ = _sm_ols(xdshort2, X2)
    return float(tvals[0]), usedlag


def test_adfuller_ct_matches_transliteration():
    from eristropy_ray.kernels.adf import adfuller, mackinnon_pvalue

    for name, x in _golden_series():
        want_stat, want_lag = _sm_adfuller_ct(x)
        got_stat, got_p, got_lag = adfuller(x, regression="ct")
        assert got_lag == want_lag, (name, got_lag, want_lag)
        np.testing.assert_allclose(got_stat, want_stat, rtol=1e-8, err_msg=name)
        # deep-tail p-values amplify the stat's last-ulp difference, so
        # the pin is rtol 1e-6 with a tail atol (stat itself is 1e-8)
        np.testing.assert_allclose(
            got_p,
            mackinnon_pvalue(want_stat, "ct"),
            rtol=1e-6,
            atol=1e-18,
            err_msg=name,
        )


def test_adfuller_fixed_lag_matches_direct_regression():
    from eristropy_ray.kernels.adf import adfuller

    rng = np.random.default_rng(77)
    x = np.cumsum(rng.normal(size=180))
    for reg in ("c", "ct"):
        for lag in (0, 1, 3):
            got_stat, _, got_lag = adfuller(
                x, regression=reg, autolag=None, maxlag=lag
            )
            assert got_lag == lag
            # direct longest-sample regression, independently assembled
            xdiff = np.diff(x)
            nobs = xdiff.size - lag
            cols = [x[-nobs - 1 : -1]]
            for k in range(1, lag + 1):
                cols.append(xdiff[lag - k : xdiff.size - k])
            cols.append(np.ones(nobs))
            if reg == "ct":
                cols.append(np.arange(1.0, nobs + 1.0))
            _, tvals, _ = _sm_ols(xdiff[-nobs:], np.column_stack(cols))
            np.testing.assert_allclose(got_stat, float(tvals[0]), rtol=1e-8)
    # autolag=None with maxlag unset: statsmodels computes the Schwert
    # default maxlag FIRST and uses it as the fixed lag — so must we
    import math as _math

    n = x.size
    want = min(n // 2 - 1 - 1, int(_math.ceil(12.0 * (n / 100.0) ** 0.25)))
    assert adfuller(x, autolag=None)[2] == want
    # and the statistic equals the explicit maxlag=want fixed-lag run
    assert adfuller(x, autolag=None)[0] == adfuller(x, autolag=None, maxlag=want)[0]


def test_mackinnon_ct_published_critical_values():
    from eristropy_ray.kernels.adf import mackinnon_pvalue

    # MacKinnon (2010) asymptotic critical values for tau_ct, N=1
    assert abs(mackinnon_pvalue(-3.96, "ct") - 0.01) < 0.003
    assert abs(mackinnon_pvalue(-3.41, "ct") - 0.05) < 0.003
    assert abs(mackinnon_pvalue(-3.12, "ct") - 0.10) < 0.005
    # small/large-p branches join continuously at tau_star_ct = -2.89
    lo = mackinnon_pvalue(-2.890001, "ct")
    hi = mackinnon_pvalue(-2.889999, "ct")
    assert abs(lo - hi) < 1e-3
    # monotone over the supported range
    grid = np.linspace(-16, 0.69, 300)
    ps = [mackinnon_pvalue(t, "ct") for t in grid]
    assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))


def test_adfuller_ct_detects_trend_stationarity(rng):
    from eristropy_ray.kernels.adf import adfuller

    # trend-stationary series: 'ct' rejects the unit root, 'c' cannot
    t = np.arange(300.0)
    x = 0.5 * t + rng.normal(size=300)
    _, p_ct, _ = adfuller(x, regression="ct")
    _, p_c, _ = adfuller(x, regression="c")
    assert p_ct < 0.01
    assert p_c > 0.10


def test_stationary_config_adf_validation():
    import pytest as _pytest

    from eristropy_ray.pipelines.stationary import StationaryConfig

    StationaryConfig(adf_regression="ct", adf_autolag=None, adf_maxlag=2)
    StationaryConfig(adf_regression="ctt", adf_autolag="BIC")
    StationaryConfig(adf_regression="n", adf_autolag="t-stat")
    # statsmodels' deprecated alias normalizes
    assert StationaryConfig(adf_regression="nc").adf_regression == "n"
    with _pytest.raises(ValueError):
        StationaryConfig(adf_regression="ctttt")
    with _pytest.raises(ValueError):
        StationaryConfig(adf_autolag="HQIC")
    with _pytest.raises(ValueError):
        StationaryConfig(adf_maxlag=-1)


# ---------------------------------------------------------------------------
# full statsmodels user surface ('n'/'ctt' regressions; BIC/t-stat autolag),
# pinned by the same independent-transliteration approach. The
# transliteration uses pinv-based OLS (statsmodels' own default solver)
# in the statsmodels column order (deterministic terms PREPENDED during
# selection, appended in the final refit).
# ---------------------------------------------------------------------------


def _sm_ols_ic(y, X):
    """pinv OLS -> (beta, tvals, aic, bic), statsmodels definitions."""
    xtx_inv = np.linalg.pinv(X.T @ X)
    beta = xtx_inv @ (X.T @ y)
    resid = y - X @ beta
    ssr = float(resid @ resid)
    n, k = X.shape
    llf = -0.5 * n * (np.log(2 * np.pi) + np.log(ssr / n) + 1.0)
    aic = -2.0 * llf + 2.0 * k
    bic = -2.0 * llf + np.log(n) * k
    sigma2 = ssr / (n - k)
    se = np.sqrt(np.diag(sigma2 * xtx_inv))
    return beta, beta / se, aic, bic


def _sm_adfuller_any(x, regression, autolag):
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    xdiff = np.diff(x)
    nobs_d = xdiff.size
    ntrend = {"n": 0, "c": 1, "ct": 2, "ctt": 3}[regression]
    maxlag = int(np.ceil(12.0 * (n / 100.0) ** 0.25))
    maxlag = min(n // 2 - ntrend - 1, maxlag)
    nobs = nobs_d - maxlag
    xdshort = xdiff[-nobs:]
    lags = np.column_stack(
        [xdiff[maxlag - k : nobs_d - k] for k in range(1, maxlag + 1)]
    ) if maxlag else np.empty((nobs, 0))
    level = x[-nobs - 1 : -1]

    def dets(m):
        t = np.arange(1.0, m + 1.0)
        return {
            "n": [],
            "c": [np.ones(m)],
            "ct": [np.ones(m), t],
            "ctt": [np.ones(m), t, t * t],
        }[regression]

    if autolag == "t-stat":
        stop = 1.6448536269514722
        usedlag = 0
        for nlag in range(maxlag, -1, -1):
            X = np.column_stack([*dets(nobs), level, lags[:, :nlag]])
            _, tvals, _, _ = _sm_ols_ic(xdshort, X)
            if abs(float(tvals[-1])) > stop:
                usedlag = nlag
                break
    else:
        best = None
        for nlag in range(0, maxlag + 1):
            X = np.column_stack([*dets(nobs), level, lags[:, :nlag]])
            _, _, aic, bic = _sm_ols_ic(xdshort, X)
            key = ((aic if autolag == "AIC" else bic), nlag)
            if best is None or key < best:
                best = key
        usedlag = best[1]
    nobs2 = nobs_d - usedlag
    xdshort2 = xdiff[-nobs2:]
    lags2 = np.column_stack(
        [xdiff[usedlag - k : nobs_d - k] for k in range(1, usedlag + 1)]
    ) if usedlag else np.empty((nobs2, 0))
    X2 = np.column_stack([x[-nobs2 - 1 : -1], lags2, *dets(nobs2)])
    _, tvals, _, _ = _sm_ols_ic(xdshort2, X2)
    return float(tvals[0]), usedlag


@pytest.mark.parametrize("regression", ["n", "ctt"])
def test_adfuller_n_ctt_match_transliteration(regression):
    from eristropy_ray.kernels.adf import adfuller

    for name, x in _golden_series():
        want_stat, want_lag = _sm_adfuller_any(x, regression, "AIC")
        got_stat, got_p, got_lag = adfuller(x, regression=regression)
        assert got_lag == want_lag, (name, got_lag, want_lag)
        # 'ctt' designs carry an unnormalized t² column (condition number
        # ~1e10+), so the cross-solver pin is looser than 'c'/'ct''s 1e-8
        np.testing.assert_allclose(
            got_stat, want_stat, rtol=1e-6, err_msg=name
        )
        np.testing.assert_allclose(
            got_p,
            mackinnon_pvalue(want_stat, regression),
            rtol=1e-4,
            atol=1e-12,
            err_msg=name,
        )


@pytest.mark.parametrize("autolag", ["BIC", "t-stat"])
def test_adfuller_bic_tstat_match_transliteration(autolag):
    from eristropy_ray.kernels.adf import adfuller

    lag_diffs = 0
    for name, x in _golden_series():
        want_stat, want_lag = _sm_adfuller_any(x, "c", autolag)
        got_stat, got_p, got_lag = adfuller(x, regression="c", autolag=autolag)
        assert got_lag == want_lag, (name, got_lag, want_lag)
        np.testing.assert_allclose(got_stat, want_stat, rtol=1e-8, err_msg=name)
    # BIC must actually differ from AIC somewhere on the suite (the
    # log(n)·k penalty prunes lags), else the switch is untested
    if autolag == "BIC":
        for name, x in _golden_series():
            if adfuller(x, autolag="BIC")[2] != adfuller(x, autolag="AIC")[2]:
                lag_diffs += 1
        assert lag_diffs > 0


def test_mackinnon_n_ctt_published_critical_values():
    # Dickey-Fuller no-deterministic row, N=1 (MacKinnon 2010)
    assert abs(mackinnon_pvalue(-2.56, "n") - 0.01) < 0.003
    assert abs(mackinnon_pvalue(-1.94, "n") - 0.05) < 0.003
    assert abs(mackinnon_pvalue(-1.62, "n") - 0.10) < 0.005
    # constant + linear + quadratic trend row
    assert abs(mackinnon_pvalue(-4.37, "ctt") - 0.01) < 0.003
    assert abs(mackinnon_pvalue(-3.83, "ctt") - 0.05) < 0.003
    assert abs(mackinnon_pvalue(-3.55, "ctt") - 0.10) < 0.005
    # branch continuity at each tau_star; monotone over the range.
    # (The published 'n' small/large fits join ~4e-3 apart — looser than
    # 'c'/'ct'/'ctt'; the tolerance mirrors the surface, not our code.)
    for reg, star, join_tol, lo_end, hi_end in (
        ("n", -1.04, 5e-3, -19.0, 2.0),
        ("ctt", -3.21, 1e-3, -17.1, 0.53),
    ):
        assert abs(
            mackinnon_pvalue(star - 1e-6, reg) - mackinnon_pvalue(star + 1e-6, reg)
        ) < join_tol
        grid = np.linspace(lo_end, hi_end, 300)
        ps = [mackinnon_pvalue(t, reg) for t in grid]
        assert all(a <= b + 1e-12 for a, b in zip(ps, ps[1:]))
    # 'n' has no upper cutoff short of +inf (tau_max_n = inf): a large
    # positive stat still maps through the surface, never hard-1.0 clamps
    assert mackinnon_pvalue(5.0, "n") <= 1.0


def test_adfuller_nc_alias_and_fixed_lag_n_ctt():
    from eristropy_ray.kernels.adf import adfuller

    rng = np.random.default_rng(99)
    x = np.cumsum(rng.normal(size=150))
    assert adfuller(x, regression="nc") == adfuller(x, regression="n")
    for reg in ("n", "ctt"):
        for lag in (0, 2):
            got_stat, _, got_lag = adfuller(
                x, regression=reg, autolag=None, maxlag=lag
            )
            assert got_lag == lag
            xdiff = np.diff(x)
            nobs = xdiff.size - lag
            cols = [x[-nobs - 1 : -1]]
            for k in range(1, lag + 1):
                cols.append(xdiff[lag - k : xdiff.size - k])
            if reg == "ctt":
                t = np.arange(1.0, nobs + 1.0)
                cols.extend([np.ones(nobs), t, t * t])
            _, tvals, _, _ = _sm_ols_ic(xdiff[-nobs:], np.column_stack(cols))
            np.testing.assert_allclose(got_stat, float(tvals[0]), rtol=1e-6)
