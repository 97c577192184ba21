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
