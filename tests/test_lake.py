"""Lake analytic CP kernel: bit-for-bit vs a direct transliteration of
reference extras.py:51-191, plus objective sanity."""

import math

import numpy as np

from eristropy_ray.kernels.lake import (
    bootstrap_objective,
    counting_objective,
    cp_mean_and_sd,
    sampen_and_analytic_se,
)
from eristropy_ray.kernels.sampen import sampen


def _cp_reference_loop(x, mm, r):
    """Direct port of the reference kernel — conformance oracle."""
    n = x.size
    mm += 1
    MM = 2 * mm
    run = np.zeros(n, dtype=np.int32)
    run1 = np.zeros(n, dtype=np.int32)
    R1 = np.zeros((n, MM), dtype=np.int32)
    R2 = np.zeros((n, MM), dtype=np.int32)
    F = np.zeros((n, MM), dtype=np.int32)
    F1 = np.zeros((n, mm), dtype=np.int32)
    F2 = np.zeros((n, mm), dtype=np.int32)
    K = np.zeros(((mm + 1) * mm), dtype=np.float64)
    A = np.zeros(mm)
    B = np.zeros(mm)
    p = np.zeros(mm)
    v1 = np.zeros(mm)
    v2 = np.zeros(mm)
    s1 = np.zeros(mm)
    n1 = np.zeros(mm)
    n2 = np.zeros(mm)
    for i in range(n - 1):
        nj = n - i - 1
        x1 = x[i]
        for jj in range(nj):
            j = jj + i + 1
            if abs(x[j] - x1) < r:
                run[jj] = run1[jj] + 1
                m1 = mm if mm < run[jj] else run[jj]
                for m in range(m1):
                    A[m] += 1
                    if j < n - 1:
                        B[m] += 1
                    F1[i, m] += 1
                    F[i, m] += 1
                    F[j, m] += 1
            else:
                run[jj] = 0
        for j in range(MM):
            run1[j] = run[j]
            R1[i, j] = run[j]
        if nj > MM - 1:
            for j in range(MM, nj):
                run1[j] = run[j]
    for i in range(1, MM):
        for j in range(i - 1):
            R2[i, j] = R1[i - j - 1, j]
    for i in range(MM, n):
        for j in range(MM):
            R2[i, j] = R1[i - j - 1, j]
    for i in range(n):
        for m in range(mm):
            FF = F[i, m]
            F2[i, m] = FF - F1[i, m]
            K[m * (mm + 1)] += FF * (FF - 1)
    for m in range(mm - 1, 0, -1):
        B[m] = B[m - 1]
    B[0] = n * (n - 1) / 2
    with np.errstate(invalid="ignore", divide="ignore"):
        for m in range(mm):
            p[m] = A[m] / B[m]
            v2[m] = p[m] * (1 - p[m]) / B[m]
    dd = 1
    for m in range(mm):
        d2 = m + 1 if m + 1 < mm - 1 else mm - 1
        for d in range(d2 + 1):
            for i1 in range(d + 1, n):
                i2 = i1 - d - 1
                nm1 = F1[i1, m]
                nm3 = F1[i2, m]
                nm2 = F2[i1, m]
                nm4 = F2[i2, m]
                for j in range(dd - 1):
                    if R1[i1, j] >= m + 1:
                        nm1 -= 1
                    if R2[i1, j] >= m + 1:
                        nm4 -= 1
                for j in range(2 * (d + 1)):
                    if R2[i1, j] >= m + 1:
                        nm2 -= 1
                for j in range(2 * d + 1):
                    if R1[i2, j] >= m + 1:
                        nm3 -= 1
                K[d + 1 + (mm + 1) * m] += 2 * (nm1 + nm2) * (nm3 + nm4)
    n1[0] = n * (n - 1) * (n - 2)
    for m in range(mm - 1):
        for j in range(m + 2):
            n1[m + 1] += K[j + (mm + 1) * m]
    for m in range(mm):
        for j in range(m + 1):
            n2[m] += K[j + (mm + 1) * m]
    with np.errstate(invalid="ignore", divide="ignore"):
        for m in range(mm):
            v1[m] = v2[m]
            dv = (n2[m] - n1[m] * p[m] * p[m]) / (B[m] * B[m])
            if dv > 0:
                v1[m] += dv
            s1[m] = math.sqrt(v1[m])
    return p[-1], s1[-1]


def _eq(a, b):
    return (math.isnan(a) and math.isnan(b)) or a == b


def test_bit_for_bit_vs_reference_loop(rng):
    for _ in range(25):
        n = int(rng.integers(16, 80))
        m = int(rng.integers(1, 4))
        if 2 * (m + 1) >= n - 2:
            continue
        x = rng.normal(size=n)
        r = float(rng.uniform(0.15, 1.2))
        want = _cp_reference_loop(x.copy(), m, r)
        got = cp_mean_and_sd(x, m, r)
        assert _eq(want[0], got[0]) and _eq(want[1], got[1])


def test_cp_in_unit_interval(rng):
    x = rng.normal(size=120)
    cp, sd = cp_mean_and_sd(x, 2, 0.5)
    assert 0 < cp <= 1
    assert sd > 0


def test_analytic_se_consistency(rng):
    x = rng.normal(size=150)
    s, se = sampen_and_analytic_se(x, 2, 0.5)
    assert s > 0 and se > 0
    # Lake's CP-based SampEn should be close to (not identical to) the
    # template-count SampEn — different boundary conventions
    assert abs(s - sampen(x, 2, 0.5)) < 0.2


def test_counting_objective_finite_and_nan(rng):
    x = rng.normal(size=100)
    assert np.isfinite(counting_objective(x, 2, 0.5))


def test_bootstrap_objective_positive_and_deterministic(rng):
    x = rng.normal(size=80)
    a = bootstrap_objective(x, 2, 0.5, n_boot=20, seed=5, key=(1,))
    b = bootstrap_objective(x, 2, 0.5, n_boot=20, seed=5, key=(1,))
    assert a == b and a > 0
