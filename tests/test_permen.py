"""Permutation entropy (Bandt & Pompe 2002) invariants."""

import math

import numpy as np

from eristropy_ray.kernels.permen import ordinal_patterns, permen


def test_bandt_pompe_worked_example():
    # The canonical example from the paper: x = (4,7,9,10,6,11,3), order 2:
    # four ascents, two descents -> H2 = -(4/6 ln 4/6 + 2/6 ln 2/6).
    x = np.array([4.0, 7.0, 9.0, 10.0, 6.0, 11.0, 3.0])
    want = -(4 / 6 * math.log(4 / 6) + 2 / 6 * math.log(2 / 6))
    assert math.isclose(permen(x, order=2, normalize=False), want, rel_tol=1e-12)
    assert math.isclose(permen(x, order=2), want / math.log(2), rel_tol=1e-12)


def test_monotone_is_zero():
    assert permen(np.arange(100.0), order=3) == 0.0
    assert permen(-np.arange(100.0), order=3) == 0.0


def test_constant_is_zero_ties_stable():
    # all windows tie; stable argsort maps them all to the identity pattern
    assert permen(np.zeros(50), order=3) == 0.0


def test_random_near_one(rng):
    x = rng.normal(size=20000)
    h = permen(x, order=3)
    assert 0.99 < h <= 1.0


def test_too_short_nan():
    assert math.isnan(permen(np.array([1.0, 2.0]), order=3))
    assert math.isnan(permen(np.array([]), order=3))


def test_delay_embedding(rng):
    x = rng.normal(size=500)
    codes1 = ordinal_patterns(x, order=3, delay=1)
    codes2 = ordinal_patterns(x, order=3, delay=2)
    assert codes1.size == 498 and codes2.size == 496
    # delay-2 patterns of the even subsequence appear in delay-1 of that sub
    sub = ordinal_patterns(x[::2], order=3, delay=1)
    assert np.array_equal(codes2[::2], sub[: codes2[::2].size])
