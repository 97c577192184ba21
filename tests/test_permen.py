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


def test_codes3_matches_argsort_path(rng):
    """The comparison-based order-3 fast path must emit the exact integers
    of the generic stable-argsort path — ties, infs, constants included."""
    from eristropy_ray.kernels.permen import _codes3

    def argsort_codes(x, delay=1):
        n_win = x.size - 2 * delay
        idx = np.arange(n_win)[:, None] + np.arange(3)[None, :] * delay
        perm = np.argsort(x[idx], axis=1, kind="stable")
        return perm @ (3 ** np.arange(3, dtype=np.int64))

    cases = [
        rng.normal(size=200),
        np.repeat(rng.normal(size=50), 4),  # heavy ties
        rng.integers(0, 3, size=300).astype(float),  # dense ties
        np.concatenate(
            [rng.normal(size=50), [np.inf, np.inf, -np.inf], rng.normal(size=50)]
        ),
        np.arange(100.0),
        np.arange(100.0)[::-1].copy(),
        np.zeros(50),
    ]
    for x in cases:
        for d in (1, 2):
            got = _codes3(x[: x.size - 2 * d], x[d : x.size - d], x[2 * d :])
            assert np.array_equal(got, argsort_codes(x, d))
        # the public entry point routes order-3 through the fast path
        assert np.array_equal(ordinal_patterns(x, 3, 1), argsort_codes(x, 1))


def test_nan_input_takes_argsort_path():
    """NaN-bearing input must keep the argsort semantics (NaN sorts last);
    the comparison fast path would rank it first."""
    x = np.array([1.0, np.nan, 2.0, 0.5, 3.0, np.nan, 1.5])
    idx = np.arange(x.size - 2)[:, None] + np.arange(3)[None, :]
    perm = np.argsort(x[idx], axis=1, kind="stable")
    expect = perm @ (3 ** np.arange(3, dtype=np.int64))
    assert np.array_equal(ordinal_patterns(x, 3, 1), expect)
