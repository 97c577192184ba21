"""Stationary-bootstrap structural invariants (reference
tests/test_bootstrap.py:12-76) + counter-based determinism."""

import numpy as np

from eristropy_ray.kernels.bootstrap import (
    _geom_block_length,
    stable_key,
    stationary_bootstrap,
    stationary_bootstrap_indices,
)


def test_shape_dtype_and_membership(rng):
    x = rng.normal(size=200)
    X = stationary_bootstrap(x, p=0.5, n_boot=25, seed=7, key=(1,))
    assert X.shape == (25, 200) and X.dtype == np.float64
    assert np.isin(X, x).all()


def test_indices_within_bounds(rng):
    g = np.random.default_rng(0)
    idx = stationary_bootstrap_indices(100, 0.3, g)
    assert idx.shape == (100,)
    assert idx.min() >= 0 and idx.max() < 100


def test_geom_block_length_mean():
    g = np.random.default_rng(1)
    p = 0.25
    draws = [_geom_block_length(float(g.random()), p) for _ in range(20000)]
    assert abs(np.mean(draws) - 1 / p) < 0.1
    assert min(draws) >= 1


def test_deterministic_per_key(rng):
    x = rng.normal(size=64)
    a = stationary_bootstrap(x, 0.5, 10, seed=3, key=(42, 1))
    b = stationary_bootstrap(x, 0.5, 10, seed=3, key=(42, 1))
    c = stationary_bootstrap(x, 0.5, 10, seed=3, key=(42, 2))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_replicates_differ(rng):
    x = rng.normal(size=128)
    X = stationary_bootstrap(x, 0.5, 20, seed=0)
    assert len({tuple(row) for row in X}) > 1


def test_stable_key_cross_process_stable():
    # FNV-1a of the string form — must never change between releases
    assert stable_key("abc") == (88168267,)
    assert stable_key(7, "x") == (7, 2248283911)


def test_geom_block_length_distribution_ks():
    """Distributional check (reference tests/test_utils.py:64-77 uses a
    scipy KS test vs np.random.geometric; scipy is unavailable, so the
    two-sample KS statistic is computed directly and compared with the
    95% critical value)."""
    g = np.random.default_rng(11)
    p = 0.3
    ours = np.array([_geom_block_length(float(g.random()), p) for _ in range(4000)])
    ref = np.random.default_rng(12).geometric(p, size=4000)
    values = np.union1d(ours, ref)
    cdf_a = np.searchsorted(np.sort(ours), values, side="right") / ours.size
    cdf_b = np.searchsorted(np.sort(ref), values, side="right") / ref.size
    ks = np.abs(cdf_a - cdf_b).max()
    crit = 1.36 * np.sqrt(2 / 4000)  # alpha = 0.05, equal sample sizes
    assert ks < crit, (ks, crit)
