"""Bootstrap-MSE/SE kernel invariants (reference
tests/test_sample_entropy.py:198-247, 525-544)."""

import numpy as np

from eristropy_ray.kernels.sampen_boot import (
    sampen_bootstrap_mse,
    sampen_bootstrap_se,
)


def test_mse_nonnegative(rng):
    x = rng.normal(size=200)
    assert sampen_bootstrap_mse(x, 2, 0.2, 0.5, n_boot=30, seed=1, key=(1,)) >= 0


def test_constant_signal_mse_zero():
    x = np.full(120, 3.0)
    # every bootstrap replicate of a constant is the constant; SampEn 0
    assert sampen_bootstrap_mse(x, 2, 0.2, 0.5, n_boot=10, seed=1) == 0.0
    assert sampen_bootstrap_se(x, 2, 0.2, 0.5, n_boot=10, seed=1) == 0.0


def test_mse_nonincreasing_with_length(rng):
    x = rng.normal(size=400)
    short = sampen_bootstrap_mse(x[:60], 1, 0.3, 0.5, n_boot=60, seed=2, key=(1,))
    long_ = sampen_bootstrap_mse(x, 1, 0.3, 0.5, n_boot=60, seed=2, key=(2,))
    assert long_ <= short


def test_se_nonnegative_and_deterministic(rng):
    x = rng.normal(size=150)
    a = sampen_bootstrap_se(x, 2, 0.25, 0.4, n_boot=25, seed=3, key=(9,))
    b = sampen_bootstrap_se(x, 2, 0.25, 0.4, n_boot=25, seed=3, key=(9,))
    assert a == b >= 0
