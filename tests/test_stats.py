"""ddof conventions pinned (SURVEY.md §7.4): standard_error is population
SD (ddof=0) despite its name; zscore uses sample SD (ddof=1)."""

import math

import numpy as np

from eristropy_ray.kernels.difference import difference
from eristropy_ray.kernels.stats import (
    mean,
    mean_squared_error,
    standard_error,
    zscore,
)
import pytest


def test_mean_matches_numpy(rng):
    x = rng.normal(size=257)
    assert mean(x) == np.mean(x)


def test_standard_error_is_population_sd(rng):
    x = rng.normal(size=100)
    assert math.isclose(standard_error(x), np.std(x, ddof=0), rel_tol=1e-14)
    assert standard_error(np.full(10, 3.0)) == 0.0


def test_mse_docstring_example():
    y = np.array([1.0, 2.0, 3.0])
    yhat = np.array([1.5, 2.2, 2.8])
    assert math.isclose(mean_squared_error(y, yhat), 0.11, rel_tol=1e-12)


def test_zscore_matches_pandas_transform(rng):
    import pandas as pd

    x = rng.normal(size=50) * 3 + 7
    s = pd.Series(x)
    want = ((s - s.mean()) / s.std()).to_numpy()  # pandas std: ddof=1
    np.testing.assert_allclose(zscore(x), want, rtol=1e-13)


def test_zscore_degenerate():
    assert np.isnan(zscore(np.full(5, 2.0))).all()


def test_difference_basic():
    np.testing.assert_array_equal(
        difference(np.array([1.0, 3.0, 6.0, 10.0, 15.0])), [2, 3, 4, 5]
    )


def test_difference_errors():
    with pytest.raises(ValueError):
        difference(np.array([1.0]))
    with pytest.raises(ValueError):
        difference(np.array([1.0, np.nan]))
    with pytest.raises(ValueError):
        difference(np.array([1.0, np.inf]))
