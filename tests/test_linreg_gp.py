"""Linear-regression and GP detrending kernels vs their numpy oracles and
the reference's pinned golden values (tests/test_gp.py:92-141)."""

import math

import numpy as np
import pandas as pd

from eristropy_ray.kernels.gp import (
    cholesky_solve,
    detrend_gp,
    draw_ls_candidates,
    find_best_ls,
    gp_fit,
    gp_predict,
    mean_error_over_splits,
    rbf_kernel,
    squared_distance_xx,
    squared_distance_xy,
    time_series_split,
)
from eristropy_ray.kernels.linreg import detrend_linreg


def test_linreg_exact_line_zero():
    t = np.array([1.0, 2.0, 3.0, 4.0])
    y = 2.0 + 3.0 * t
    np.testing.assert_allclose(detrend_linreg(t, y), 0.0, atol=1e-12)


def test_linreg_matches_lstsq_oracle(rng):
    t = rng.uniform(0, 10, 50)
    y = rng.normal(size=50)
    X = np.column_stack([np.ones(50), t])
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    np.testing.assert_allclose(detrend_linreg(t, y), y - X @ beta, atol=1e-12)


def test_linreg_docstring_example():
    # reference linreg.py:17-22
    X = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
    y = np.array([2.0, 3.0, 5.0, 7.0, 8.0])
    np.testing.assert_allclose(
        detrend_linreg(X, y), [0.2, -0.4, 0.0, 0.4, -0.2], atol=1e-12
    )


def test_squared_distances_docstring_examples():
    X = np.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    np.testing.assert_array_equal(
        squared_distance_xx(X), [[0, 8, 32], [8, 0, 8], [32, 8, 0]]
    )
    Y = np.array([[2.0, 2.0], [4.0, 4.0]])
    np.testing.assert_array_equal(
        squared_distance_xy(X, Y), [[1, 13], [5, 1], [25, 5]]
    )


def test_rbf_kernel_docstring_example():
    D = np.array([[0.0, 8.0, 32.0], [8.0, 0.0, 8.0], [32.0, 8.0, 0.0]])
    K = rbf_kernel(D, 0.5)
    np.testing.assert_allclose(K[0], [1.0, 1.12535175e-07, 1.60381089e-28], rtol=1e-8)


def test_time_series_split_matches_reference_example():
    splits = time_series_split(6, n_splits=3)
    got = [(list(tr), list(te)) for tr, te in splits]
    assert got == [
        ([0, 1, 2], [3]),
        ([0, 1, 2, 3], [4]),
        ([0, 1, 2, 3, 4], [5]),
    ]


def test_cholesky_solve_vs_numpy():
    K = np.array([[1.0, 0.5, 0.0], [0.5, 1.0, 1 / 3], [0.0, 1 / 3, 1.0]])
    y = np.array([1.0, 2.0, 3.0])
    np.testing.assert_allclose(cholesky_solve(K, y), np.linalg.solve(K, y), rtol=1e-12)


def test_gp_golden_cv_error_from_reference():
    # reference tests/test_gp.py pins 0.7484052691169865 for this setup
    X = np.arange(10, dtype=np.float64).reshape(-1, 1)
    y = np.random.default_rng(17).normal(size=10)
    err = mean_error_over_splits(X, y, ls=0.5, n_splits=3)
    assert math.isclose(err, 0.7484052691169865, rel_tol=1e-9)


def test_gp_golden_best_ls_from_reference():
    X = np.arange(10, dtype=np.float64).reshape(-1, 1)
    y = np.random.default_rng(17).normal(size=10)
    assert find_best_ls(X, y, np.array([0.5, 1.0]), n_splits=3) == 0.5


def test_gp_detrend_golden_vector_from_reference():
    X = np.arange(10, dtype=np.float64).reshape(-1, 1)
    y = np.random.default_rng(17).normal(size=10)
    got = detrend_gp(X, y, np.array([0.5, 1.0]), n_splits=3)
    want = np.array(
        [
            1.06695763e-06,
            2.54575510e-07,
            -4.44978049e-07,
            -9.54630765e-07,
            -1.81473399e-06,
            3.67333456e-07,
            -7.57561006e-07,
            -7.54210002e-07,
            -1.14763661e-07,
            -3.60613987e-08,
        ]
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-12)


def test_gp_fit_predict_interpolates_smooth_trend(rng):
    t = np.arange(60, dtype=np.float64).reshape(-1, 1)
    y = 0.1 * t.ravel() + np.sin(t.ravel() / 10)
    a = gp_fit(t, y, ls=20.0)
    yhat = gp_predict(t, t, ls=20.0, a=a)
    assert np.abs(y - yhat).max() < 0.05


def test_draw_ls_candidates_reproduces_randomstate():
    want = np.random.RandomState(17).uniform(10.0, 100.0, size=10)
    np.testing.assert_array_equal(draw_ls_candidates((10.0, 100.0), 10, 17), want)


def test_cv_search_matches_independent_reimplementation():
    """detrend_gp_cv_search (de-bugged T5, reference gp.py:18-113) vs a
    from-scratch fold loop written independently here: same draws, same
    fold-local normalize_y, same alpha jitter, same tie rule."""
    from eristropy_ray.kernels.gp import (
        detrend_gp_cv_search,
        gp_fit,
        gp_predict,
        time_series_split,
    )

    rng = np.random.default_rng(11)
    n = 48
    y = 0.3 * np.arange(n) + np.sin(np.arange(n) / 4.0) + rng.normal(0, 0.2, n)
    X = np.arange(float(n)).reshape(-1, 1)
    seed, key = 42, 9

    # independent oracle
    g = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed, key])))
    cand = g.uniform(10.0, 100.0, size=10)
    scores = []
    for ls in cand:
        errs = []
        for tr, te in time_series_split(n, 5):
            mu, sd = y[tr].mean(), y[tr].std()
            sd = sd or 1.0
            a = gp_fit(X[tr], (y[tr] - mu) / sd, ls, 1e-10)
            pred = gp_predict(X[tr], X[te], ls, a) * sd + mu
            errs.append(((y[te] - pred) ** 2).mean())
        scores.append(np.mean(errs))
    ls_star = cand[int(np.argmin(scores))]
    mu, sd = y.mean(), y.std()
    sd = sd or 1.0
    a = gp_fit(X, (y - mu) / sd, ls_star, 1e-10)
    want = y - (gp_predict(X, X, ls_star, a) * sd + mu)

    got = detrend_gp_cv_search(X, y, (10.0, 100.0), seed, key)
    np.testing.assert_array_equal(got, want)
    # deterministic and key-sensitive
    np.testing.assert_array_equal(
        got, detrend_gp_cv_search(X, y, (10.0, 100.0), seed, key)
    )
    assert not np.array_equal(
        got, detrend_gp_cv_search(X, y, (10.0, 100.0), seed, key + 1)
    )


def test_cv_search_pipeline_variant(ray_session):
    """gp_implementation='cv_search' runs end-to-end, is deterministic,
    and differs from the T4 'numba' variant on the same input."""
    import ray.data as rd

    from eristropy_ray.pipelines.stationary import (
        StationaryConfig,
        make_stationary_signals,
    )

    rng = np.random.default_rng(5)
    frames = []
    for sid in range(6):
        n = 60
        frames.append(
            pd.DataFrame(
                {
                    "signal_id": sid,
                    "ts_us": np.arange(n, dtype=np.int64) * 1_000_000,
                    "value": np.cumsum(rng.normal(size=n)) + 0.2 * np.arange(n),
                }
            )
        )
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df)

    def run(impl):
        out, info = make_stationary_signals(
            ds,
            StationaryConfig(
                method="detrend", detrend_type="gp", random_seed=42,
                gp_implementation=impl, normalize_signals=False,
            ),
        )
        return (
            out.to_pandas()
            .sort_values(["signal_id", "ts_us"], kind="stable")
            .reset_index(drop=True),
            info,
        )

    a1, _ = run("cv_search")
    a2, _ = run("cv_search")
    pd.testing.assert_frame_equal(a1, a2)
    b, _ = run("numba")
    if len(a1) and len(a1) == len(b):
        assert not np.array_equal(a1["value"].to_numpy(), b["value"].to_numpy())


def test_sklearn_alias_normalizes_to_cv_search():
    """gp_implementation='sklearn' (the reference T5 variant's name) is a
    config alias for the de-bugged 'cv_search' path; bad names still
    raise with all three accepted values listed."""
    import pytest

    from eristropy_ray.pipelines.stationary import StationaryConfig

    cfg = StationaryConfig(
        method="detrend", detrend_type="gp", gp_implementation="sklearn"
    )
    assert cfg.gp_implementation == "cv_search"
    with pytest.raises(ValueError, match="sklearn"):
        StationaryConfig(
            method="detrend", detrend_type="gp", gp_implementation="scikit"
        )
