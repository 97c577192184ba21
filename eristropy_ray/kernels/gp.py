"""RBF-kernel Gaussian-process detrending with forward-chaining CV.

Reimplements the semantics of the reference's numba GP stack
(``/root/reference/eristropy/gp.py:116-470``) in numpy/numpy.linalg:

- squared-Euclidean distance matrices (utils.py:71-141) via broadcasting,
- RBF kernel ``exp(-D / (2·ls²))`` (gp.py:116-143),
- expanding-window time-series CV splits with
  ``test_size = n // (n_splits+1)`` (gp.py:146-183),
- in-place diagonal jitter (gp.py:212-239),
- Cholesky solve (gp.py:186-209; scipy ``cho_factor/cho_solve`` replaced by
  ``np.linalg.cholesky`` + triangular solves),
- mean CV MSE per candidate length scale, argmin selection, refit on the
  full series, posterior-mean subtraction (gp.py:316-470).

Faithful reference quirks preserved at the stage layer (not here): the
grouped driver regresses on ``X = arange(len(group))`` — NOT the timestamp
column — and emits that arange as the output timestamp (gp.py:531, 539);
candidate length scales are drawn once for ALL signals from
``RandomState.uniform(ls_range)`` (gp.py:526).

The reference's sklearn variant is not reproduced: it carries a known bug
(output id column filled with the column *name*, gp.py:104) and sklearn is
unavailable; the numba-variant semantics are the canonical ones.
"""

from __future__ import annotations

import numpy as np


def squared_distance_xx(x: np.ndarray) -> np.ndarray:
    """Pairwise squared Euclidean distances of rows of (n, d) ``x``."""
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    d = x[:, None, :] - x[None, :, :]
    return np.einsum("ijk,ijk->ij", d, d)


def squared_distance_xy(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    x = np.atleast_2d(np.asarray(x, dtype=np.float64))
    y = np.atleast_2d(np.asarray(y, dtype=np.float64))
    d = x[:, None, :] - y[None, :, :]
    return np.einsum("ijk,ijk->ij", d, d)


def rbf_kernel(D: np.ndarray, ls: float) -> np.ndarray:
    """``exp(-D / (2 ls^2))`` elementwise on a squared-distance matrix."""
    return np.exp(-0.5 * D / (ls * ls))


def time_series_split(n: int, n_splits: int = 5) -> list[tuple[np.ndarray, np.ndarray]]:
    """Expanding-window CV splits; ``test_size = n // (n_splits + 1)``."""
    indices = np.arange(n)
    test_size = n // (n_splits + 1)
    splits = []
    for test_start in range(n - n_splits * test_size, n, test_size):
        splits.append(
            (indices[:test_start], indices[test_start : test_start + test_size])
        )
    return splits


def cholesky_solve(K: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Solve K a = y for symmetric positive-definite K."""
    L = np.linalg.cholesky(K)
    z = np.linalg.solve(L, y)
    return np.linalg.solve(L.T, z)


def gp_fit(X: np.ndarray, y: np.ndarray, ls: float, eps: float = 1e-6) -> np.ndarray:
    """Coefficients a solving (K + eps·I) a = y for the RBF kernel on X."""
    K = rbf_kernel(squared_distance_xx(X), ls)
    K[np.diag_indices_from(K)] += eps
    return cholesky_solve(K, np.asarray(y, dtype=np.float64))


def gp_predict(X: np.ndarray, Xstar: np.ndarray, ls: float, a: np.ndarray) -> np.ndarray:
    """Posterior mean K(X, X*)ᵀ a."""
    K = rbf_kernel(squared_distance_xy(X, Xstar), ls)
    return K.T @ a


def mean_error_over_splits(
    X: np.ndarray, y: np.ndarray, ls: float, n_splits: int = 5, eps: float = 1e-6
) -> float:
    """Mean held-out MSE of the GP across forward-chaining CV splits."""
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    if X.shape[0] == 1 and X.shape[1] > 1:
        X = X.T
    y = np.asarray(y, dtype=np.float64)
    n = X.shape[0]
    errors = []
    for train_idx, test_idx in time_series_split(n, n_splits):
        a = gp_fit(X[train_idx], y[train_idx], ls, eps)
        yhat = gp_predict(X[train_idx], X[test_idx], ls, a)
        resid = y[test_idx] - yhat
        errors.append(float((resid * resid).mean()))
    return float(np.mean(errors))


def find_best_ls(
    X: np.ndarray, y: np.ndarray, ls_vals: np.ndarray, n_splits: int = 5, eps: float = 1e-6
) -> float:
    """Candidate length scale with minimal CV error (first argmin on ties)."""
    errors = [mean_error_over_splits(X, y, ls, n_splits, eps) for ls in ls_vals]
    return float(ls_vals[int(np.argmin(errors))])


def detrend_gp(
    X: np.ndarray, y: np.ndarray, ls_vals: np.ndarray, n_splits: int = 5, eps: float = 1e-6
) -> np.ndarray:
    """Residual after subtracting the best-ls GP posterior mean."""
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    if X.shape[0] == 1 and X.shape[1] > 1:
        X = X.T
    y = np.asarray(y, dtype=np.float64)
    ls_star = find_best_ls(X, y, ls_vals, n_splits, eps)
    a = gp_fit(X, y, ls_star, eps)
    return y - gp_predict(X, X, ls_star, a)


def draw_ls_candidates(
    ls_range: tuple[float, float], n_searches: int, seed: int | None
) -> np.ndarray:
    """Uniform candidate draw, once for all signals (gp.py:526 semantics).

    Uses legacy ``np.random.RandomState`` deliberately: it reproduces the
    exact candidate values the reference draws for a given seed.
    """
    rng = np.random.RandomState(seed)
    return rng.uniform(ls_range[0], ls_range[1], size=n_searches)


def stable_signal_key(signal_id) -> int:
    """Deterministic non-negative int key for any signal id (ints pass
    through; strings get a polynomial hash — Python's str hash is salted
    and must never leak into seeding)."""
    if isinstance(signal_id, (int, np.integer)):
        return int(signal_id) & 0x7FFFFFFF
    h = 0
    for b in str(signal_id).encode("utf-8"):
        h = (h * 1_000_003 + b) & 0x7FFFFFFF
    return h


def detrend_gp_cv_search(
    X: np.ndarray,
    y: np.ndarray,
    ls_range: tuple[float, float],
    seed: int | None,
    signal_key: int,
    n_iter: int = 10,
    n_splits: int = 5,
    alpha: float = 1e-10,
) -> np.ndarray:
    """T5 semantics, de-bugged (reference ``gp.py:18-113``): per-signal
    uniform length-scale draw (RandomizedSearchCV style), TimeSeriesSplit
    forward-chaining CV, GP with per-fold target normalization
    (``normalize_y=True``) and ``alpha`` diagonal jitter, neg-MSE
    selection (ties -> first drawn candidate), refit on the full series,
    residual ``y - yhat``.

    Documented divergences from the reference variant:
    - the reference feeds ONE sequential RandomState through a driver-side
      loop over signals; a distributed stage cannot share that cursor, so
      candidates are seeded per signal from ``(seed, signal_key)`` —
      deterministic and partition-order independent;
    - the reference's output id bug (column name instead of the id,
      gp.py:104) is not reproduced;
    - sklearn's numerics (fold-local y normalization, 1e-10 jitter) are
      reimplemented in numpy, not imported.
    """
    X = np.atleast_2d(np.asarray(X, dtype=np.float64))
    if X.shape[0] == 1 and X.shape[1] > 1:
        X = X.T
    y = np.asarray(y, dtype=np.float64)
    rng = np.random.Generator(
        np.random.PCG64(np.random.SeedSequence([int(seed or 0), int(signal_key)]))
    )
    ls_vals = rng.uniform(ls_range[0], ls_range[1], size=n_iter)

    def fold_mse(ls: float) -> float:
        errs = []
        for tr, te in time_series_split(X.shape[0], n_splits):
            mu = float(y[tr].mean())
            sd = float(y[tr].std())
            sd = sd if sd > 0.0 else 1.0
            a = gp_fit(X[tr], (y[tr] - mu) / sd, ls, alpha)
            yhat = gp_predict(X[tr], X[te], ls, a) * sd + mu
            resid = y[te] - yhat
            errs.append(float((resid * resid).mean()))
        return float(np.mean(errs))

    errors = [fold_mse(ls) for ls in ls_vals]
    ls_star = float(ls_vals[int(np.argmin(errors))])
    mu = float(y.mean())
    sd = float(y.std())
    sd = sd if sd > 0.0 else 1.0
    a = gp_fit(X, (y - mu) / sd, ls_star, alpha)
    return y - (gp_predict(X, X, ls_star, a) * sd + mu)
