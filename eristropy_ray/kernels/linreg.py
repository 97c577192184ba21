"""Linear-regression detrending (OLS residuals) — numpy lstsq.

Matches ``/root/reference/eristropy/linreg.py:6-35`` (sklearn
``LinearRegression`` fit + residual); the reference's own oracle is
``np.linalg.lstsq`` (``tests/test_linreg.py:12-20``), which is what we use
directly. Regresses on the **actual timestamp column**, unlike the GP path
which regresses on ``arange(n)`` (see gp.py).
"""

from __future__ import annotations

import numpy as np


def detrend_linreg(t: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Residual of OLS ``y ~ 1 + t`` (same length as input)."""
    t = np.asarray(t, dtype=np.float64).ravel()
    y = np.asarray(y, dtype=np.float64).ravel()
    X = np.column_stack([np.ones(t.size), t])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    return y - X @ beta
