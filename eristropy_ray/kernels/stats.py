"""Scalar statistics with the reference's exact ddof conventions.

- ``standard_error`` is the **population** standard deviation (ddof=0, no
  /sqrt(n)) despite its name — matching ``/root/reference/eristropy/utils.py:25-35``.
- z-score normalization elsewhere uses **sample** std (ddof=1), matching the
  pandas ``Series.std()`` default used at ``stationarity.py:167-170``.
"""

from __future__ import annotations

import numpy as np


def mean(x: np.ndarray) -> float:
    """Arithmetic mean (reference ``_mean``, utils.py:8-17)."""
    return float(np.asarray(x, dtype=np.float64).mean())


def standard_error(x: np.ndarray) -> float:
    """Population SD, ddof=0 (reference ``_standard_error``, utils.py:25-35)."""
    return float(np.asarray(x, dtype=np.float64).std(ddof=0))


def mean_squared_error(y: np.ndarray, yhat: np.ndarray) -> float:
    """MSE (reference ``_mean_squared_error``, utils.py:43-68)."""
    y = np.asarray(y, dtype=np.float64)
    yhat = np.asarray(yhat, dtype=np.float64)
    d = y - yhat
    return float((d * d).mean())


def zscore(x: np.ndarray) -> np.ndarray:
    """Per-signal z-score with sample std (ddof=1).

    Matches ``StationarySignals._normalize`` applied through pandas
    ``groupby().transform`` (``stationarity.py:167-170, 278-281``): pandas
    ``Series.std()`` defaults to ddof=1.
    """
    x = np.asarray(x, dtype=np.float64)
    sd = x.std(ddof=1) if x.size > 1 else 0.0
    if sd == 0.0:
        return np.full_like(x, np.nan)
    return (x - x.mean()) / sd
