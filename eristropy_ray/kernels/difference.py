"""First differencing (reference ``/root/reference/eristropy/difference.py:5-26``).

``difference`` keeps the reference's contracts: length >= 2 required,
NaN/inf rejected, output length n-1. The grouped variant semantics (keep
``timestamp[1:]`` per group — ``difference.py:29-81``) live in the Arrow
stage layer (``eristropy_ray/stages``), not here.
"""

from __future__ import annotations

import numpy as np


def difference(x: np.ndarray) -> np.ndarray:
    """x_t - x_{t-1}; raises on <2 points or non-finite input."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < 2:
        raise ValueError("Input must have at least two elements.")
    if not np.isfinite(x).all():
        raise ValueError("Input contains NaN or np.inf values.")
    return np.diff(x)
