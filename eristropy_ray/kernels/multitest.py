"""Holm–Šidák step-down multiple-testing correction.

The reference calls ``statsmodels.stats.multitest.multipletests(pvalues,
alpha)`` with the library default ``method='hs'`` (Holm–Šidák) at
``/root/reference/eristropy/stationarity.py:186``. Implemented from the
published procedure: sort p-values ascending; the i-th smallest (1-based)
is compared against ``1 - (1-alpha)^(1/(m-i+1))``; rejection is step-down
(stop at the first failure). Equivalently, corrected p-values are

    p_adj_(i) = max_{k<=i} [ 1 - (1 - p_(k))^(m-k+1) ]

and a hypothesis is rejected iff p_adj <= alpha.
"""

from __future__ import annotations

import numpy as np


def holm_sidak(pvalues: np.ndarray, alpha: float = 0.05) -> tuple[np.ndarray, np.ndarray]:
    """(reject_mask, corrected_pvalues) in the input order."""
    p = np.asarray(pvalues, dtype=np.float64)
    m = p.size
    if m == 0:
        return np.zeros(0, dtype=bool), np.zeros(0)
    order = np.argsort(p, kind="stable")
    sorted_p = p[order]
    counts = m - np.arange(m)  # m, m-1, ..., 1
    adj = 1.0 - np.power(1.0 - sorted_p, counts)
    adj = np.maximum.accumulate(adj)
    adj = np.clip(adj, 0.0, 1.0)
    reject_sorted = adj <= alpha
    # step-down: once one fails, all later (larger p) fail too — the running
    # max already enforces this monotonicity.
    reject = np.zeros(m, dtype=bool)
    corrected = np.empty(m, dtype=np.float64)
    reject[order] = reject_sorted
    corrected[order] = adj
    return reject, corrected
