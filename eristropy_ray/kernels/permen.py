"""Permutation entropy (Bandt & Pompe 2002) — vectorized numpy.

The reference advertises a PermEn capability but never implements it
(``/root/reference/README.md:14``, ``sample_entropy.py:342`` points users at
"our PermEn class"; the math citation is Bandt & Pompe 2002 in
``docs/math_explanations/stationarity.md:86-87``). Implemented here from the
public paper:

    embed x into overlapping windows of ``order`` points at spacing
    ``delay``; map each window to its ordinal pattern (the permutation that
    sorts it, ties broken by earlier index — numpy stable argsort); then

        H = -sum_pi p(pi) * ln p(pi)

    over observed pattern frequencies, optionally normalized by
    ``ln(order!)`` so H in [0, 1].
"""

from __future__ import annotations

import math

import numpy as np


_POW3 = np.array([1, 3, 9], dtype=np.int64)


def _codes3(x0: np.ndarray, x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    """Order-3 pattern codes from pairwise comparisons — the exact integer
    the generic stable-argsort path produces, without the argsort.

    rank_i = #{j : x_j < x_i, or x_j == x_i with j < i} is element i's
    stable sorted position, so perm[rank_i] = i and the mixed-radix code
    sum(perm[j]*3^j) telescopes to 1*3^rank_1 + 2*3^rank_2. Ties resolve
    through the <= / < asymmetry exactly as stable argsort does (verified
    on tied, inf-bearing and constant inputs in tests/test_permen.py).
    NaN inputs must NOT take this path: comparisons put a NaN at rank 0
    while argsort sorts it last.
    """
    r1 = np.add(x0 <= x1, x2 < x1, dtype=np.int64)
    r2 = np.add(x0 <= x2, x1 <= x2, dtype=np.int64)
    return _POW3[r1] + 2 * _POW3[r2]


def ordinal_patterns(x: np.ndarray, order: int = 3, delay: int = 1) -> np.ndarray:
    """Integer code of the ordinal pattern of each embedded window.

    Codes are the mixed-radix encoding of the stable argsort permutation —
    distinct permutations get distinct codes in ``[0, order!)``-dense space
    (injective; exact values are an internal detail).
    """
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    n_win = n - (order - 1) * delay
    if n_win <= 0:
        return np.empty(0, dtype=np.int64)
    if order == 3 and not np.isnan(x).any():
        d = delay
        return _codes3(x[:n_win], x[d : d + n_win], x[2 * d : 2 * d + n_win])
    idx = np.arange(n_win)[:, None] + np.arange(order)[None, :] * delay
    windows = x[idx]
    perm = np.argsort(windows, axis=1, kind="stable")
    base = order ** np.arange(order, dtype=np.int64)
    return perm @ base


def permen(
    x: np.ndarray,
    order: int = 3,
    delay: int = 1,
    normalize: bool = True,
) -> float:
    """Permutation entropy of ``x``; NaN when no full window fits."""
    codes = ordinal_patterns(x, order=order, delay=delay)
    n_win = codes.size
    if n_win == 0:
        return math.nan
    # dense-K accumulation (zeros contribute exactly 0.0) so the scalar
    # and batched (kernels/batch_entropy.py) paths share one summation
    # grouping — numpy's pairwise sum is sensitive to element count
    counts = np.bincount(codes, minlength=order**order)
    p = counts / n_win
    with np.errstate(divide="ignore", invalid="ignore"):
        terms = np.where(counts > 0, p * np.log(p), 0.0)
    h = float(-terms.sum())
    if normalize:
        h /= math.log(math.factorial(order))
    return h
