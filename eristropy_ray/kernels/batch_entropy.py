"""Batched entropy kernels: SampEn/PermEn over MANY padded windows at once.

The rollup engine's dominant cost is per-window kernel dispatch — a 1m
tier emits millions of ~10-point windows, and a Python call + a handful of
small numpy ops per window costs more than the arithmetic. These kernels
take a (W, L) matrix of W windows padded with +inf and compute all W
entropies in one vectorized pass (chunked to bound memory).

Exactness: counts are integers and identical to the scalar kernels'
(``tests/test_batch_entropy.py`` verifies element-wise equality against
``sampen``/``permen`` on randomized ragged windows):

- +inf padding can never match (|inf - finite| = inf, inf - inf = nan,
  both compare False under ``<``);
- template-start validity masks restrict counts to each window's true
  length exactly as the scalar derivation (kernels/sampen.py docstring);
- PermEn pattern sums run in ascending-code order over <=order! terms —
  sequential in both paths, so the float accumulation matches too.
"""

from __future__ import annotations

import math

import numpy as np

from eristropy_ray.kernels.permen import _codes3

# element budget for one (chunk, L, L) slab — sized so the float64
# intermediate (~4 MB) stays cache-resident; larger slabs saturate DRAM
# bandwidth under many concurrent Ray tasks (measured 2.4x slower at 64 MB)
_CHUNK_ELEMS = 500_000


def sampen_padded(
    P: np.ndarray, lengths: np.ndarray, m: int, r: np.ndarray
) -> np.ndarray:
    """SampEn per padded window row.

    Args:
        P: (W, L) float64, row w holds window w's first lengths[w] values,
           remainder +inf.
        lengths: (W,) true window lengths.
        m: embedding dimension.
        r: (W,) strictly positive similarity radius per window.
    """
    W, L = P.shape
    out = np.full(W, np.nan)
    if W == 0 or L <= m + 1:
        return out
    nb = np.maximum(lengths - m, 0)
    chunk = max(1, _CHUNK_ELEMS // (L * L))
    iidx = np.arange(L - m + 1)
    for s in range(0, W, chunk):
        e = min(s + chunk, W)
        Pc = P[s:e]
        rc = r[s:e, None, None]
        with np.errstate(invalid="ignore"):  # inf - inf in the pad region
            D = np.abs(Pc[:, :, None] - Pc[:, None, :]) < rc
        M = D
        for k in range(1, m):
            M = M[:, :-1, :-1] & D[:, k:, k:]
        nbc = nb[s:e]
        valid = iidx[None, :] < nbc[:, None]  # (w, L-m+1)
        pair = M & valid[:, :, None] & valid[:, None, :]
        b = (pair.sum(axis=(1, 2)) - nbc) // 2
        M = M[:, :-1, :-1] & D[:, m:, m:]
        validA = valid[:, : L - m]
        pair = M & validA[:, :, None] & validA[:, None, :]
        a = (pair.sum(axis=(1, 2)) - nbc) // 2
        # math.log per eligible window: numpy's vectorized log differs
        # from libm by 1 ulp on some inputs — the scalar kernel (and the
        # reference) use math.log, and bit-equality is the contract
        vals = np.full(e - s, np.nan)
        ratio = a / np.maximum(b, 1)
        for i in np.flatnonzero(a > 0):
            vals[i] = -math.log(ratio[i])
        out[s:e] = vals
    return out


def permen_padded(
    P: np.ndarray, lengths: np.ndarray, order: int = 3, normalize: bool = True
) -> np.ndarray:
    """Permutation entropy per padded window row (delay 1)."""
    W, L = P.shape
    out = np.full(W, np.nan)
    n_pos = L - (order - 1)
    if W == 0 or n_pos <= 0:
        return out
    nwin = lengths - (order - 1)
    K = order**order
    base = order ** np.arange(order, dtype=np.int64)
    log_norm = math.log(math.factorial(order))
    chunk = max(1, _CHUNK_ELEMS // (L * order))
    pos = np.arange(n_pos)
    for s in range(0, W, chunk):
        e = min(s + chunk, W)
        Pc = P[s:e]
        if order == 3 and not np.isnan(Pc).any():
            # comparison-based order-3 codes (kernels/permen._codes3):
            # identical integers to the stable-argsort path, no argsort.
            # +inf pads compare like any largest value; NaN data falls
            # back (argsort sorts NaN last, comparisons would not).
            code = _codes3(Pc[:, :-2], Pc[:, 1:-1], Pc[:, 2:])
        else:
            sw = np.lib.stride_tricks.sliding_window_view(Pc, order, axis=1)
            perm = np.argsort(sw, axis=2, kind="stable")
            code = perm @ base  # (w, n_pos)
        valid = pos[None, :] < nwin[s:e, None]
        w_idx = np.repeat(np.arange(e - s), valid.sum(axis=1))
        counts = np.bincount(
            w_idx * K + code[valid], minlength=(e - s) * K
        ).reshape(e - s, K)
        n_v = np.maximum(nwin[s:e], 1)[:, None].astype(np.float64)
        p = counts / n_v
        with np.errstate(divide="ignore", invalid="ignore"):
            terms = np.where(counts > 0, p * np.log(p), 0.0)
        h = -terms.sum(axis=1)
        if normalize:
            h = h / log_norm
        h[nwin[s:e] <= 0] = np.nan
        out[s:e] = h
    return out


def gather_padded(
    v: np.ndarray, starts: np.ndarray, lengths: np.ndarray, L: int
) -> np.ndarray:
    """(W, L) +inf-padded gather of windows v[starts[w] : starts[w]+lengths[w]]."""
    W = starts.size
    P = np.full((W, L), np.inf)
    if W == 0:
        return P
    offs = np.arange(L)
    idx = starts[:, None] + offs[None, :]
    mask = offs[None, :] < lengths[:, None]
    np.clip(idx, 0, v.size - 1, out=idx)
    P[mask] = v[idx[mask]]
    return P


def masked_radius(P: np.ndarray, lengths: np.ndarray, r_frac: float) -> np.ndarray:
    """Per-window radius r = r_frac * population std (1.0 for constant
    windows), computed from the padded matrix via masked moment sums.

    NOT bit-compatible with the engine's radius: this accumulates the
    centered second moment with pairwise row sums, while the engine uses
    ``window_radii_from_moments`` over reduceat segment sums — for long
    windows the float accumulation order differs in the last ulp. Test
    helper only; never substitute it into the rollup path."""
    mask = np.arange(P.shape[1])[None, :] < lengths[:, None]
    vals = np.where(mask, P, 0.0)
    n = np.maximum(lengths, 1).astype(np.float64)
    mean = vals.sum(axis=1) / n
    # centered two-pass variance (single-pass E[x^2]-mean^2 collapses for
    # large-mean windows and would hand SampEn a garbage radius)
    centered = np.where(mask, P - mean[:, None], 0.0)
    var = (centered * centered).sum(axis=1) / n
    std = np.sqrt(var)
    return np.where(std > 0.0, r_frac * std, 1.0)
