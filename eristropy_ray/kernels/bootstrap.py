"""Politis–Romano stationary bootstrap with counter-based seeding.

Semantics follow ``/root/reference/eristropy/bootstrap.py:9-64``: resampled
series are built from blocks whose start is uniform on [0, n), whose length
is Geometric(p) via the inverse-CDF ``ceil(log(1-u)/log(1-p))``
(``utils.py:20-22``), with wrap-around at the series end and truncation to
total length n; ``n_boot`` replicates stacked as an (n_boot, n) matrix.

Determinism design point (SURVEY.md §4.1): the reference seeds numba's
process-global RNG once (``utils.py:38-40``), which is meaningless across
distributed workers. Here every call derives an explicit
``np.random.SeedSequence`` from ``(seed, *key)`` so any (window, replicate)
is reproducible regardless of Ray task placement or execution order.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

import numpy as np


def _geom_block_length(u: float, p: float) -> int:
    """Inverse-CDF uniform -> Geometric(p) (reference ``_unif_to_geom``).

    Floored at 1: u == 0.0 (probability 2^-53 per draw — real at scale)
    would yield a zero-length block and an infinite resampling loop."""
    return max(math.ceil(math.log(1.0 - u) / math.log(1.0 - p)), 1)


def stationary_bootstrap_indices(
    n: int, p: float, rng: np.random.Generator
) -> np.ndarray:
    """Index vector of one stationary-bootstrap replicate (length n)."""
    out = np.empty(n, dtype=np.int64)
    s = 0
    while s < n:
        start = int(rng.integers(0, n))
        b = _geom_block_length(float(rng.random()), p)
        b = min(b, n - s)
        end = start + b
        if end <= n:
            out[s : s + b] = np.arange(start, end)
        else:
            head = n - start
            out[s : s + head] = np.arange(start, n)
            out[s + head : s + b] = np.arange(0, end - n)
        s += b
    return out


def stationary_bootstrap(
    x: np.ndarray,
    p: float,
    n_boot: int = 100,
    seed: int = 0,
    key: Sequence[int] = (),
) -> np.ndarray:
    """(n_boot, n) matrix of stationary-bootstrap replicates of ``x``.

    ``key`` is a tuple of non-negative ints naming the logical unit of work
    (e.g. a stable hash of the (conv_id, bucket) window) so replicate i of
    window w is the same no matter which worker draws it.
    """
    x = np.ascontiguousarray(x, dtype=np.float64)
    n = x.size
    out = np.empty((n_boot, n), dtype=np.float64)
    for i in range(n_boot):
        rng = np.random.Generator(
            np.random.PCG64(np.random.SeedSequence([seed, *key, i]))
        )
        out[i, :] = x[stationary_bootstrap_indices(n, p, rng)]
    return out


def stable_key(*parts: object) -> tuple[int, ...]:
    """Deterministic non-negative int tuple from arbitrary hashables.

    Python's builtin ``hash`` for str is salted per-process — useless for
    cross-worker determinism — so strings go through a small FNV-1a."""
    out = []
    for part in parts:
        if isinstance(part, (int, np.integer)):
            out.append(int(part) & 0xFFFFFFFF)
        else:
            h = 0xCBF29CE484222325
            for byte in str(part).encode("utf-8"):
                h = ((h ^ byte) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out.append(h & 0xFFFFFFFF)
    return tuple(out)
