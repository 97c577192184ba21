"""Linear-interpolation gap-fill over missing retention-tier buckets.

Net-new vs the reference (SURVEY.md §2.8): given the sparse per-(conv, tier)
rollup points, produce a dense bucket grid from the first to the last
observed bucket at the tier's step, linearly interpolating the numeric
rollup columns across the gaps (oracle: ``np.interp``). Filled rows carry
``n_turns = 0`` and ``gap_filled = True``.

NaN observed values (legitimately produced by too-short windows) are
treated as missing for interpolation purposes; they are preserved at their
own bucket and never used as interpolation anchors.
"""

from __future__ import annotations

import numpy as np


def gapfill_series(
    buckets: np.ndarray,
    values: np.ndarray,
    step: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Dense (grid, filled_values, was_observed) for one rollup column.

    Args:
        buckets: sorted, unique observed bucket starts (int64, e.g. µs).
        values: float64 rollup values aligned with ``buckets``.
        step: tier bucket width in the same unit as ``buckets``.

    Returns:
        grid: int64 dense bucket starts, ``arange(min, max+step, step)``.
        filled: float64 values with gaps linearly interpolated STRICTLY
            inside the finite-anchor range; grid points outside it (incl.
            everything when fewer than two finite anchors exist) stay
            NaN — edges never extrapolate or constant-hold.
        was_observed: bool mask, True where the bucket was in the input.
    """
    b = np.ascontiguousarray(buckets, dtype=np.int64)
    v = np.ascontiguousarray(values, dtype=np.float64)
    if b.size == 0:
        return b, v, np.zeros(0, dtype=bool)
    grid = np.arange(b[0], b[-1] + step, step, dtype=np.int64)
    observed = np.isin(grid, b)
    filled = fill_missing(grid, observed, b, v)
    return grid, filled, observed


def fill_missing(
    grid: np.ndarray, observed: np.ndarray, b: np.ndarray, v: np.ndarray
) -> np.ndarray:
    """Filled values for a dense grid: linear interpolation strictly
    inside the finite-anchor range, NaN outside it (no extrapolation,
    no constant-hold). ONE implementation shared by ``gapfill_series``
    and the block encoder (stages/encode.py) so the two can never
    diverge bit-wise."""
    filled = np.full(grid.size, np.nan)
    filled[observed] = v
    finite = np.isfinite(v)
    if int(finite.sum()) >= 2:
        bf = b[finite]
        inside = ~observed & (grid >= bf[0]) & (grid <= bf[-1])
        filled[inside] = np.interp(
            grid[inside].astype(np.float64),
            bf.astype(np.float64),
            v[finite],
        )
    return filled
