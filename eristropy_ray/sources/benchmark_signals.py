"""The reference's benchmark signal generator (S2), reproduced exactly.

``make_benchmark_frame(t, n)`` emits the same values as
``/root/reference/benchmark/gp_benchmark.py:10-47``: n signals × t steps,
``value = b·t + N(0, 0.1)`` with ``b ~ U(3/t, 5/t)``, a single
``default_rng(17)`` drawing b first then the noise matrix — byte-for-byte
the reference's frame (column names mapped to this engine's signal-table
convention: signal_id, ts_us, value).

Used by the GP-detrend micro-benchmark (the only benchmark the reference
publishes) and available as a deterministic signal source for tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def make_benchmark_frame(t: int, n: int, seed: int = 17) -> pd.DataFrame:
    signal_ids = np.repeat(np.arange(n), t)
    T = np.tile(np.arange(t).reshape(-1, 1), (1, n))
    rng = np.random.default_rng(seed)
    bs = rng.uniform(low=3 / t, high=5 / t, size=(n,))
    noise = rng.normal(loc=0.0, scale=0.1, size=(t, n))
    values = (bs * T) + noise
    return pd.DataFrame(
        {
            "signal_id": signal_ids,
            "ts_us": np.transpose(T).flatten(),
            "value": values.T.flatten(),
        }
    )
