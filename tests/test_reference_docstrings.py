"""Conformance against outputs the REFERENCE ITSELF documents.

- ``StationarySignals.make_stationary_signals`` docstring
  (stationarity.py:209-234) prints the exact differenced frame for the
  seed-17 uniform fixture with method='difference', normalize=False —
  the first/last values are pinned here against our pipeline.
- ``_difference_all_signals`` docstring (difference.py:43-50) and
  ``_detrend_all_signals_linreg`` docstring (linreg.py:57-67) tiny
  golden frames.
"""

import numpy as np
import pandas as pd

from eristropy_ray.pipelines.stationary import (
    StationaryConfig,
    make_stationary_signals,
)
from eristropy_ray.stages.signals import difference_partition
from eristropy_ray.pipelines.stationary import linreg_detrend_partition


def test_reference_readme_difference_values(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(17)
    abc = rng.uniform(-5, 5, size=100)
    dfn = rng.uniform(-5, 5, size=100)
    df = pd.DataFrame(
        {
            "signal_id": ["abc"] * 100 + ["def"] * 100,
            "ts_us": np.concatenate([np.arange(100)] * 2),
            "value": np.concatenate([abc, dfn]),
        }
    )
    out, info = make_stationary_signals(
        rd.from_pandas(df),
        StationaryConfig(method="difference", normalize_signals=False),
    )
    res = out.to_pandas().sort_values(["signal_id", "ts_us"]).reset_index(drop=True)
    # both uniform-noise signals difference to stationary series
    assert info["stationary_frac_"] == 1.0
    # the reference docstring's printed frame (stationarity.py:222-234)
    got_abc = res[res.signal_id == "abc"]["value"].to_numpy()
    np.testing.assert_allclose(
        got_abc[:5],
        [-6.841017, 3.967715, -1.896646, -1.531380, 1.708821],
        atol=1e-6,
    )
    got_def = res[res.signal_id == "def"]["value"].to_numpy()
    np.testing.assert_allclose(
        got_def[-3:], [5.441443, -8.955780, 5.397502], atol=1e-6
    )


def test_difference_docstring_frame():
    df = pd.DataFrame(
        {
            "signal_id": ["abc", "abc", "def", "def"],
            "ts_us": [1, 2, 1, 2],
            "value": [2.0, 3.0, 5.0, 7.0],
        }
    )
    out = difference_partition(df).sort_values("signal_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out,
        pd.DataFrame(
            {"signal_id": ["abc", "def"], "ts_us": [2, 2], "value": [1.0, 2.0]}
        ),
    )


def test_linreg_docstring_frame():
    df = pd.DataFrame(
        {
            "signal_id": ["abc", "abc", "def", "def"],
            "ts_us": [1, 2, 1, 2],
            "value": [2.0, 3.0, 5.0, 7.0],
        }
    )
    out = linreg_detrend_partition(df)
    np.testing.assert_allclose(out["value"].to_numpy(), 0.0, atol=1e-12)
