"""Golden-stability pins: the full rollup output of the deterministic
fixture conversations is pinned by content digest. Any refactor that
changes a single bit of any rolled-up point fails here — the engine's
"rolled-up points match bit-for-bit" contract across rounds.

If a change is INTENTIONAL (e.g. a new column), update the pins and say
so in the commit message.
"""

import hashlib

import numpy as np
import pandas as pd

from eristropy_ray.config import RollupConfig
from eristropy_ray.sources.transcripts import fixture_transcripts
from eristropy_ray.stages.windows import rollup_windows


def _digest(df: pd.DataFrame) -> str:
    df = df.sort_values(["tier", "conv_id", "bucket_ts"], kind="stable")
    h = hashlib.sha256()
    for col in sorted(df.columns):
        vals = df[col].to_numpy()
        if vals.dtype.kind == "f":
            h.update(vals.astype(np.float64).tobytes())
        elif vals.dtype.kind in "iu":
            h.update(vals.astype(np.int64).tobytes())
        else:
            h.update("\x1f".join(map(str, vals)).encode())
    return h.hexdigest()


def _fixture_rollup() -> pd.DataFrame:
    t = fixture_transcripts()
    import pyarrow as pa

    return pd.DataFrame(
        rollup_windows(
            t["conv_id"].to_numpy(zero_copy_only=False),
            t["turn_idx"].to_numpy(zero_copy_only=False),
            t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
            t["text"].to_pandas().str.len().to_numpy(dtype=np.float64),
            RollupConfig(),
        )
    )


# regenerate with: python -c "from tests.test_golden_stability import *; \
#   print(_digest(_fixture_rollup()))"
PINNED_DIGEST = "2fe25893d151e53b286caac4a798c7dd707d38d3af3d2611c761bd27ffd6721e"

PINNED_SPOT_VALUES = {
    # (conv_id, tier, bucket_us, column): exact float64 bits (little-endian hex)
    ("ramp", "1h", 1699999200000000, "sampen"): "c193cfcafb13d03f",
    ("ramp", "1h", 1699999200000000, "permen"): "17aed26fe447d73f",
    ("ramp", "1h", 1699999200000000, "sampen_raw"): "0000000000000080",  # -0.0
    ("ramp", "1h", 1699999200000000, "value_mean"): "0000000000507f40",  # 501.0
    ("sine", "1d", 1699920000000000, "sampen"): "ee29b8828cc4c93f",
    ("sine", "1d", 1699920000000000, "permen"): "aaac7032ac32e73f",
    ("sine", "1d", 1699920000000000, "sampen_raw"): "5a1a3c6ceb0fc73f",
    ("sine", "1d", 1699920000000000, "value_mean"): "0000000000407f40",  # 500.0
}


def test_fixture_rollup_digest():
    assert _digest(_fixture_rollup()) == PINNED_DIGEST


def test_fixture_rollup_spot_values():
    df = _fixture_rollup()
    for (conv, tier, bucket, col), want_hex in PINNED_SPOT_VALUES.items():
        row = df[
            (df.conv_id == conv) & (df.tier == tier) & (df.bucket_ts == bucket)
        ]
        assert len(row) == 1
        got = float(row[col].iloc[0])
        assert np.float64(got).tobytes().hex() == want_hex, (conv, tier, col, got)
