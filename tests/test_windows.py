"""Windowed rollup core vs an independent pandas oracle."""

import numpy as np
import pandas as pd

from eristropy_ray.config import TIER_STEPS_US, RollupConfig
from eristropy_ray.kernels.batch_entropy import (
    gather_padded,
    permen_padded,
    sampen_padded,
)
from eristropy_ray.kernels.permen import permen
from eristropy_ray.kernels.sampen import sampen
from eristropy_ray.stages.windows import (
    _BATCH_CLASSES,
    diff_window_radius,
    raw_window_radius,
    rollup_windows,
)


def _entropies_oracle(x, cfg, r):
    """Per-window entropy oracle replicating the engine's deterministic
    path selection: padded-batch kernels (single-window batch) for small
    windows, scalar kernels with stride cap beyond the last class. The
    radius is derived from the full window via the shared helpers."""
    n = x.size
    if n <= _BATCH_CLASSES[-1]:
        L = next(c for c in _BATCH_CLASSES if n <= c)
        P = gather_padded(x, np.array([0]), np.array([n]), n)
        return (
            sampen_padded(P, np.array([n]), cfg.m, np.array([r]))[0],
            permen_padded(P, np.array([n]), cfg.permen_order)[0],
        )
    if n > cfg.max_window_points:
        x = x[:: -(-n // cfg.max_window_points)]
    return sampen(x, cfg.m, r), permen(x, order=cfg.permen_order)


def _make_turns(rng, n_convs=5, n_turns=200):
    rows = []
    for c in range(n_convs):
        ts0 = 1_700_000_000_000_000 + c * 3_600_000_000
        for t in range(n_turns):
            rows.append(
                {
                    "conv_id": f"c{c}",
                    "turn_idx": t,
                    "ts": ts0 + t * 7_000_000 + int(rng.integers(0, 1000)),
                    "value": float(rng.integers(1, 500)),
                }
            )
    rng.shuffle(rows)  # input order must not matter
    return pd.DataFrame(rows)


def _oracle(df, cfg):
    out = []
    for tier in cfg.tiers:
        step = TIER_STEPS_US[tier]
        d = df.copy()
        d["bucket"] = d["ts"] // step * step
        for (conv, bucket), g in d.groupby(["conv_id", "bucket"]):
            g = g.sort_values(["ts", "turn_idx"], kind="stable")
            x = g["value"].to_numpy()
            row = {
                "conv_id": conv,
                "tier": tier,
                "bucket_ts": bucket,
                "n_turns": len(g),
                "value_mean": x.mean(),
                "value_min": x.min(),
                "value_max": x.max(),
            }
            if len(x) >= cfg.min_window:
                row["sampen_raw"], row["permen_raw"] = _entropies_oracle(
                    x, cfg, raw_window_radius(x, cfg.r_frac)
                )
                row["sampen"], row["permen"] = _entropies_oracle(
                    np.diff(x), cfg, diff_window_radius(x, cfg.r_frac)
                )
            else:
                row["sampen_raw"] = row["permen_raw"] = np.nan
                row["sampen"] = row["permen"] = np.nan
            out.append(row)
    return (
        pd.DataFrame(out)
        .sort_values(["tier", "conv_id", "bucket_ts"])
        .reset_index(drop=True)
    )


def test_rollup_windows_matches_oracle(rng):
    df = _make_turns(rng)
    cfg = RollupConfig()
    got = pd.DataFrame(
        rollup_windows(
            df["conv_id"].to_numpy(dtype=object),
            df["turn_idx"].to_numpy(),
            df["ts"].to_numpy(),
            df["value"].to_numpy(),
            cfg,
        )
    ).sort_values(["tier", "conv_id", "bucket_ts"]).reset_index(drop=True)
    want = _oracle(df, cfg)
    assert len(got) == len(want)
    for col in ("n_turns", "value_mean", "value_min", "value_max"):
        np.testing.assert_array_equal(got[col].to_numpy(), want[col].to_numpy(), err_msg=col)
    for col in ("sampen", "permen", "sampen_raw", "permen_raw"):
        a, b = got[col].to_numpy(), want[col].to_numpy()
        assert ((a == b) | (np.isnan(a) & np.isnan(b))).all(), col


def test_skew_guard_strides_long_windows(rng):
    n = 20000
    df = pd.DataFrame(
        {
            "conv_id": ["hot"] * n,
            "turn_idx": np.arange(n),
            "ts": 1_700_000_000_000_000 + np.arange(n) * 4_000_000,  # ~22h
            "value": rng.normal(size=n) * 100 + 300,
        }
    )
    cfg = RollupConfig(tiers=("1d",), max_window_points=1000)
    out = rollup_windows(
        df["conv_id"].to_numpy(dtype=object),
        df["turn_idx"].to_numpy(),
        df["ts"].to_numpy(),
        df["value"].to_numpy(),
        cfg,
    )
    # stats exact over all points, entropy over the strided subsample
    assert out["n_turns"].sum() == n
    assert np.isfinite(out["sampen"]).all()


def test_empty_input():
    cfg = RollupConfig()
    out = rollup_windows(
        np.empty(0, dtype=object), np.empty(0), np.empty(0), np.empty(0), cfg
    )
    assert all(len(v) == 0 for v in out.values())


def test_null_ids_are_dropped_not_merged():
    """groupby dropna semantics: null conv/signal ids must be dropped,
    never factorized into one synthetic -1 group."""
    import pandas as pd

    from eristropy_ray.config import RollupConfig
    from eristropy_ray.stages.signals import difference_partition
    from eristropy_ray.stages.windows import rollup_windows

    df = pd.DataFrame(
        {
            "signal_id": pd.array([1, None, 1, None], dtype="Int64"),
            "ts_us": np.array([1, 2, 3, 4], dtype=np.int64),
            "value": [1.0, 10.0, 2.0, 20.0],
            "tie": [0, 0, 0, 0],
        }
    )
    out = difference_partition(df)
    # only signal 1's second row survives; no fabricated 10->20 diff
    assert len(out) == 1
    assert float(out["value"].iloc[0]) == 1.0

    cols = rollup_windows(
        np.array(["a", None, "a", None], dtype=object),
        np.array([0, 0, 1, 1], dtype=np.int64),
        np.array([0, 0, 1_000_000, 1_000_000], dtype=np.int64),
        np.array([1.0, 10.0, 2.0, 20.0]),
        RollupConfig(),
    )
    assert set(cols["conv_id"]) == {"a"}
    assert all(n == 2 for n in cols["n_turns"])


def test_lateness_watermark_property():
    """Property: rollup_windows with lateness equals rollup_windows on a
    manually filtered input (per-(conv, day) max-ts watermark), for
    random conversations/timestamps/arrival orders."""
    import numpy as np

    from eristropy_ray.config import TIER_STEPS_US, RollupConfig
    from eristropy_ray.stages.windows import rollup_windows

    day = TIER_STEPS_US["1d"]
    rng = np.random.default_rng(41)
    for trial in range(5):
        n = int(rng.integers(20, 200))
        conv = rng.choice(np.array(["a", "b", "c"], dtype=object), size=n)
        ts = rng.integers(0, 3 * day, size=n).astype(np.int64)
        idx = rng.permutation(n).astype(np.int64)
        val = rng.normal(size=n)
        lateness = int(rng.integers(1, day))
        cfg = RollupConfig(tiers=("1h",), lateness_us=lateness)

        # manual expectation: keep ts >= max(ts in (conv, day)) - lateness
        keep = np.zeros(n, dtype=bool)
        d = ts // day
        for c in np.unique(conv):
            for dd in np.unique(d[conv == c]):
                m = (conv == c) & (d == dd)
                keep[m] = ts[m] >= ts[m].max() - lateness
        import pandas as pd

        def frame(cols):
            return (
                pd.DataFrame(cols)
                .sort_values(["tier", "conv_id", "bucket_ts"], kind="stable")
                .reset_index(drop=True)
            )

        want = frame(
            rollup_windows(
                conv[keep], idx[keep], ts[keep], val[keep],
                RollupConfig(tiers=("1h",)),
            )
        )
        got = frame(rollup_windows(conv, idx, ts, val, cfg))
        pd.testing.assert_frame_equal(got, want)
