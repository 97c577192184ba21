"""Core windowed-entropy rollup over flat numpy arrays — the single code
path shared by every execution mode (bucketed map_batches, per-window
map_groups, and the local oracle used in tests).

Given (conv_id, turn_idx, ts, value) arrays for ANY set of conversations,
sorts by (conv, ts, turn_idx) — the "stable turn ordering" invariant from
BASELINE.json.input_hint — then for every retention tier emits one row per
(conv_id, bucket) window with exact vectorized stats (reduceat) and the
entropy kernels of the reference applied per window:

- ``sampen``/``permen``: computed on the first-differenced window series
  (the reference's stationarity preprocessing, stationarity.py:237-241,
  difference.py:52-79) — NaN when the window is shorter than
  ``cfg.min_window``;
- ``sampen_raw``/``permen_raw``: the same kernels on the raw series;
- per-window radius r = cfg.r_frac · std(series) (population), r = 1.0 for
  constant series (keeps the reference invariant SampEn(constant) = 0).

Windows never span group boundaries by construction: callers group by
conversation (bucketed mode) or by (conversation, day) — each tier's
buckets nest inside a day, so a (conv, day) group always contains whole
windows for every tier <= 1d.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from eristropy_ray.config import TIER_STEPS_US, RollupConfig
from eristropy_ray.kernels.permen import permen
from eristropy_ray.kernels.sampen import sampen

ROLLUP_COLUMNS = (
    "conv_id",
    "tier",
    "bucket_ts",
    "n_turns",
    "value_mean",
    "value_sum",
    "value_min",
    "value_max",
    "value_std",
    "sampen",
    "permen",
    "sampen_raw",
    "permen_raw",
)


def _entropy_pair(x: np.ndarray, r: float, cfg: RollupConfig) -> tuple[float, float]:
    """(sampen, permen) of one window series with the given radius
    (scalar path, used for windows longer than the batch classes). The
    radius comes from the full window even when the kernel runs on the
    deterministic strided subsample."""
    if x.size > cfg.max_window_points:
        stride = -(-x.size // cfg.max_window_points)  # ceil division
        x = x[::stride]
    return sampen(x, cfg.m, r), permen(x, order=cfg.permen_order)


def window_radii_from_moments(
    ssq_centered: np.ndarray, counts: np.ndarray, r_frac: float
) -> np.ndarray:
    """r = r_frac * population std from centered second moments; 1.0 for
    constant windows (keeps SampEn(constant)=0). One shared definition for
    the engine and the test oracle — see ``raw_window_radius``."""
    with np.errstate(invalid="ignore", divide="ignore"):
        std = np.sqrt(ssq_centered / counts)
    return np.where(std > 0.0, r_frac * std, 1.0)


def raw_window_radius(x: np.ndarray, r_frac: float) -> float:
    """Per-window oracle form of the engine's radius derivation: the same
    reduceat accumulation order on a single segment."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    mean = np.add.reduceat(x, [0])[0] / n
    c = x - mean
    ssq = np.add.reduceat(c * c, [0])[0]
    return float(window_radii_from_moments(
        np.array([ssq]), np.array([n]), r_frac
    )[0])


def diff_window_radius(x: np.ndarray, r_frac: float) -> float:
    """Oracle form for the differenced series: mean via the telescoping
    (last-first)/(n-1) identity, variance via the centered reduceat."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < 2:
        return 1.0
    d = x[1:] - x[:-1]
    mean = (x[-1] - x[0]) / (n - 1.0)
    c = d - mean
    ssq = np.add.reduceat(c * c, [0])[0]
    return float(window_radii_from_moments(
        np.array([ssq]), np.array([n - 1]), r_frac
    )[0])


# padded-batch window-length classes; windows longer than the last class
# take the scalar path (few — 1h/1d windows of very long conversations).
# Each class pads to the actual max length present, not the class bound.
_BATCH_CLASSES = (16, 128)


def _window_entropies(
    v: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    eligible: np.ndarray,
    radii: np.ndarray,
    cfg: RollupConfig,
) -> tuple[np.ndarray, np.ndarray]:
    """(sampen, permen) arrays over all windows; NaN where not eligible.

    Small windows (the overwhelming majority — the 1m tier) go through the
    padded batch kernels in length classes; large windows fall back to the
    scalar kernels with the deterministic stride cap. A window's path is a
    pure function of its length, so results are placement-independent.
    Radii are precomputed once per tier (centered reduceat moments).
    """
    from eristropy_ray.kernels.batch_entropy import (
        gather_padded,
        permen_padded,
        sampen_padded,
    )

    n_win = lengths.size
    s_out = np.full(n_win, np.nan)
    p_out = np.full(n_win, np.nan)
    lo = 0
    for L in _BATCH_CLASSES:
        sel = np.flatnonzero(eligible & (lengths > lo) & (lengths <= L))
        lo = L
        if sel.size == 0:
            continue
        L_eff = int(lengths[sel].max())
        P = gather_padded(v, starts[sel], lengths[sel], L_eff)
        s_out[sel] = sampen_padded(P, lengths[sel], cfg.m, radii[sel])
        p_out[sel] = permen_padded(P, lengths[sel], cfg.permen_order)
    for w in np.flatnonzero(eligible & (lengths > _BATCH_CLASSES[-1])):
        s_out[w], p_out[w] = _entropy_pair(
            v[starts[w] : starts[w] + lengths[w]], radii[w], cfg
        )
    return s_out, p_out


def rollup_windows(
    conv_id: np.ndarray,
    turn_idx: np.ndarray,
    ts_us: np.ndarray,
    value: np.ndarray,
    cfg: RollupConfig,
) -> dict[str, np.ndarray]:
    """All-tier rollup rows (dict of columns per ROLLUP_COLUMNS) for the
    given turns. Input order is irrelevant; output is ordered by
    (tier, conv, bucket). Null conv_ids are dropped (groupby dropna
    semantics — factorize's -1 code would merge them into one synthetic
    conversation).

    Late-data policy (``cfg.lateness_us`` not None): turns older than the
    (conversation, day) watermark — the max ts seen in that conv-day
    minus the allowed lateness — are dropped before windowing. The
    watermark is deliberately (conv, DAY)-local, not conv-global: the
    bucketed execution mode groups by day-salted conversation keys, so a
    day-local rule is the strongest one every physical plan (colocated,
    bucketed, window_groups) can evaluate identically — and it is
    order-independent, the batch analogue of the streaming operator's
    end-state watermark (q_streaming_window's per-arrival drop).
    """
    valid = pd.notna(conv_id)
    if not valid.all():
        conv_id = conv_id[valid]
        turn_idx = np.asarray(turn_idx)[valid]
        ts_us = np.asarray(ts_us)[valid]
        value = np.asarray(value)[valid]
    codes, uniques = pd.factorize(conv_id, sort=False)
    codes = np.ascontiguousarray(codes, dtype=np.int64)
    ts_us = np.ascontiguousarray(ts_us, dtype=np.int64)
    turn_idx = np.ascontiguousarray(turn_idx, dtype=np.int64)
    value = np.ascontiguousarray(value, dtype=np.float64)

    order = np.lexsort((turn_idx, ts_us, codes))
    codes = codes[order]
    ts_us = ts_us[order]
    v = value[order]
    uniques = np.asarray(uniques, dtype=object)

    if cfg.lateness_us is not None and codes.size:
        day_us = TIER_STEPS_US["1d"]
        day = np.floor_divide(ts_us, day_us)
        seg = np.empty(codes.size, dtype=bool)
        seg[0] = True
        np.logical_or(
            codes[1:] != codes[:-1], day[1:] != day[:-1], out=seg[1:]
        )
        seg_starts = np.flatnonzero(seg)
        seg_ends = np.append(seg_starts[1:], codes.size)
        # rows are ts-sorted within (conv, day): segment max = last row
        wm = ts_us[seg_ends - 1] - cfg.lateness_us
        keep = ts_us >= np.repeat(wm, seg_ends - seg_starts)
        if not keep.all():
            codes, ts_us, v = codes[keep], ts_us[keep], v[keep]

    out: dict[str, list[np.ndarray]] = {name: [] for name in ROLLUP_COLUMNS}
    for tier in cfg.tiers:
        step = TIER_STEPS_US[tier]
        bucket = (ts_us // step) * step
        if codes.size == 0:
            continue
        change = np.empty(codes.size, dtype=bool)
        change[0] = True
        np.logical_or(
            codes[1:] != codes[:-1], bucket[1:] != bucket[:-1], out=change[1:]
        )
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, codes.size))
        sums = np.add.reduceat(v, starts)
        mins = np.minimum.reduceat(v, starts)
        maxs = np.maximum.reduceat(v, starts)
        means = sums / counts
        # centered two-pass variance: the single-pass E[x^2]-mean^2 form
        # loses all precision when |mean| >> std (e.g. counter-like values)
        rep = np.repeat(np.arange(starts.size), counts)
        centered = v - means[rep]
        ssq_c = np.add.reduceat(centered * centered, starts)
        var = ssq_c / counts
        stds = np.sqrt(var)
        r_raw = window_radii_from_moments(ssq_c, counts, cfg.r_frac)

        n_win = starts.size
        use_diff = cfg.preprocess == "difference"
        eligible = counts >= cfg.min_window
        s_raw, p_raw = _window_entropies(v, starts, counts, eligible, r_raw, cfg)
        if use_diff:
            dv = np.empty(v.size)
            if v.size:
                dv[0] = 0.0
                np.subtract(v[1:], v[:-1], out=dv[1:])
            # diff-series radius: telescoping mean, centered reduceat
            # variance; dv[starts] is zeroed by construction so segment
            # sums over [start, next_start) cover exactly [start+1, end)
            ends = np.append(starts[1:], codes.size)
            with np.errstate(invalid="ignore", divide="ignore"):
                means_d = (v[ends - 1] - v[starts]) / (counts - 1.0)
            cd = dv - means_d[rep]
            cd[starts] = 0.0
            ssq_d = np.add.reduceat(cd * cd, starts)
            r_diff = window_radii_from_moments(
                ssq_d, np.maximum(counts - 1, 1), cfg.r_frac
            )
            s_diff, p_diff = _window_entropies(
                dv, starts + 1, counts - 1, eligible, r_diff, cfg
            )
        else:
            s_diff, p_diff = s_raw, p_raw

        out["conv_id"].append(uniques[codes[starts]])
        out["tier"].append(np.full(n_win, tier, dtype=object))
        out["bucket_ts"].append(bucket[starts])
        out["n_turns"].append(counts.astype(np.int64))
        out["value_mean"].append(means)
        out["value_sum"].append(sums)
        out["value_min"].append(mins)
        out["value_max"].append(maxs)
        out["value_std"].append(stds)
        out["sampen"].append(s_diff)
        out["permen"].append(p_diff)
        out["sampen_raw"].append(s_raw)
        out["permen_raw"].append(p_raw)

    if not out["conv_id"]:
        return {
            "conv_id": np.empty(0, dtype=object),
            "tier": np.empty(0, dtype=object),
            "bucket_ts": np.empty(0, dtype=np.int64),
            **{
                name: np.empty(0, dtype=np.int64 if name == "n_turns" else np.float64)
                for name in ROLLUP_COLUMNS[3:]
            },
        }
    return {name: np.concatenate(chunks) for name, chunks in out.items()}
