"""Rollup stage wrappers: the two execution modes over the shared
``rollup_windows`` core (stages/windows.py).

Physical plan (SURVEY.md §4.2): the ONE big shuffle co-locates each
conversation's turns; everything downstream of the window stage is
windows-sized (orders of magnitude smaller).

- **bucketed** (default): ``part = hash(conv_id) % P`` column, then
  ``groupby("part").map_groups(RollupPartition)`` — each task gets a whole
  hash partition and runs the vectorized multi-conversation core once.
  Per-task Python overhead is O(P), not O(windows): at 10^12 turns the
  per-window map_groups dispatch cost would dominate, bucketing amortizes
  it. P controls peak task memory (rows/P).

- **window_groups**: ``groupby(conv_id, day).map_groups`` — Ray assembles
  exact (conversation, day) groups. Simple, used as a cross-check in tests;
  per-group dispatch overhead makes it the slower mode at scale.

Both modes produce identical rows (pipeline test asserts equality).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from eristropy_ray.config import TIER_STEPS_US, RollupConfig
from eristropy_ray.stages.windows import rollup_windows

_DAY_US = TIER_STEPS_US["1d"]


def _to_arrow(cols: dict[str, np.ndarray]) -> pa.Table:
    return pa.table(
        {
            "conv_id": pa.array(cols["conv_id"], pa.string()),
            "tier": pa.array(cols["tier"], pa.string()),
            "bucket_ts": pa.array(cols["bucket_ts"], pa.timestamp("us")),
            "n_turns": pa.array(cols["n_turns"], pa.int64()),
            **{
                name: pa.array(cols[name], pa.float64())
                for name in (
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
            },
        }
    )


def _rollup_table(t: pa.Table, cfg: RollupConfig) -> pa.Table:
    cols = rollup_windows(
        conv_id=t["conv_id"].to_numpy(zero_copy_only=False),
        turn_idx=t["turn_idx"].to_numpy(zero_copy_only=False),
        ts_us=t["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False),
        value=t["value"].to_numpy(zero_copy_only=False),
        cfg=cfg,
    )
    return _to_arrow(cols)


def make_partition_rollup_fn(cfg: RollupConfig):
    """map_groups fn for the bucketed mode (one whole hash bucket per call)."""

    def rollup_partition(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["part"]) if "part" in t.column_names else t
        return _rollup_table(t, cfg)

    return rollup_partition


def add_day_column(batch: pa.Table) -> pa.Table:
    """Append the 1d bucket (µs) — the window_groups grouping key."""
    ts = batch["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    day = (ts // _DAY_US) * _DAY_US
    return batch.append_column("day", pa.array(day, pa.int64()))


def make_window_group_fn(cfg: RollupConfig):
    def fn(t: pa.Table) -> pa.Table:
        t = t.drop_columns(["day"]) if "day" in t.column_names else t
        return _rollup_table(t, cfg)

    return fn
