"""Continuous-aggregate maintenance: downsample cascade, retention,
incremental window updates.

- ``cascade_stats``: the decomposable rollup columns (n_turns, value_sum,
  value_min, value_max, and exact mean via integer-micro sums) of a
  coarser tier derived FROM the finer tier's rows — no second pass over
  the turn table. Entropy columns are NOT decomposable (SampEn of an hour
  cannot be assembled from minute SampEns), which is exactly why the
  flagship computes every tier from raw in its single pass; the cascade
  exists for stat-only re-aggregation (e.g. after retention has aged out
  raw turns) and is verified equal to direct computation in tests.

- ``apply_retention``: age out tier partitions per a {tier: max_age_us}
  policy over the hive-partitioned rows/blocks layout. File-level,
  manifest-aware deletes (a tier directory holds one file per input
  shard; a file is dropped only when EVERY bucket in it is expired).

- ``update_windows_incremental``: late/new turns for already-rolled-up
  conversations: recompute only the affected (conv_id, bucket) windows
  from the union of stored turns for those windows and the new batch,
  then upsert into the rollup rows. Window-level recomputation is the
  correct granularity because every rollup column is a pure function of
  the window's turn multiset.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from eristropy_ray.config import TIER_STEPS_US, RollupConfig
from eristropy_ray.stages.windows import rollup_windows


def cascade_stats(fine: pd.DataFrame, coarse_tier: str) -> pd.DataFrame:
    """Aggregate finer-tier rollup rows into coarser-tier STAT rows.

    Exactness: value_sum re-aggregates via integer micro-units (the same
    convention as the SQL oracles) so cascaded sums equal direct sums
    bit-for-bit; min/max/count are trivially exact.
    """
    step = TIER_STEPS_US[coarse_tier]
    if "tier" in fine.columns:
        tiers = fine["tier"].unique()
        if len(tiers) > 1:
            # mixed tiers would silently count each turn once PER tier
            raise ValueError(
                f"cascade_stats expects rows of a single fine tier, got {sorted(tiers)}"
            )
    df = fine.copy()
    b = df["bucket_ts"]
    if np.issubdtype(b.dtype, np.datetime64):
        bucket_us = b.to_numpy().astype("datetime64[us]").astype(np.int64)
    else:
        bucket_us = b.to_numpy(dtype=np.int64)
    df["bucket_ts"] = bucket_us - bucket_us % step
    df["_sum_mu"] = np.round(df["value_sum"].to_numpy() * 1e6).astype(np.int64)
    g = df.groupby(["conv_id", "bucket_ts"], sort=True).agg(
        n_turns=("n_turns", "sum"),
        _sum_mu=("_sum_mu", "sum"),
        value_min=("value_min", "min"),
        value_max=("value_max", "max"),
    )
    g = g.reset_index()
    vsum = g["_sum_mu"].astype(np.float64) / 1e6
    g["value_sum"] = vsum
    g["value_mean"] = vsum / g["n_turns"]
    g["tier"] = coarse_tier
    g["bucket_ts"] = pd.to_datetime(g["bucket_ts"], unit="us")
    return g.drop(columns=["_sum_mu"])[
        ["conv_id", "tier", "bucket_ts", "n_turns", "value_mean",
         "value_sum", "value_min", "value_max"]
    ]


def apply_retention(
    out_dir: str | Path,
    now_us: int,
    policy: dict[str, int],
    subdirs: tuple[str, ...] = ("rollup", "blocks"),
) -> dict[str, int]:
    """Delete tier partition files whose entire content is older than
    ``now_us - policy[tier]``. Returns {tier: files_deleted}.

    Files are the checkpoint/resume granularity, so deletion never splits
    a codec stream or a shard. A file survives until its newest COVERED
    timestamp expires: for rollup rows that is max(bucket_ts) + step, and
    for blocks max(block_start + n_points*step) — a block's start is its
    OLDEST bucket, so judging by block_start alone would delete files
    still holding in-retention points."""
    out = Path(out_dir)
    deleted: dict[str, int] = {}
    for tier, max_age in policy.items():
        cutoff = now_us - max_age
        step = TIER_STEPS_US[tier]
        count = 0
        for sub in subdirs:
            for f in out.glob(f"{sub}/**/tier={tier}/*.parquet"):
                try:
                    if sub == "rollup":
                        meta = pq.read_table(f, columns=["bucket_ts"])
                        if not meta.num_rows:
                            continue
                        newest = (
                            int(
                                pa.compute.max(
                                    meta["bucket_ts"].cast(pa.int64())
                                ).as_py()
                            )
                            + step
                        )
                    else:
                        meta = pq.read_table(
                            f, columns=["block_start", "n_points"]
                        )
                        if not meta.num_rows:
                            continue
                        starts = meta["block_start"].cast(pa.int64()).to_numpy()
                        npts = (
                            meta["n_points"].cast(pa.int64()).to_numpy()
                        )
                        newest = int((starts + npts * step).max())
                except (OSError, KeyError):
                    continue
                if newest < cutoff:
                    f.unlink()
                    count += 1
        deleted[tier] = count
    return deleted


def update_windows_incremental(
    rollup_rows: pd.DataFrame,
    stored_turns: pd.DataFrame,
    new_turns: pd.DataFrame,
    cfg: RollupConfig = RollupConfig(),
) -> pd.DataFrame:
    """Upsert rollup rows for the windows touched by ``new_turns``.

    Args:
        rollup_rows: existing rollup rows (any subset of tiers/convs).
        stored_turns: the turn store restricted to (at least) the touched
            conversations — (conv_id, turn_idx, ts, value) with ts int64
            µs or timestamp.
        new_turns: the late/new batch, same schema.

    Returns the updated rollup frame: untouched rows unchanged, touched
    (conv, tier, bucket) rows recomputed from the merged turns, windows
    that newly appear added. Deterministic: the merged turn multiset
    fully determines every recomputed row.
    """

    def _ts_us(df: pd.DataFrame) -> np.ndarray:
        ts = df["ts"]
        if np.issubdtype(ts.dtype, np.datetime64):
            return ts.to_numpy().astype("datetime64[us]").astype(np.int64)
        return ts.to_numpy(dtype=np.int64)

    touched_convs = set(new_turns["conv_id"])
    stored = stored_turns[stored_turns["conv_id"].isin(touched_convs)]
    merged = pd.concat([stored, new_turns], ignore_index=True)
    # dedupe exact replays of the same (conv, turn_idx)
    merged = merged.drop_duplicates(["conv_id", "turn_idx"], keep="last")

    # recompute the day-groups containing new turns (windows of every tier
    # <= 1d nest inside them) PLUS the stored days of replayed keys — a
    # corrected turn whose timestamp moved across a day boundary must
    # vacate its old day too
    day = TIER_STEPS_US["1d"]
    scope_days = set(
        zip(new_turns["conv_id"], (_ts_us(new_turns) // day) * day)
    )
    new_keys = set(zip(new_turns["conv_id"], new_turns["turn_idx"]))
    replaced = stored[
        [
            (c, t) in new_keys
            for c, t in zip(stored["conv_id"], stored["turn_idx"])
        ]
    ]
    if len(replaced):
        scope_days |= set(
            zip(replaced["conv_id"], (_ts_us(replaced) // day) * day)
        )
    m_ts = _ts_us(merged)
    m_day = (m_ts // day) * day
    in_scope = [
        (c, d) in scope_days for c, d in zip(merged["conv_id"], m_day)
    ]
    scope = merged[np.asarray(in_scope)]

    cols = rollup_windows(
        scope["conv_id"].to_numpy(dtype=object),
        scope["turn_idx"].to_numpy(dtype=np.int64),
        _ts_us(scope),
        scope["value"].to_numpy(dtype=np.float64),
        cfg,
    )
    recomputed = pd.DataFrame(cols)
    recomputed["bucket_ts"] = pd.to_datetime(recomputed["bucket_ts"], unit="us")

    key = ["conv_id", "tier", "bucket_ts"]
    existing = rollup_rows.copy()
    # same dtype dispatch as _ts_us: int64 bucket_ts (the dtype
    # rollup_windows itself emits) is MICROSECONDS, not the nanoseconds
    # a unit-less to_datetime would assume — a silent unit mismatch here
    # makes every upsert key miss and duplicates the touched rows
    if pd.api.types.is_integer_dtype(existing["bucket_ts"]):
        existing["bucket_ts"] = pd.to_datetime(existing["bucket_ts"], unit="us")
    else:
        existing["bucket_ts"] = pd.to_datetime(existing["bucket_ts"])
    # drop EVERY existing row whose (conv, day) is in the recompute scope,
    # not just keys present in `recomputed`: a bucket emptied by a moved
    # turn has no recomputed row, and keeping its stale row would count
    # the turn in both its old and new buckets
    ex_us = existing["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ex_day = (ex_us // day) * day
    stale = np.array(
        [
            (c, d) in scope_days
            for c, d in zip(existing["conv_id"], ex_day)
        ],
        dtype=bool,
    )
    out = pd.concat([existing[~stale], recomputed], ignore_index=True)
    return out.sort_values(key, kind="stable").reset_index(drop=True)
