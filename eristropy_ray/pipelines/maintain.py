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
        if len(tiers) == 1 and tiers[0] in TIER_STEPS_US:
            fine_step = TIER_STEPS_US[str(tiers[0])]
            if step <= fine_step:
                # e.g. day rows "cascaded" to 1h: the re-bucketing is a
                # no-op and the output would be day-level stats silently
                # mislabeled with the finer tier
                raise ValueError(
                    f"coarse_tier {coarse_tier!r} is not coarser than the "
                    f"input rows' tier {tiers[0]!r}"
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
    for blocks max(block_end) + step — ``block_end`` is the block's LAST
    bucket, exact even for the sparse blocks ``EncodeConfig(gapfill=
    False)`` produces (a block's start is its OLDEST bucket, and the
    dense estimate block_start + n_points*step under-covers sparse
    blocks, which would delete files still holding in-retention points;
    legacy files written before ``block_end`` existed fall back to the
    dense estimate, exact for their always-gap-filled layout).

    I/O shape: parquet FOOTER statistics only (row-group max of the
    timestamp column) — a retention sweep over a 100 TB tier store must
    not decompress data pages; a file with missing/untrusted stats falls
    back to reading just the needed column. Unreadable or
    foreign-schema files are skipped, never deleted."""
    out = Path(out_dir)

    def _stats_max(pf: pq.ParquetFile, col: str) -> int | None:
        """max over row-group footer stats for ``col``, as int64 µs
        (None when any row group lacks trustworthy stats). Uses the
        PHYSICAL value (``max_raw``): timestamp[us] is stored as int64
        µs, sidestepping the naive-datetime local-time hazard of the
        logical ``Statistics.max``."""
        md = pf.metadata
        if md.num_row_groups == 0:
            return None
        rg0 = md.row_group(0)
        idx = next(
            (
                i
                for i in range(rg0.num_columns)
                if rg0.column(i).path_in_schema == col
            ),
            None,
        )
        if idx is None:
            return None
        best: int | None = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            mx = st.max_raw
            if not isinstance(mx, int):
                return None
            best = mx if best is None else max(best, mx)
        return best

    def _col_max(f: Path, col: str) -> int | None:
        t = pq.read_table(f, columns=[col])
        if not t.num_rows:
            return None
        return int(pa.compute.max(t[col].cast(pa.int64())).as_py())

    deleted: dict[str, int] = {}
    for tier, max_age in policy.items():
        cutoff = now_us - max_age
        step = TIER_STEPS_US[tier]
        count = 0
        for sub in subdirs:
            for f in out.glob(f"{sub}/**/tier={tier}/*.parquet"):
                try:
                    pf = pq.ParquetFile(f)
                    if pf.metadata.num_rows == 0:
                        continue
                    names = set(pf.schema_arrow.names)
                    if sub == "rollup":
                        mx = _stats_max(pf, "bucket_ts")
                        if mx is None:
                            mx = _col_max(f, "bucket_ts")
                        newest = mx + step if mx is not None else None
                    elif "block_end" in names:
                        mx = _stats_max(pf, "block_end")
                        if mx is None:
                            mx = _col_max(f, "block_end")
                        newest = mx + step if mx is not None else None
                    else:
                        # legacy blocks (pre-block_end): dense estimate,
                        # exact for gap-filled data
                        meta = pq.read_table(
                            f, columns=["block_start", "n_points"]
                        )
                        if not meta.num_rows:
                            continue
                        starts = meta["block_start"].cast(pa.int64()).to_numpy()
                        npts = meta["n_points"].cast(pa.int64()).to_numpy()
                        newest = int((starts + npts * step).max())
                except (OSError, KeyError, pa.ArrowInvalid):
                    continue
                if newest is not None and newest < cutoff:
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
    that newly appear added. Only tiers in ``cfg.tiers`` are recomputed;
    rows of OTHER tiers pass through unchanged even in touched days (the
    caller recomputes them with a second call or ``cascade_stats`` —
    deleting them here would silently drop data the recompute does not
    replace). Deterministic: the merged turn multiset fully determines
    every recomputed row.
    """

    def _ts_us(df: pd.DataFrame) -> np.ndarray:
        ts = df["ts"]
        if np.issubdtype(ts.dtype, np.datetime64):
            return ts.to_numpy().astype("datetime64[us]").astype(np.int64)
        return ts.to_numpy(dtype=np.int64)

    if not len(new_turns):
        # empty late batch: nothing touched, return the frame unchanged
        # (an empty boolean list would otherwise be read as column
        # labels by pandas, not an empty row selector)
        return rollup_rows

    touched_convs = set(new_turns["conv_id"])
    stored = stored_turns[stored_turns["conv_id"].isin(touched_convs)]
    merged = pd.concat([stored, new_turns], ignore_index=True)
    # dedupe exact replays of the same (conv, turn_idx)
    merged = merged.drop_duplicates(["conv_id", "turn_idx"], keep="last")

    # recompute the day-groups containing new turns (windows of every tier
    # <= 1d nest inside them) PLUS the stored days of replayed keys — a
    # corrected turn whose timestamp moved across a day boundary must
    # vacate its old day too. Membership tests are vectorized
    # (MultiIndex.isin), not per-row Python — the stored-turn slice can
    # be large.
    day = TIER_STEPS_US["1d"]
    scope_idx = pd.MultiIndex.from_arrays(
        [new_turns["conv_id"], (_ts_us(new_turns) // day) * day]
    )
    new_keys_idx = pd.MultiIndex.from_arrays(
        [new_turns["conv_id"], new_turns["turn_idx"]]
    )
    replaced = stored[
        pd.MultiIndex.from_arrays(
            [stored["conv_id"], stored["turn_idx"]]
        ).isin(new_keys_idx)
    ]
    if len(replaced):
        scope_idx = scope_idx.append(
            pd.MultiIndex.from_arrays(
                [replaced["conv_id"], (_ts_us(replaced) // day) * day]
            )
        )
    scope_idx = scope_idx.unique()
    m_day = (_ts_us(merged) // day) * day
    in_scope = pd.MultiIndex.from_arrays([merged["conv_id"], m_day]).isin(
        scope_idx
    )
    # np.asarray(..., dtype=bool): an all-empty mask must stay a boolean
    # row selector, not be read as (float) column labels
    scope = merged[np.asarray(in_scope, dtype=bool)]

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
    # the turn in both its old and new buckets. Restricted to cfg.tiers —
    # recomputation only covers those, so deleting other tiers' rows in
    # the touched days would silently drop them from the returned frame.
    ex_us = existing["bucket_ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
    ex_day = (ex_us // day) * day
    stale = np.asarray(
        pd.MultiIndex.from_arrays([existing["conv_id"], ex_day]).isin(
            scope_idx
        ),
        dtype=bool,
    )
    stale &= existing["tier"].isin(cfg.tiers).to_numpy()
    out = pd.concat([existing[~stale], recomputed], ignore_index=True)
    return out.sort_values(key, kind="stable").reset_index(drop=True)
