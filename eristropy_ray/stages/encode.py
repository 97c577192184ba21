"""Gap-fill + compressed tier-block stage.

Operates on rollup rows (already tiny relative to the turn table), grouped
per hash partition of (conv_id) — same bucketing idiom as the rollup stage.
Per (conv_id, tier), sorted by bucket_ts:

1. optional linear-interpolation gap-fill onto the dense tier grid
   (codecs/gapfill.py); filled rows carry n_turns=0;
2. split into blocks of <= max_points;
3. delta-of-delta-encode the bucket timestamps and Gorilla-encode each
   configured float column.

Encoder state is per (conv, tier, block) by construction — blocks never
span a shard/checkpoint boundary, so resume cannot split a codec stream
(SURVEY.md §7.4 "Gorilla at bucket boundaries").

Output schema:
    conv_id, tier, block_start (timestamp[us]), n_points, gap_filled_points,
    ts_enc (binary), <col>_enc (binary per encoded column),
    raw_bytes, enc_bytes
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from eristropy_ray.codecs.dod import dod_encode
from eristropy_ray.codecs.gapfill import gapfill_series
from eristropy_ray.codecs.gorilla import gorilla_encode
from eristropy_ray.config import TIER_STEPS_US, EncodeConfig


def make_partition_encode_fn(cfg: EncodeConfig):
    """map_groups fn: rollup-row partition -> compressed blocks."""

    def encode_partition(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out: dict[str, list] = {
            "conv_id": [],
            "tier": [],
            "block_start": [],
            "n_points": [],
            "gap_filled_points": [],
            "ts_enc": [],
            "raw_bytes": [],
            "enc_bytes": [],
        }
        for col in cfg.columns:
            out[f"{col}_enc"] = []

        ts_int = df["bucket_ts"].astype("int64")
        for (conv, tier), g_idx in df.groupby(["conv_id", "tier"]).indices.items():
            step = TIER_STEPS_US[tier]
            order = np.argsort(ts_int.to_numpy()[g_idx], kind="stable")
            idx = g_idx[order]
            buckets = ts_int.to_numpy()[idx]
            series = {
                col: df[col].to_numpy()[idx].astype(np.float64)
                for col in cfg.columns
            }
            if cfg.gapfill:
                grid, _, observed = gapfill_series(buckets, series[cfg.columns[0]], step)
                filled = {}
                for col in cfg.columns:
                    _, filled_col, _ = gapfill_series(buckets, series[col], step)
                    filled[col] = filled_col
                buckets, series = grid, filled
            else:
                observed = np.ones(buckets.size, dtype=bool)

            for s in range(0, buckets.size, cfg.max_points):
                e = min(s + cfg.max_points, buckets.size)
                blk_ts = buckets[s:e]
                ts_enc = dod_encode(blk_ts)
                encs = {col: gorilla_encode(series[col][s:e]) for col in cfg.columns}
                out["conv_id"].append(conv)
                out["tier"].append(tier)
                out["block_start"].append(int(blk_ts[0]))
                out["n_points"].append(e - s)
                out["gap_filled_points"].append(int((~observed[s:e]).sum()))
                out["ts_enc"].append(ts_enc)
                out["raw_bytes"].append((e - s) * 8 * (1 + len(cfg.columns)))
                out["enc_bytes"].append(
                    len(ts_enc) + sum(len(b) for b in encs.values())
                )
                for col in cfg.columns:
                    out[f"{col}_enc"].append(encs[col])
        return pa.table(
            {
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "tier": pa.array(out["tier"], pa.string()),
                "block_start": pa.array(
                    np.array(out["block_start"], dtype=np.int64), pa.timestamp("us")
                ),
                "n_points": pa.array(out["n_points"], pa.int32()),
                "gap_filled_points": pa.array(out["gap_filled_points"], pa.int32()),
                "ts_enc": pa.array(out["ts_enc"], pa.binary()),
                **{
                    f"{col}_enc": pa.array(out[f"{col}_enc"], pa.binary())
                    for col in cfg.columns
                },
                "raw_bytes": pa.array(out["raw_bytes"], pa.int64()),
                "enc_bytes": pa.array(out["enc_bytes"], pa.int64()),
            }
        )

    return encode_partition


def decode_blocks(table: pa.Table, columns: tuple[str, ...]) -> pd.DataFrame:
    """Round-trip helper (tests + consumers): blocks -> dense rollup rows."""
    from eristropy_ray.codecs.dod import dod_decode
    from eristropy_ray.codecs.gorilla import gorilla_decode

    frames = []
    df = table.to_pandas()
    for _, row in df.iterrows():
        ts = dod_decode(row["ts_enc"])
        data = {"conv_id": row["conv_id"], "tier": row["tier"], "bucket_ts": ts}
        for col in columns:
            data[col] = gorilla_decode(row[f"{col}_enc"])
        frames.append(pd.DataFrame(data))
    if not frames:
        return pd.DataFrame(columns=["conv_id", "tier", "bucket_ts", *columns])
    return pd.concat(frames, ignore_index=True)
