"""Local replica of the driver's correctness harness: run every
``queries()`` entry against its ``oracle_sql()`` twin on the same sf dir
and compare row count, schema and exact values (order-insensitive).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if str(df[col].dtype).startswith("datetime"):
            df[col] = df[col].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    a, b = canon(ray_df), canon(sql_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH ray={list(a.columns)} sql={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH ray={len(a)} sql={len(b)}"
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        if av.dtype != bv.dtype:
            # The driver's value-hash is dtype-sensitive (int64 3 vs
            # float64 3.0 hash differently) even when values are equal.
            return f"DTYPE MISMATCH col={col} ray={av.dtype} sql={bv.dtype}"
        if av.dtype.kind == "f" or bv.dtype.kind == "f":
            av = av.astype(np.float64)
            bv = bv.astype(np.float64)
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
        else:
            same = av == bv
        if not np.asarray(same).all():
            bad = int((~np.asarray(same)).sum())
            i = int(np.flatnonzero(~np.asarray(same))[0])
            return (
                f"VALUE MISMATCH col={col} rows={bad}/{len(a)} "
                f"first: ray={av[i]!r} sql={bv[i]!r}"
            )
    return "OK"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR", ignore_reinit_error=True,
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from eristropy_ray.raylog import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()

    from eristropy_ray.pipelines.queries import ORACLE_SQL, QUERIES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} RAY ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in ORACLE_SQL:
            print(f"{name:24s} rows-only: {len(ray_df)} rows")
            continue
        try:
            sql_df = con.execute(ORACLE_SQL[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"{name:24s} SQL ERROR: {type(e).__name__}: {e}")
            failures += 1
            continue
        verdict = compare(name, ray_df, sql_df)
        print(f"{name:24s} {verdict}")
        if verdict != "OK":
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
