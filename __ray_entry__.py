"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in the library) calls ray.init()/ray.shutdown().

- ``entry()``: flagship entropy-rollup pipeline over sf0.001 — events
  projected to transcript shape, windowed SampEn/PermEn rollups at
  1m/1h/1d retention tiers.
- ``queries()``: one callable per implemented operator (SURVEY.md §2 +
  the net-new data-pipeline ops); see eristropy_ray/pipelines/queries.py.
- ``oracle_sql()``: DuckDB twins, engineered for binary-exact value-hash
  matches (integer-micro / DECIMAL summation on both sides).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _colocated_files(sf_dir: str, n_files: int = 8) -> list[str]:
    """Partition the events table into conversation-complete transcript
    files (deterministic /tmp cache with an atomic _SUCCESS marker) so
    entry() exercises the multi-file colocated flagship path."""
    import os

    import pyarrow.parquet as pq

    from eristropy_ray.sources.transcripts import events_to_transcripts

    src = Path(sf_dir) / "events.parquet"
    st = src.stat()
    # content fingerprint in the cache key: regenerated testdata must not
    # serve stale cached transcripts
    out = Path(
        "/tmp/eristropy_ray/entry_colocated_"
        f"{Path(sf_dir).name}_{n_files}_{st.st_size}_{int(st.st_mtime)}"
    )
    done = out / "_SUCCESS"
    if not done.exists():
        out.mkdir(parents=True, exist_ok=True)
        events = pq.read_table(f"{sf_dir}/events.parquet")
        uid = events["user_id"].to_numpy()
        for p in range(n_files):
            import pyarrow as pa

            sub = events.filter(pa.array(uid % n_files == p))
            tmp = out / f".part-{p:05d}.parquet.tmp"
            pq.write_table(events_to_transcripts(sub), tmp)
            os.replace(tmp, out / f"part-{p:05d}.parquet")
        done.touch()
    return sorted(str(p) for p in out.glob("*.parquet"))


def entry() -> Any:
    """Flagship pipeline (multi-file zero-shuffle colocated rollup) on
    /root/testdata/sf0.01; returns a Dataset of rollup rows."""
    from eristropy_ray.pipelines.rollup import rollup_files_colocated
    from eristropy_ray.raylog import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()
    return rollup_files_colocated(_colocated_files("/root/testdata/sf0.01"))


def queries() -> dict[str, Callable[[str], Any]]:
    from eristropy_ray.pipelines.queries import QUERIES
    from eristropy_ray.raylog import install_empty_schema_warning_filter

    install_empty_schema_warning_filter()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from eristropy_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
