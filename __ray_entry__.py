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


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001; returns a Dataset."""
    from eristropy_ray.pipelines.queries import q_transcript_rollup

    return q_transcript_rollup("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from eristropy_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from eristropy_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
