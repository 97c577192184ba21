"""Registry-shape pins.

The correctness driver checks the first ~50 QUERIES entries per round,
so the registry order is a contract: every ORACLE_SQL-backed query must
precede every rows-only query (otherwise a hash-exact check silently
falls off the end of the driver's run, as happened to the seven
trailing join/streaming queries in round 3).
"""

from eristropy_ray.pipelines.queries import ORACLE_SQL, QUERIES


def test_oracle_backed_queries_come_first():
    keys = list(QUERIES)
    flags = [k in ORACLE_SQL for k in keys]
    first_rows_only = flags.index(False)
    assert all(not f for f in flags[first_rows_only:]), [
        k for k, f in zip(keys[first_rows_only:], flags[first_rows_only:]) if f
    ]


def test_every_oracle_has_a_query():
    missing = set(ORACLE_SQL) - set(QUERIES)
    assert not missing, missing


def test_registry_counts():
    # 45 hash-exact + 12 rows-only; update deliberately when adding ops
    assert sum(k in ORACLE_SQL for k in QUERIES) == 45
    assert len(QUERIES) == 57
