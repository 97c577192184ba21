"""Targeted suppression of Ray Data's empty-schema RefBundle warning.

Ray's sort-based exchange (``Dataset.sort`` / ``groupby().map_groups``)
emits zero-row blocks for empty key ranges, and those blocks carry an
EMPTY schema (the reduce-side block builder never sees a row). The
streaming executor then logs, once per operator::

    Operator produced a RefBundle with a different schema than the
    previous one. ... new schema: .

The executor itself repairs the bundle — when schemas diverge it keeps
the previous (non-empty) schema on the returned RefBundle
(``streaming_executor_state``'s unify helper) — so downstream
``select_columns`` etc. see a typed schema. The warning is pure noise
for this specific empty-new-schema case, which cannot be prevented from
UDF code (every UDF in this repo already returns typed empty frames;
the schema-less blocks are born inside Ray's sort reduce).

``install_empty_schema_warning_filter`` drops ONLY messages whose *new*
schema is empty. A genuine divergence (two different non-empty column
sets) still surfaces.
"""

from __future__ import annotations

import logging

_EMPTY_SCHEMA_REPRS = (
    "new schema: .",
    "new schema: PandasBlockSchema(names=[], types=[]).",
)


class _EmptyNewSchemaFilter(logging.Filter):
    def filter(self, record: logging.LogRecord) -> bool:  # True = keep
        msg = record.getMessage()
        if "Operator produced a RefBundle with a different schema" not in msg:
            return True
        return not any(token in msg for token in _EMPTY_SCHEMA_REPRS)


def install_empty_schema_warning_filter() -> None:
    """Idempotently attach the filter to the streaming-executor logger."""
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptyNewSchemaFilter) for f in logger.filters):
        logger.addFilter(_EmptyNewSchemaFilter())
