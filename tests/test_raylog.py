"""The empty-schema warning filter drops ONLY the empty-new-schema noise
born in Ray's sort reduce; genuine schema divergences still surface."""

import logging

from eristropy_ray.raylog import (
    _EmptyNewSchemaFilter,
    install_empty_schema_warning_filter,
)


def _record(msg: str) -> logging.LogRecord:
    return logging.LogRecord("x", logging.WARNING, "f", 1, msg, None, None)


def test_filter_drops_empty_new_schema():
    f = _EmptyNewSchemaFilter()
    base = "Operator produced a RefBundle with a different schema than the previous one. Previous schema: a: int64, "
    assert not f.filter(_record(base + "new schema: . This may lead"))
    assert not f.filter(
        _record(base + "new schema: PandasBlockSchema(names=[], types=[]). x")
    )


def test_filter_keeps_real_divergence_and_other_messages():
    f = _EmptyNewSchemaFilter()
    real = (
        "Operator produced a RefBundle with a different schema than the "
        "previous one. Previous schema: a: int64, new schema: b: double. x"
    )
    assert f.filter(_record(real))
    assert f.filter(_record("some unrelated warning"))


def test_install_idempotent():
    install_empty_schema_warning_filter()
    install_empty_schema_warning_filter()
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    n = sum(isinstance(x, _EmptyNewSchemaFilter) for x in logger.filters)
    assert n == 1
