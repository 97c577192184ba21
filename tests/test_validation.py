"""Validation error taxonomy mirrors the reference's
tests/test_validation.py:8-119 (empty / missing-column / non-numeric /
datetime / boolean / NaN / inf inputs all raise)."""

import numpy as np
import pyarrow as pa
import pytest

from eristropy_ray.stages.validate import (
    SignalValidationError,
    make_validator,
    validate_signal_batch,
)


def _good():
    return pa.table(
        {
            "signal_id": pa.array(["a", "a", "b"]),
            "ts_us": pa.array([1, 2, 1], pa.int64()),
            "value": pa.array([0.1, 0.2, 0.3], pa.float64()),
        }
    )


def test_valid_passes_through_zero_copy():
    t = _good()
    assert validate_signal_batch(t) is t


def test_empty_raises():
    with pytest.raises(SignalValidationError, match="empty"):
        validate_signal_batch(_good().slice(0, 0))


def test_missing_column():
    with pytest.raises(SignalValidationError, match="Missing"):
        validate_signal_batch(_good().drop_columns(["value"]))


def test_datetime_rejected():
    t = _good().set_column(
        1, "ts_us", pa.array([1, 2, 3], pa.timestamp("us"))
    )
    with pytest.raises(SignalValidationError, match="timestamp"):
        validate_signal_batch(t)


def test_boolean_rejected():
    t = _good().set_column(2, "value", pa.array([True, False, True]))
    with pytest.raises(SignalValidationError, match="boolean"):
        validate_signal_batch(t)


def test_non_numeric_rejected():
    t = _good().set_column(2, "value", pa.array(["x", "y", "z"]))
    with pytest.raises(SignalValidationError, match="numeric"):
        validate_signal_batch(t)


def test_nan_and_inf_rejected():
    t = _good().set_column(2, "value", pa.array([0.1, np.nan, 0.3]))
    with pytest.raises(SignalValidationError, match="NaN"):
        validate_signal_batch(t)
    t = _good().set_column(2, "value", pa.array([0.1, np.inf, 0.3]))
    with pytest.raises(SignalValidationError, match="NaN or infinite"):
        validate_signal_batch(t)
    t = _good().set_column(1, "ts_us", pa.array([1, None, 3], pa.int64()))
    with pytest.raises(SignalValidationError, match="nulls"):
        validate_signal_batch(t)


def test_as_dataset_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(_good()).map_batches(
        make_validator(), batch_format="pyarrow"
    )
    assert ds.count() == 3
    bad = rd.from_arrow(
        _good().set_column(2, "value", pa.array([0.1, np.nan, 0.3]))
    ).map_batches(make_validator(), batch_format="pyarrow")
    with pytest.raises(Exception, match="NaN"):
        bad.materialize()
