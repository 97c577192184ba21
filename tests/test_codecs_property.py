"""Property-based codec round-trips (hypothesis): any float64 stream —
including NaN payload bits, infinities, subnormals — and any int64
timestamp stream must round-trip bit-exactly."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from eristropy_ray.codecs.dod import dod_decode, dod_encode
from eristropy_ray.codecs.gorilla import gorilla_decode, gorilla_encode

finite_or_special = st.one_of(
    st.floats(allow_nan=True, allow_infinity=True, width=64),
    st.floats(min_value=-1e-300, max_value=1e-300),  # subnormal territory
)


@settings(max_examples=200, deadline=None)
@given(st.lists(finite_or_special, max_size=120))
def test_gorilla_roundtrip_any_floats(vals):
    v = np.array(vals, dtype=np.float64)
    got = gorilla_decode(gorilla_encode(v))
    np.testing.assert_array_equal(v.view(np.uint64), got.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.integers(min_value=-(2**62), max_value=2**62 - 1), max_size=100
    )
)
def test_dod_roundtrip_any_timestamps(ts):
    # deltas/dods overflow-safe within +-2^62 inputs
    t = np.array(ts, dtype=np.int64)
    got = dod_decode(dod_encode(t))
    np.testing.assert_array_equal(t, got)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**40),
    st.lists(st.integers(min_value=1, max_value=10**9), min_size=1, max_size=80),
)
def test_dod_monotone_streams(start, deltas):
    t = start + np.cumsum(np.array([0, *deltas], dtype=np.int64))
    got = dod_decode(dod_encode(t))
    np.testing.assert_array_equal(t, got)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(1, 12),
    w=st.integers(1, 12),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
def test_png_roundtrip_property(h, w, ch, seed):
    """decode(encode(px)) == px for arbitrary shapes, channels and
    per-row filter choices (the filter list cycles over the rows)."""
    import numpy as np

    from eristropy_ray.datapipe.media import decode_png, encode_png

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    filters = rng.integers(0, 5, size=min(h, 5)).tolist()
    np.testing.assert_array_equal(decode_png(encode_png(px, filters)), px)


@settings(max_examples=150, deadline=None)
@given(
    n=st.integers(1, 40),
    step=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
    nan_frac=st.floats(0.0, 0.9),
)
def test_gapfill_property(n, step, seed, nan_frac):
    """For any sparse observed set: the grid spans first..last at the
    tier step; observed points are preserved bit-exactly (NaN included);
    filled points exist exactly strictly-inside the finite-anchor range
    and each equals np.interp at its bucket; nothing extrapolates."""
    import numpy as np

    from eristropy_ray.codecs.gapfill import gapfill_series

    rng = np.random.default_rng(seed)
    # sorted unique buckets on the step lattice (gap-fill contract)
    offs = np.sort(rng.choice(np.arange(200), size=n, replace=False))
    b = (1_000 + offs * step).astype(np.int64)
    v = rng.normal(size=n)
    v[rng.random(n) < nan_frac] = np.nan

    grid, filled, observed = gapfill_series(b, v, step)

    np.testing.assert_array_equal(
        grid, np.arange(b[0], b[-1] + step, step, dtype=np.int64)
    )
    # observed mask marks exactly the input buckets, values bit-preserved
    np.testing.assert_array_equal(grid[observed], b)
    np.testing.assert_array_equal(filled[observed], v)

    finite = np.isfinite(v)
    missing = ~observed
    if finite.sum() >= 2:
        lo, hi = b[finite][0], b[finite][-1]
        inside = missing & (grid >= lo) & (grid <= hi)
        expect = np.interp(
            grid[inside].astype(np.float64),
            b[finite].astype(np.float64),
            v[finite],
        )
        np.testing.assert_array_equal(filled[inside], expect)
        assert np.all(np.isnan(filled[missing & ~inside]))
    else:
        # fewer than two anchors: nothing may be invented
        assert np.all(np.isnan(filled[missing]))
