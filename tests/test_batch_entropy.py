"""Batched padded kernels vs the scalar kernels — element-wise exact."""

import math

import numpy as np

from eristropy_ray.kernels.batch_entropy import (
    gather_padded,
    masked_radius,
    permen_padded,
    sampen_padded,
)
from eristropy_ray.kernels.permen import permen
from eristropy_ray.kernels.sampen import sampen


def _ragged_windows(rng, W, max_len, min_len=1):
    lengths = rng.integers(min_len, max_len + 1, size=W)
    v = rng.normal(size=int(lengths.sum()))
    starts = np.zeros(W, dtype=np.int64)
    np.cumsum(lengths[:-1], out=starts[1:])
    return v, starts, lengths


def test_sampen_padded_exact(rng):
    for m in (1, 2, 3):
        v, starts, lengths = _ragged_windows(rng, 200, 40)
        L = int(lengths.max())
        P = gather_padded(v, starts, lengths, L)
        r = rng.uniform(0.1, 1.0, size=200)
        got = sampen_padded(P, lengths, m, r)
        for w in range(200):
            x = v[starts[w] : starts[w] + lengths[w]]
            want = sampen(x, m, r[w])
            assert (math.isnan(want) and math.isnan(got[w])) or want == got[w]


def test_permen_padded_exact(rng):
    for order in (2, 3, 4):
        v, starts, lengths = _ragged_windows(rng, 150, 30)
        L = int(lengths.max())
        P = gather_padded(v, starts, lengths, L)
        got = permen_padded(P, lengths, order=order)
        for w in range(150):
            x = v[starts[w] : starts[w] + lengths[w]]
            want = permen(x, order=order)
            assert (math.isnan(want) and math.isnan(got[w])) or want == got[w]


def test_padded_with_ties_and_constants(rng):
    # ties exercise stable argsort; constant windows exercise r=1.0
    vals = np.concatenate([np.zeros(10), np.array([1.0, 1.0, 2.0, 2.0, 0.5])])
    lengths = np.array([10, 5])
    starts = np.array([0, 10])
    P = gather_padded(vals, starts, lengths, 10)
    r = masked_radius(P, lengths, 0.2)
    assert r[0] == 1.0  # constant window
    s = sampen_padded(P, lengths, 2, r)
    assert s[0] == 0.0
    pe = permen_padded(P, lengths, order=3)
    assert pe[0] == 0.0
    assert pe[1] == permen(vals[10:15], order=3)


def test_chunking_boundary(rng, monkeypatch):
    import eristropy_ray.kernels.batch_entropy as be

    monkeypatch.setattr(be, "_CHUNK_ELEMS", 1000)  # force many tiny chunks
    v, starts, lengths = _ragged_windows(rng, 64, 20, min_len=4)
    L = int(lengths.max())
    P = gather_padded(v, starts, lengths, L)
    r = np.full(64, 0.4)
    got = be.sampen_padded(P, lengths, 2, r)
    for w in (0, 13, 63):
        x = v[starts[w] : starts[w] + lengths[w]]
        want = sampen(x, 2, 0.4)
        assert (math.isnan(want) and math.isnan(got[w])) or want == got[w]


def test_masked_radius_matches_moment_formula(rng):
    v, starts, lengths = _ragged_windows(rng, 50, 25, min_len=2)
    P = gather_padded(v, starts, lengths, int(lengths.max()))
    r = masked_radius(P, lengths, 0.2)
    assert (r > 0).all()


def test_padded_kernels_hypothesis():
    """Property form of the exactness contract: ANY ragged float windows
    with ANY positive radii produce bit-identical results to the scalar
    kernels."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.lists(
                st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
                min_size=1,
                max_size=24,
            ),
            min_size=1,
            max_size=12,
        ),
        st.floats(min_value=1e-6, max_value=10.0),
        st.integers(min_value=1, max_value=3),
    )
    def inner(windows, r_val, m):
        lengths = np.array([len(w) for w in windows])
        v = np.concatenate([np.asarray(w, dtype=np.float64) for w in windows])
        starts = np.zeros(lengths.size, dtype=np.int64)
        np.cumsum(lengths[:-1], out=starts[1:])
        P = gather_padded(v, starts, lengths, int(lengths.max()))
        r = np.full(lengths.size, r_val)
        got_s = sampen_padded(P, lengths, m, r)
        got_p = permen_padded(P, lengths, order=3)
        for w in range(lengths.size):
            x = v[starts[w] : starts[w] + lengths[w]]
            want_s = sampen(x, m, r_val)
            want_p = permen(x, order=3)
            assert (math.isnan(want_s) and math.isnan(got_s[w])) or want_s == got_s[w]
            assert (math.isnan(want_p) and math.isnan(got_p[w])) or want_p == got_p[w]

    inner()
