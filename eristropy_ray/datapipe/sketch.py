"""Cardinality sketches for distributed distinct-count aggregates.

HyperLogLog (Flajolet, Fusy, Gandouet, Meunier — AofA 2007) with the
small-range linear-counting correction from the paper (§4): 2^p byte
registers, rank = leading-zero count of the suffix. Registers merge by
elementwise max, so the sketch is a commutative monoid — each Ray batch
builds a partial register array and any tree/groupby combine order gives
the identical final estimate (deterministic: the value hash is seeded
splitmix64, never Python's salted ``hash``).

Scale shape: a batch of N values reduces to one 2^p-byte row, so the
shuffle that follows moves kilobytes per batch regardless of input size.
"""

from __future__ import annotations

import numpy as np

_P_DEFAULT = 12  # 4096 registers; ~1.04/sqrt(m) -> ~1.6% standard error


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint64, copy=True)
    x += np.uint64(0x9E3779B97F4A7C15)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def hll_partial(values: np.ndarray, p: int = _P_DEFAULT) -> np.ndarray:
    """Register array (uint8, length 2^p) for one batch of int64 values."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if values.size == 0:
        return regs
    h = _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    suffix = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # exact vectorized count-leading-zeros (binary descent, no float
    # rounding: a frexp-based log2 undercounts near 2^k boundaries)
    v = suffix.copy()
    lz = np.zeros(h.size, dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        lt = v < (np.uint64(1) << np.uint64(64 - s))
        lz[lt] += s
        v[lt] <<= np.uint64(s)
    lz = np.where(suffix == 0, np.uint8(64 - p), np.minimum(lz, 64 - p))
    rank = lz.astype(np.uint8) + 1
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    """Elementwise-max merge (commutative, associative, idempotent)."""
    out = parts[0].copy()
    for r in parts[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the paper's small/large-range corrections."""
    m = regs.size
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int((regs == 0).sum())
        if zeros:
            return m * float(np.log(m / zeros))
    # the paper's large-range correction is for 32-bit hashes; this
    # sketch hashes 64 bits (no 2^32 saturation), where applying it
    # would bias estimates above ~143M and blow up past 2^32
    return float(est)


def mg_summary(
    items: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Misra-Gries reduction of (item, count) to at most ``k`` entries.

    Misra & Gries 1982 / the SpaceSaving family (Agarwal et al., PODS'12
    "Mergeable Summaries"): keep the k largest, subtract the (k+1)-th
    largest count from the survivors, drop the rest. Each reduction
    undercounts every item by at most the subtracted value; across a
    merge tree the total undercount of any item is bounded by n/k of the
    TOTAL stream (mergeability theorem), independent of tree shape."""
    if items.size <= k:
        return items, counts.astype(np.int64)
    order = np.argsort(-counts, kind="stable")
    kept = order[:k]
    sub = int(counts[order[k]])
    new_counts = counts[kept].astype(np.int64) - sub
    pos = new_counts > 0
    return items[kept][pos], new_counts[pos]


def mg_merge(
    parts: list[tuple[np.ndarray, np.ndarray]], k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Merge MG summaries: sum counts per item, then reduce to k."""
    items = np.concatenate([p[0] for p in parts])
    counts = np.concatenate([p[1] for p in parts])
    uniq, inv = np.unique(items, return_inverse=True)
    summed = np.zeros(uniq.size, dtype=np.int64)
    np.add.at(summed, inv, counts)
    return mg_summary(uniq, summed, k)


def bloom_build(values: np.ndarray, m_bits: int, n_hashes: int = 4) -> np.ndarray:
    """Bloom filter (uint8 bit array, length m_bits/8) over int64 values.

    Kirsch-Mitzenmacher double hashing: h_i = h1 + i*h2 gives the
    classic k-hash false-positive behavior from two 64-bit hashes.
    Filters merge by bitwise OR (commutative monoid), so per-batch
    partials combine in any order — the semi-join build side reduces to
    one m/8-byte row per batch regardless of row count."""
    if m_bits % 8:
        raise ValueError(f"m_bits must be a multiple of 8, got {m_bits}")
    bits = np.zeros(m_bits // 8, dtype=np.uint8)
    if values.size == 0:
        return bits
    h = _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    h2 = _splitmix64(h) | np.uint64(1)  # odd: full cycle mod 2^64
    for i in range(n_hashes):
        pos = ((h + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        np.bitwise_or.at(bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
    return bits


def bloom_contains(
    bits: np.ndarray, values: np.ndarray, n_hashes: int = 4
) -> np.ndarray:
    """Vectorized membership mask (no false negatives; FP rate ~
    (1 - e^(-kn/m))^k)."""
    m_bits = bits.size * 8
    if values.size == 0:
        return np.zeros(0, dtype=bool)
    h = _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    h2 = _splitmix64(h) | np.uint64(1)
    out = np.ones(values.size, dtype=bool)
    for i in range(n_hashes):
        pos = ((h + np.uint64(i) * h2) % np.uint64(m_bits)).astype(np.int64)
        out &= (bits[pos >> 3] >> (pos & 7) & 1).astype(bool)
    return out


# --------------------------------------------------------------- quantiles

HDR_MANTISSA_BITS = 7  # 128 sub-buckets per octave -> relative half-width 2^-8


def hdr_bucket(values: np.ndarray, m: int = HDR_MANTISSA_BITS) -> np.ndarray:
    """Log-bucket index for POSITIVE float64 values (HdrHistogram-style,
    public design): dropping the low ``52 - m`` mantissa bits of the IEEE
    representation yields an integer that is monotone in the value and
    groups it with neighbors within relative width ``2^-m``. Zeros map
    to bucket 0 (denormals share it — below any meaningful resolution);
    negatives are rejected (the engine's value columns are magnitudes —
    a signed deployment would run one histogram per sign)."""
    v = np.asarray(values, dtype=np.float64)
    if (v < 0).any():
        raise ValueError("hdr_bucket requires non-negative values")
    return v.view(np.uint64) >> np.uint64(52 - m)


def hdr_value(buckets: np.ndarray, m: int = HDR_MANTISSA_BITS) -> np.ndarray:
    """Representative value (geometric bucket midpoint): reconstruct the
    bucket's lower edge by restoring the dropped mantissa bits as zeros,
    then center by half a bucket step — the relative error of the
    estimate vs any member of the bucket is <= 2^-(m+1)."""
    lo = (np.asarray(buckets, dtype=np.uint64) << np.uint64(52 - m)).view(
        np.float64
    )
    hi = (
        (np.asarray(buckets, dtype=np.uint64) + np.uint64(1))
        << np.uint64(52 - m)
    ).view(np.float64)
    return (lo + hi) / 2.0


def hdr_partial(values: np.ndarray, m: int = HDR_MANTISSA_BITS):
    """One batch -> (bucket ids, counts): a few-hundred-row summary
    whose size is bounded by the value DISTRIBUTION (occupied buckets),
    not the row count. Merge = concatenate + sum by bucket (counts form
    a commutative monoid), so any fold tree is exact."""
    b, c = np.unique(hdr_bucket(values, m), return_counts=True)
    return b.astype(np.int64), c.astype(np.int64)


def hdr_quantiles(
    buckets: np.ndarray,
    counts: np.ndarray,
    qs: np.ndarray,
    m: int = HDR_MANTISSA_BITS,
) -> np.ndarray:
    """Quantile estimates from a merged histogram: for each q locate the
    bucket holding the rank-``ceil(q * n)`` order statistic (cumulative
    counts + searchsorted) and return its representative value — within
    relative ``2^-(m+1)`` of the true order statistic."""
    order = np.argsort(buckets)
    b, c = np.asarray(buckets)[order], np.asarray(counts)[order]
    cum = np.cumsum(c)
    n = int(cum[-1])
    ranks = np.maximum(1, np.ceil(np.asarray(qs, dtype=np.float64) * n))
    idx = np.searchsorted(cum, ranks, side="left")
    return hdr_value(b[idx], m)


def sample_key64(values: np.ndarray) -> np.ndarray:
    """Deterministic pseudo-random uint64 sampling key per int64 value
    (splitmix64 finalizer). A BIJECTION on the 64-bit domain, so
    distinct ids get distinct keys — a bottom-k over these keys is a
    uniform without-replacement sample that needs no tie-break and is
    identical across runs, block layouts and cluster sizes."""
    return _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
