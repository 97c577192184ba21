"""Delta-of-delta timestamp codec (Pelkonen et al., VLDB 2015, §4.1.1).

Encodes an int64 timestamp stream (microseconds here; the paper uses
seconds) as first value + first delta + delta-of-deltas D with the paper's
variable-length buckets, extended with a 64-bit escape because microsecond
deltas exceed the paper's 32-bit bucket:

    D == 0                  -> '0'
    D in (-64, 64]          -> '10'  + 7 bits
    D in (-256, 256]        -> '110' + 9 bits
    D in (-2048, 2048]      -> '1110' + 12 bits
    D in (-2^31, 2^31]      -> '11110' + 32 bits
    otherwise               -> '11111' + 64 bits

All delta arithmetic is performed modulo 2^64 (two's complement), so the
codec round-trips EVERY int64 stream bit-exactly — including pathological
jumps whose deltas overflow a signed 64-bit difference (verified by
hypothesis in tests/test_codecs_property.py). Values in buckets are
stored offset (D + bucket_max - 1, like the paper). Header: uint32 count,
int64 first timestamp, int64 first (wrapped) delta when n >= 2.

Rollup bucket timestamps are regular after gap-fill, so almost every
point costs one bit.
"""

from __future__ import annotations

import numpy as np

from eristropy_ray.codecs.bits import BitReader

_BUCKETS = (
    (64, 0b10, 2, 7),
    (256, 0b110, 3, 9),
    (2048, 0b1110, 4, 12),
    (1 << 31, 0b11110, 5, 32),
)
_M64 = (1 << 64) - 1


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def dod_encode(ts: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    header = n.to_bytes(4, "big")
    if n == 0:
        return header
    header += int(t[0]).to_bytes(8, "big", signed=True)
    if n == 1:
        return header
    u = t.view(np.uint64)
    deltas = np.subtract(u[1:], u[:-1])  # uint64 wraparound
    header += int(deltas[0] & np.uint64(_M64)).to_bytes(8, "big")
    # local big-int accumulator == inlined BitWriter (same bytes, no
    # per-write method call; see codecs/gorilla.py)
    acc = 0
    nbits = 0
    dods = np.subtract(deltas[1:], deltas[:-1])  # wraparound again
    for dod_u in dods.tolist():
        dod = _to_signed(dod_u)
        if dod == 0:
            acc <<= 1
            nbits += 1
            continue
        for hi, prefix, plen, vbits in _BUCKETS:
            if -hi < dod <= hi:
                acc = (acc << plen) | prefix
                acc = (acc << vbits) | (dod + hi - 1)
                nbits += plen + vbits
                break
        else:
            acc = (acc << 5) | 0b11111
            acc = (acc << 64) | dod_u
            nbits += 69
    pad = (-nbits) % 8
    tail = (acc << pad).to_bytes((nbits + pad) // 8, "big") if nbits else b""
    return header + tail


def dod_decode(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:4], "big")
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    prev = int.from_bytes(data[4:12], "big", signed=True)
    out[0] = prev
    if n == 1:
        return out
    delta = int.from_bytes(data[12:20], "big")  # unsigned wrapped delta
    prev = (prev + delta) & _M64
    out[1] = _to_signed(prev)
    reader = BitReader(data[20:])
    for i in range(2, n):
        if reader.read(1) == 1:
            for hi, _prefix, plen, vbits in _BUCKETS:
                if reader.read(1) == 0:
                    dod = reader.read(vbits) - hi + 1
                    break
            else:
                dod = reader.read(64)
            delta = (delta + dod) & _M64
        prev = (prev + delta) & _M64
        out[i] = _to_signed(prev)
    return out
