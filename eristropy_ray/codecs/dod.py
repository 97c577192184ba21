"""Delta-of-delta timestamp codec (Pelkonen et al., VLDB 2015, §4.1.1).

Encodes an int64 timestamp stream (microseconds here; the paper uses
seconds) as first value + first delta + delta-of-deltas D with the paper's
variable-length buckets, extended with a 64-bit escape because microsecond
deltas exceed the paper's 32-bit bucket:

    D == 0                  -> '0'
    D in [-63, 64]          -> '10'  + 7 bits
    D in [-255, 256]        -> '110' + 9 bits
    D in [-2047, 2048]      -> '1110' + 12 bits
    D in [-2^31, 2^31-1]    -> '11110' + 32 bits
    otherwise               -> '11111' + 64 bits

Values in buckets are stored offset (zigzag-free, like the paper: D + bias
with bias = bucket_max so e.g. [-63, 64] maps onto [1, 127]). Header:
uint32 count, int64 first timestamp, int64 first delta (when n >= 2).

Rollup bucket timestamps are regular after gap-fill, so almost every point
costs one bit.
"""

from __future__ import annotations

import numpy as np

from eristropy_ray.codecs.bits import BitReader, BitWriter

_BUCKETS = (
    (64, 0b10, 2, 7),
    (256, 0b110, 3, 9),
    (2048, 0b1110, 4, 12),
    (1 << 31, 0b11110, 5, 32),
)


def dod_encode(ts: np.ndarray) -> bytes:
    t = np.ascontiguousarray(ts, dtype=np.int64)
    n = t.size
    header = n.to_bytes(4, "big")
    if n == 0:
        return header
    header += int(t[0]).to_bytes(8, "big", signed=True)
    if n == 1:
        return header
    deltas = np.diff(t)
    header += int(deltas[0]).to_bytes(8, "big", signed=True)
    out = BitWriter()
    dods = np.diff(deltas)
    for dod in dods.tolist():
        if dod == 0:
            out.write(0, 1)
            continue
        for hi, prefix, plen, vbits in _BUCKETS:
            if -hi < dod <= hi:
                out.write(prefix, plen)
                out.write(dod + hi - 1, vbits)
                break
        else:
            out.write(0b11111, 5)
            out.write(dod & ((1 << 64) - 1), 64)
    return header + out.getvalue()


def dod_decode(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:4], "big")
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    out[0] = int.from_bytes(data[4:12], "big", signed=True)
    if n == 1:
        return out
    delta = int.from_bytes(data[12:20], "big", signed=True)
    out[1] = out[0] + delta
    reader = BitReader(data[20:])
    for i in range(2, n):
        if reader.read(1) == 0:
            out[i] = out[i - 1] + delta
            continue
        for hi, _prefix, plen, vbits in _BUCKETS:
            if reader.read(1) == 0:
                dod = reader.read(vbits) - hi + 1
                break
        else:
            raw = reader.read(64)
            dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        delta += dod
        out[i] = out[i - 1] + delta
    return out
