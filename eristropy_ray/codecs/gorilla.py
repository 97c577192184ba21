"""Gorilla XOR float codec (Pelkonen et al., VLDB 2015, §4.1.2).

Encodes a float64 stream by XOR-ing each value with its predecessor:

- XOR == 0            -> single '0' bit;
- XOR != 0, and its meaningful bits fit the previous (leading, length)
  window            -> '10' + meaningful bits in the previous window;
- otherwise         -> '11' + 5 bits leading-zero count + 6 bits
                       meaningful-bit length (64 stored as 0) + the bits.

The first value is stored verbatim (64 bits). NaN round-trips bit-exactly
(the canonical quiet-NaN pattern is just bits), which matters here because
short rollup windows legitimately produce NaN entropies. Leading-zero
counts are capped at 31 so they fit 5 bits (paper's practical variant).

Header layout of ``gorilla_encode``:  uint32 big-endian point count, then
the bit stream.
"""

from __future__ import annotations

import numpy as np

from eristropy_ray.codecs.bits import BitReader


def gorilla_encode(values: np.ndarray) -> bytes:
    # The bit stream is accumulated in local big-int (acc, nbits) vars —
    # the inlined form of codecs.bits.BitWriter (same bytes; the method
    # call per write was ~30% of encode time on typical ~50-point blocks).
    v = np.ascontiguousarray(values, dtype=np.float64)
    n = v.size
    header = n.to_bytes(4, "big")
    if not n:
        return header
    bits = v.view(np.uint64)
    xors = np.zeros(n, dtype=np.uint64)
    xors[0] = bits[0]
    np.bitwise_xor(bits[1:], bits[:-1], out=xors[1:])
    xl = xors.tolist()
    acc = xl[0]  # first value verbatim (64 bits)
    nbits = 64
    prev_lead, prev_len = -1, 0  # no valid previous window
    for i in range(1, n):
        x = xl[i]
        if x == 0:
            acc <<= 1
            nbits += 1
            continue
        lead = 64 - x.bit_length()
        if lead > 31:
            lead = 31
        trail = (x & -x).bit_length() - 1
        mlen = 64 - lead - trail
        if (
            prev_lead >= 0
            and lead >= prev_lead
            and trail >= 64 - prev_lead - prev_len
        ):
            # bits fit inside the previous (leading, length) window;
            # lead >= prev_lead guarantees x >> shift < 2^prev_len
            acc = (
                (acc << (2 + prev_len))
                | (0b10 << prev_len)
                | (x >> (64 - prev_lead - prev_len))
            )
            nbits += 2 + prev_len
        else:
            acc = (acc << 2) | 0b11
            acc = (acc << 5) | lead
            acc = (acc << 6) | (mlen & 0x3F)  # 64 encodes as 0
            acc = (acc << mlen) | (x >> trail)
            nbits += 13 + mlen
            prev_lead, prev_len = lead, mlen
    pad = (-nbits) % 8
    return header + ((acc << pad).to_bytes((nbits + pad) // 8, "big"))


def gorilla_decode(data: bytes) -> np.ndarray:
    n = int.from_bytes(data[:4], "big")
    reader = BitReader(data[4:])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = reader.read(64)
    out[0] = prev
    prev_lead, prev_len = -1, 0
    for i in range(1, n):
        if reader.read(1) == 0:
            out[i] = prev
            continue
        if reader.read(1) == 0:
            lead, mlen = prev_lead, prev_len
        else:
            lead = reader.read(5)
            mlen = reader.read(6) or 64
            prev_lead, prev_len = lead, mlen
        x = reader.read(mlen) << (64 - lead - mlen)
        prev ^= x
        out[i] = prev
    return out.view(np.float64)
