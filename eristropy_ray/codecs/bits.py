"""Minimal MSB-first bit stream writer/reader over a Python int accumulator.

Blocks are small (<= a few thousand points per (conv_id, tier) block), so a
big-int accumulator flushed to bytes once at the end is both simple and
fast enough; the hot numeric work (XOR, leading/trailing zero counts) is
vectorized in the codecs, not here.
"""

from __future__ import annotations


class BitWriter:
    __slots__ = ("_acc", "_nbits")

    def __init__(self) -> None:
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        """Append the low ``nbits`` bits of ``value`` (MSB first)."""
        if nbits == 0:
            return
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits

    def getvalue(self) -> bytes:
        """Byte string, zero-padded to a byte boundary at the tail."""
        pad = (-self._nbits) % 8
        total = self._nbits + pad
        return (self._acc << pad).to_bytes(total // 8, "big") if total else b""

    @property
    def nbits(self) -> int:
        return self._nbits


class BitReader:
    __slots__ = ("_data", "_pos", "_nbits")

    def __init__(self, data: bytes) -> None:
        self._data = int.from_bytes(data, "big") if data else 0
        self._nbits = len(data) * 8
        self._pos = 0

    def read(self, nbits: int) -> int:
        """Next ``nbits`` bits as an unsigned int (MSB first)."""
        if nbits == 0:
            return 0
        if self._pos + nbits > self._nbits:
            raise EOFError("bit stream exhausted")
        shift = self._nbits - self._pos - nbits
        self._pos += nbits
        return (self._data >> shift) & ((1 << nbits) - 1)
