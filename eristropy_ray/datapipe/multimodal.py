"""Multimodal binary-column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata. The Ray-side shape is real and tested — schema, actor-pool
signature, small batch sizes for wide rows, output layout — while the
actual media decoding is STUBBED: no image/audio libraries exist in this
container, so ``decode`` raises ``NotImplementedError`` unless a
deterministic fake feature extractor is requested.

Usage:
    ds.map_batches(BinaryFeatureStage(extractor="fake"),
                   batch_format="pyarrow",
                   batch_size=256,          # small: payload rows are wide
                   concurrency=8, num_cpus=1)

Format sniffing (magic bytes) is real; the fake extractor hashes payload
bytes into a fixed-dim float vector (stable across workers), standing in
for a model embedding so downstream similarity/dedup stages can be tested
end-to-end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),  # wav/avi container
    (b"fLaC", "flac"),
    (b"OggS", "ogg"),
    (b"\x00\x00\x00", "mp4?"),
]


def sniff_format(payload: bytes) -> str:
    for magic, name in _MAGIC:
        if payload.startswith(magic):
            return name
    return "unknown"


def fake_embedding(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic payload-derived vector (stands in for a model)."""
    h = np.uint64(0xCBF29CE484222325)
    out = np.empty(dim, dtype=np.float64)
    step = max(len(payload) // 64, 1)
    for d in range(dim):
        acc = int(h) + d * 0x9E3779B97F4A7C15
        for b in payload[d::step][:64]:
            acc = ((acc ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
        out[d] = (acc % 10_000_019) / 10_000_019
    return out


class BinaryFeatureStage:
    """Actor-pool map_batches stage over a binary payload column.

    Setup (per actor, once): choose the extractor. ``extractor="fake"``
    uses the deterministic hash embedding; ``extractor="real"`` is the
    stub for an actual decoder and raises ``NotImplementedError`` at call
    time (the container has no media libraries)."""

    def __init__(
        self, payload_col: str = "payload", extractor: str = "fake", dim: int = 8
    ) -> None:
        self.payload_col = payload_col
        self.extractor = extractor
        self.dim = dim
        if extractor not in ("fake", "real"):
            raise ValueError("extractor must be 'fake' or 'real'")

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.extractor == "real":
            raise NotImplementedError(
                "media decoding requires image/audio libraries not present "
                "in this environment; use extractor='fake' for the "
                "deterministic stand-in"
            )
        payloads = batch[self.payload_col].to_pylist()
        fmts = [sniff_format(p or b"") for p in payloads]
        sizes = [len(p or b"") for p in payloads]
        embs = np.stack([fake_embedding(p or b"", self.dim) for p in payloads])
        cols = {
            name: batch[name]
            for name in batch.column_names
            if name != self.payload_col
        }
        cols["format"] = pa.array(fmts, pa.string())
        cols["n_bytes"] = pa.array(sizes, pa.int64())
        cols["embedding"] = pa.array(list(embs), pa.list_(pa.float64()))
        return pa.table(cols)


class FrameSampleStage:
    """Actor-pool 1->N frame-sampling stage for video-ish payloads.

    Emits one row per (item, frame_idx): evenly spaced frames, the
    standard pre-processing shape for video training data. The actual
    decoder is STUBBED (``decoder="real"`` raises — no media libraries
    in this container); ``decoder="fake"`` slices deterministic
    fixed-size byte windows out of the payload so the 1->N explode, the
    binary frame column, and downstream batch sizing are all exercised
    for real.

    Usage:
        ds.map_batches(FrameSampleStage(n_frames=4),
                       batch_format="pyarrow", batch_size=64,
                       concurrency=8, num_cpus=1)
    """

    def __init__(
        self,
        payload_col: str = "payload",
        n_frames: int = 4,
        frame_bytes: int = 64,
        decoder: str = "fake",
    ) -> None:
        if decoder not in ("fake", "real"):
            raise ValueError("decoder must be 'fake' or 'real'")
        self.payload_col = payload_col
        self.n_frames = n_frames
        self.frame_bytes = frame_bytes
        self.decoder = decoder

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.decoder == "real":
            raise NotImplementedError(
                "video decoding requires media libraries not present in "
                "this environment; use decoder='fake' for the deterministic "
                "byte-window stand-in"
            )
        payloads = batch[self.payload_col].to_pylist()
        n = len(payloads)
        keep = [c for c in batch.column_names if c != self.payload_col]
        frames: list[bytes] = []
        for p in payloads:
            p = p or b""
            # evenly spaced offsets over the payload (floor, stable)
            for f in range(self.n_frames):
                off = (len(p) * f) // max(self.n_frames, 1)
                frames.append(p[off : off + self.frame_bytes])
        idx = pa.array(np.repeat(np.arange(n), self.n_frames))
        cols = {name: batch[name].take(idx) for name in keep}
        cols["frame_idx"] = pa.array(
            np.tile(np.arange(self.n_frames, dtype=np.int64), n), pa.int64()
        )
        cols["frame"] = pa.array(frames, pa.binary())
        return pa.table(cols)
