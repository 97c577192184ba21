"""Deduplication operators.

- exact dedup lives in the query surface (content-hash groupby; see
  ``pipelines/queries.q_dedup_exact``).
- MinHash + LSH near-dup: word-shingle -> minhash signature -> band
  buckets -> candidate pairs -> exact Jaccard verification. The classic
  shingle->minhash->band->bucket-groupby plan: signatures are computed
  vectorized per batch, the ONLY shuffle is the tiny
  (band_id, band_hash) -> doc_id exchange, and verification re-reads just
  the candidate documents.
- SimHash near-dup: 64-bit signatures; Hamming-distance candidates found
  by banding the signature into 4 x 16-bit chunks (any pair within
  Hamming distance 3 shares at least one exact chunk — pigeonhole).
- embedding cosine near-dup: block matmul against a broadcast matrix.

All hashing is FNV-1a / splitmix-style arithmetic on uint64 — stable
across processes and Ray workers (Python's builtin str hash is salted).
"""

from __future__ import annotations

import re

import numpy as np

_WORD = re.compile(r"\S+")

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MERSENNE = (1 << 61) - 1


def _fnv1a_bytes(data: bytes) -> int:
    h = 0xCBF29CE484222325
    for b in data:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (unique, sorted)."""
    words = _WORD.findall(text)
    if len(words) < k:
        joined = " ".join(words)
        return np.array([_fnv1a_bytes(joined.encode())], dtype=np.uint64)
    hashes = np.fromiter(
        (
            _fnv1a_bytes(" ".join(words[i : i + k]).encode())
            for i in range(len(words) - k + 1)
        ),
        dtype=np.uint64,
    )
    return np.unique(hashes)


def minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.PCG64(np.random.SeedSequence([seed])))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


def minhash_signature_batch(
    texts: list[str], num_perm: int = 64, shingle_k: int = 3, seed: int = 1
) -> np.ndarray:
    """(n_docs, num_perm) signatures, vectorized over permutations."""
    a, b = minhash_params(num_perm, seed)
    a64 = a.astype(np.uint64)
    b64 = b.astype(np.uint64)
    out = np.empty((len(texts), num_perm), dtype=np.uint64)
    for i, text in enumerate(texts):
        sh = word_shingle_hashes(text, shingle_k)
        # 64-bit wraparound universal hash is stable and uniform enough
        # for minhashing; (a*h + b) with uint64 overflow semantics
        vals = a64[:, None] * sh[None, :] + b64[:, None]
        out[i] = vals.min(axis=1)
    return out


def lsh_band_keys(
    signatures: np.ndarray, n_bands: int = 16
) -> tuple[np.ndarray, np.ndarray]:
    """(band_id, band_hash) per (doc, band): hash each band's rows together."""
    n_docs, num_perm = signatures.shape
    rows = num_perm // n_bands
    bands = signatures[:, : n_bands * rows].reshape(n_docs, n_bands, rows)
    h = np.full((n_docs, n_bands), _FNV_OFFSET, dtype=np.uint64)
    for r_i in range(rows):
        h = (h ^ bands[:, :, r_i]) * _FNV_PRIME
    band_id = np.broadcast_to(np.arange(n_bands), (n_docs, n_bands))
    return band_id.reshape(-1), h.reshape(-1)


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact shingle-set Jaccard similarity (verification step)."""
    sa = word_shingle_hashes(text_a, k)
    sb = word_shingle_hashes(text_b, k)
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (Charikar 2002)."""
    words = _WORD.findall(text)
    if not words:
        return 0
    hashes = np.fromiter(
        (_fnv1a_bytes(w.encode()) for w in words), dtype=np.uint64
    )
    bits = (hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)
    votes = bits.astype(np.int64).sum(axis=0) * 2 - hashes.size
    return int(((votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_chunk_keys(sig: int, n_chunks: int = 4) -> list[tuple[int, int]]:
    """(chunk_id, chunk_value) keys; equal-chunk pairs are Hamming<=
    (n_chunks-1) candidates by pigeonhole."""
    width = 64 // n_chunks
    mask = (1 << width) - 1
    return [(c, (sig >> (c * width)) & mask) for c in range(n_chunks)]


def embedding_neardup_pairs(
    emb: np.ndarray, ids: np.ndarray, tau: float, block: int = 1024
) -> list[tuple[int, int, float]]:
    """All pairs (i < j) with cosine similarity >= tau; block matmul."""
    norms = np.sqrt((emb * emb).sum(axis=1, keepdims=True))
    unit = emb / np.maximum(norms, 1e-30)
    out = []
    n = unit.shape[0]
    for s in range(0, n, block):
        e = min(s + block, n)
        sims = unit[s:e] @ unit.T
        for ii in range(e - s):
            row = sims[ii]
            gi = s + ii
            cand = np.flatnonzero(row >= tau)
            for j in cand:
                if j > gi:
                    out.append((int(ids[gi]), int(ids[j]), float(row[j])))
    return out
