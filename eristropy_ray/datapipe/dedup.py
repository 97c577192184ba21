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

All hashing is vectorized polynomial arithmetic on uint64 (wraparound
mod 2^64) finished with a splitmix64 mixer — stable across processes and
Ray workers (Python's builtin str hash is salted), and C-speed: the only
per-byte work is numpy cumsum/cumprod, never a Python loop.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_MERSENNE = (1 << 61) - 1

# Odd multiplier (golden-ratio constant) and its modular inverse mod 2^64:
# polynomial word hashes are computed from prefix sums S_j = sum b_i P^-i,
# so hash(word[s:e]) = (S_{e-1} - S_{s-1}) * P^{e-1} — one cumsum/cumprod
# per text instead of a Python loop per byte.
_POLY_P = np.uint64(0x9E3779B97F4A7C15)
_POLY_PINV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))


def _mix64(h: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, elementwise over a uint64 array."""
    h = h.astype(np.uint64, copy=True)
    h ^= h >> np.uint64(30)
    h *= np.uint64(0xBF58476D1CE4E5B9)
    h ^= h >> np.uint64(27)
    h *= np.uint64(0x94D049BB133111EB)
    h ^= h >> np.uint64(31)
    return h


# Codepoint ranges of Python's regex-``\s`` set. This is the SINGLE
# source for the SQL oracle's word-splitter character class
# (pipelines/queries._minhash_sql); tests assert it stays in lockstep
# with the byte-level ``_whitespace_mask`` below.
WS_RANGES: list[tuple[int, int]] = [
    (0x09, 0x0D), (0x1C, 0x20), (0x85, 0x85), (0xA0, 0xA0),
    (0x1680, 0x1680), (0x2000, 0x200A), (0x2028, 0x2029),
    (0x202F, 0x202F), (0x205F, 0x205F), (0x3000, 0x3000),
]


def _whitespace_mask(arr: np.ndarray) -> np.ndarray:
    """Byte positions belonging to a Python ``\\s`` character in UTF-8.

    Covers the full regex-``\\s`` set — ASCII (0x09-0x0D, 0x1C-0x1F,
    0x20) plus the Unicode spaces NEL/NBSP (C2 85 / C2 A0), OGHAM SPACE
    (E1 9A 80), U+2000-200A, LINE/PARA SEP (U+2028/29), NNBSP (U+202F),
    MMSP (U+205F) and IDEOGRAPHIC SPACE (U+3000) — so tokenization is
    identical to the ``\\S+`` splitter this replaced (a pair differing
    only in NBSP vs space must still near-dup match)."""
    ws = (arr == 32) | ((arr >= 9) & (arr <= 13)) | ((arr >= 0x1C) & (arr <= 0x1F))
    if arr.size >= 2:
        a0, a1 = arr[:-1], arr[1:]
        two = (a0 == 0xC2) & ((a1 == 0xA0) | (a1 == 0x85))
        ws[:-1] |= two
        ws[1:] |= two
    if arr.size >= 3:
        a0, a1, a2 = arr[:-2], arr[1:-1], arr[2:]
        three = (
            ((a0 == 0xE1) & (a1 == 0x9A) & (a2 == 0x80))
            | ((a0 == 0xE2) & (a1 == 0x80)
               & (((a2 >= 0x80) & (a2 <= 0x8A)) | (a2 == 0xA8)
                  | (a2 == 0xA9) | (a2 == 0xAF)))
            | ((a0 == 0xE2) & (a1 == 0x81) & (a2 == 0x9F))
            | ((a0 == 0xE3) & (a1 == 0x80) & (a2 == 0x80))
        )
        ws[:-2] |= three
        ws[1:-1] |= three
        ws[2:] |= three
    return ws


def word_hashes(text: str) -> np.ndarray:
    """One uint64 hash per ``\\S+`` word, fully vectorized.

    Polynomial hash over the UTF-8 bytes (mod 2^64 via modular-inverse
    prefix sums), length-salted and splitmix64-mixed. Word boundaries
    come from ``_whitespace_mask`` (full Unicode ``\\s`` set).
    """
    arr = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    if arr.size == 0:
        return np.zeros(0, dtype=np.uint64)
    nonws = ~_whitespace_mask(arr)
    if not nonws.any():
        return np.zeros(0, dtype=np.uint64)
    d = np.diff(nonws.astype(np.int8))
    starts = np.flatnonzero(d == 1) + 1
    ends = np.flatnonzero(d == -1) + 1
    if nonws[0]:
        starts = np.concatenate(([0], starts))
    if nonws[-1]:
        ends = np.concatenate((ends, [arr.size]))
    n = arr.size
    ppow = np.ones(n, dtype=np.uint64)
    ppow[1:] = _POLY_P
    np.cumprod(ppow, out=ppow)  # ppow[i] = P^i
    ipow = np.ones(n, dtype=np.uint64)
    ipow[1:] = _POLY_PINV
    np.cumprod(ipow, out=ipow)  # ipow[i] = P^-i
    s_pref = np.cumsum(arr.astype(np.uint64) * ipow, dtype=np.uint64)
    pre = np.zeros(starts.size, dtype=np.uint64)
    nz = starts > 0
    pre[nz] = s_pref[starts[nz] - 1]
    h = (s_pref[ends - 1] - pre) * ppow[ends - 1]
    # length salt disambiguates words with leading NUL bytes
    return _mix64(h + (ends - starts).astype(np.uint64) * _POLY_P)


def word_shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """uint64 hashes of the k-word shingles of ``text`` (unique, sorted).

    Shingle hash = Horner combination of the k word hashes — k vectorized
    passes over the word-hash array, no per-shingle Python work.
    """
    wh = word_hashes(text)
    if wh.size < k:
        acc = np.zeros(1, dtype=np.uint64)
        for j in range(wh.size):
            acc = acc * _POLY_P + wh[j]
        return _mix64(acc + np.uint64(wh.size))
    m = wh.size - k + 1
    acc = np.zeros(m, dtype=np.uint64)
    for j in range(k):
        acc = acc * _POLY_P + wh[j : j + m]
    return np.unique(_mix64(acc))


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


def jaccard_from_hashes(sa: np.ndarray, sb: np.ndarray) -> float:
    """Exact Jaccard of two precomputed (unique, sorted) shingle-hash
    sets — the ONE definition used by ``jaccard`` and the LSH verify
    stage (empty-vs-empty is 1.0 by convention)."""
    inter = np.intersect1d(sa, sb, assume_unique=True).size
    union = sa.size + sb.size - inter
    return inter / union if union else 1.0


def jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    """Exact shingle-set Jaccard similarity (verification step)."""
    return jaccard_from_hashes(
        word_shingle_hashes(text_a, k), word_shingle_hashes(text_b, k)
    )


def simhash64(text: str) -> int:
    """64-bit SimHash over word unigrams (Charikar 2002); word hashes
    come from the vectorized polynomial hasher (multiplicity kept)."""
    hashes = word_hashes(text)
    if hashes.size == 0:
        return 0
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
