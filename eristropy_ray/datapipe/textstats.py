"""Text analysis operators: language ID, quality scoring, fingerprints.

- ``langid_scores``: stopword/character n-gram heuristic over a small set
  of languages (en/de/fr/es/it + CJK-codepoint detection). Pure python/
  pandas-vectorizable; intended to run inside ``map_batches`` with the
  compiled patterns held by an actor (see stages in pipelines/queries).
- ``winnow_fingerprints``: document fingerprinting by winnowing (Schleimer
  et al., SIGMOD 2003): rolling Rabin-Karp k-gram hashes, minimum per
  sliding window of w hashes (rightmost-min rule), deduplicated — the
  standard local fingerprint set for plagiarism/copy detection.
- ``content_hash64``: single rolling-hash digest of the whole document.
"""

from __future__ import annotations

import re

import numpy as np

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "with", "his", "her", "they", "this", "have", "not", "are"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit",
           "auf", "für", "von", "sie", "ich", "dass", "sich", "auch"},
    "fr": {"le", "la", "les", "et", "est", "une", "dans", "que", "pour",
           "pas", "des", "qui", "sur", "avec", "ce", "il", "je"},
    "es": {"el", "la", "los", "las", "es", "una", "en", "que", "por",
           "para", "con", "del", "se", "su", "como", "más", "pero"},
    "it": {"il", "la", "di", "che", "è", "una", "per", "con", "non",
           "sono", "del", "questo", "come", "anche", "ma", "gli"},
}
_WORD = re.compile(r"[^\W\d_]+", re.UNICODE)


def langid_scores(text: str) -> dict[str, float]:
    """Per-language stopword-hit fraction (plus 'zh' CJK-codepoint ratio)."""
    words = [w.lower() for w in _WORD.findall(text)]
    n = max(len(words), 1)
    scores = {
        lang: sum(w in sw for w in words) / n for lang, sw in _STOPWORDS.items()
    }
    n_chars = max(len(text), 1)
    cjk = sum(1 for ch in text if 0x4E00 <= ord(ch) <= 0x9FFF)
    scores["zh"] = cjk / n_chars
    return scores


def langid_predict(text: str, min_score: float = 0.02) -> str:
    scores = langid_scores(text)
    lang = max(sorted(scores), key=lambda k: scores[k])
    return lang if scores[lang] >= min_score else "unknown"


_RK_BASE = np.uint64(1_000_003)  # odd, so invertible mod 2^64
_RK_BINV = np.uint64(pow(1_000_003, -1, 1 << 64))


def rolling_kgram_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rabin-Karp rolling hashes of all k-grams (codepoint-level).

    Vectorized via modular-inverse prefix sums mod 2^64: with
    S_j = sum c_i B^-i, hash of window [j, j+k) is
    (S_{j+k-1} - S_{j-1}) * B^{j+k-1} — one cumsum/cumprod per doc,
    no per-position Python loop.
    """
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.uint64
    )
    n = codes.size
    if n < k:
        return np.zeros(0, dtype=np.uint64)
    ppow = np.ones(n, dtype=np.uint64)
    ppow[1:] = _RK_BASE
    np.cumprod(ppow, out=ppow)
    ipow = np.ones(n, dtype=np.uint64)
    ipow[1:] = _RK_BINV
    np.cumprod(ipow, out=ipow)
    s_pref = np.cumsum(codes * ipow, dtype=np.uint64)
    pre = np.concatenate(([np.uint64(0)], s_pref[: n - k]))
    return (s_pref[k - 1 :] - pre) * ppow[k - 1 :]


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> np.ndarray:
    """Winnowing fingerprint set: per window of w consecutive k-gram
    hashes keep the minimum (rightmost on ties), dedupe consecutive."""
    h = rolling_kgram_hashes(text, k)
    if h.size == 0:
        return h
    if h.size <= w:
        return np.unique(h.min(keepdims=True))
    from numpy.lib.stride_tricks import sliding_window_view

    windows = sliding_window_view(h, w)
    rev_arg = w - 1 - np.argmin(windows[:, ::-1], axis=1)  # rightmost min
    picks = windows[np.arange(windows.shape[0]), rev_arg]
    keep = np.empty(picks.size, dtype=bool)
    keep[0] = True
    keep[1:] = picks[1:] != picks[:-1]
    return np.unique(picks[keep])


def content_hash64(text: str) -> int:
    """Whole-document rolling hash digest (order-sensitive); vectorized
    dot product against the reversed power ladder mod 2^64."""
    b = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
    n = b.size
    if n == 0:
        return 0
    ppow = np.ones(n, dtype=np.uint64)
    ppow[1:] = _RK_BASE
    np.cumprod(ppow, out=ppow)
    return int((b * ppow[::-1]).sum(dtype=np.uint64))
