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


_RK_BASE = 1_000_003
_RK_MOD = (1 << 61) - 1


def rolling_kgram_hashes(text: str, k: int = 5) -> np.ndarray:
    """Rabin-Karp rolling hashes of all k-grams (codepoint-level)."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
        np.int64
    )
    n = codes.size
    if n < k:
        return np.zeros(0, dtype=np.int64)
    out = np.empty(n - k + 1, dtype=np.int64)
    h = 0
    for i in range(k):
        h = (h * _RK_BASE + int(codes[i])) % _RK_MOD
    out[0] = h
    top = pow(_RK_BASE, k - 1, _RK_MOD)
    for i in range(1, n - k + 1):
        h = ((h - int(codes[i - 1]) * top) * _RK_BASE + int(codes[i + k - 1])) % _RK_MOD
        out[i] = h
    return out


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
    """Whole-document rolling hash digest (order-sensitive)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _RK_BASE + b) % _RK_MOD
    return h
