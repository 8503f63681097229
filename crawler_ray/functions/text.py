"""Text-analysis scalar/vectorized functions (training-data pipeline suite).

New design (the reference has no text analytics); built to run vectorized
inside ``map_batches`` over the ``documents`` table
(/root/testdata/sf*/documents.parquet: doc_id, text, lang, source, n_chars).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"\S+")
# BPE-ish subword splitter: words, numbers, or single non-space symbols
BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
PUNCT_RE = re.compile(r"[^\w\s]")

STOPWORDS_EN = frozenset(
    "the a an and or of to in is are was were be been it this that for on with as at by from".split()
)

# tiny character/stopword profiles for the n-gram language-ID heuristic
_LANG_MARKERS = {
    "en": frozenset("the and of to in is you that it for".split()),
    "es": frozenset("el la de que y en los del se las".split()),
    "fr": frozenset("le la de et les des en du un une".split()),
    "de": frozenset("der die und den das von zu mit sich des".split()),
}


def token_count(texts: pd.Series) -> np.ndarray:
    """Whitespace token count per document (vectorized)."""
    return texts.str.count(TOKEN_RE).to_numpy(dtype=np.int64)


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish token count: words + numbers + individual symbols."""
    return texts.str.count(BPE_RE).to_numpy(dtype=np.int64)


def quality_features(texts: pd.Series) -> dict[str, np.ndarray]:
    """Length / punctuation-ratio / stopword-ratio quality features."""
    n_chars = texts.str.len().to_numpy(dtype=np.int64)
    n_tokens = token_count(texts)
    n_punct = texts.str.count(PUNCT_RE).to_numpy(dtype=np.int64)
    stop = np.array(
        [
            sum(1 for t in TOKEN_RE.findall(txt.lower()) if t in STOPWORDS_EN)
            for txt in texts
        ],
        dtype=np.int64,
    )
    denom_c = np.maximum(n_chars, 1)
    denom_t = np.maximum(n_tokens, 1)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": n_punct / denom_c,
        "stopword_ratio": stop / denom_t,
        "mean_token_len": (n_chars - (n_tokens - 1).clip(min=0)) / denom_t,
    }


def quality_score(texts: pd.Series) -> np.ndarray:
    """Composite [0,1] quality score: rewards mid-length docs, moderate
    punctuation, presence of stopwords (prose-ness). Deterministic."""
    f = quality_features(texts)
    len_score = np.clip(f["n_tokens"] / 64.0, 0.0, 1.0)
    punct_score = 1.0 - np.clip(f["punct_ratio"] * 5.0, 0.0, 1.0)
    stop_score = np.clip(f["stopword_ratio"] * 4.0, 0.0, 1.0)
    return (0.4 * len_score + 0.3 * punct_score + 0.3 * stop_score).astype(np.float64)


def detect_lang(text: str) -> str:
    """Marker-word language-ID heuristic: the language whose stopword set has
    the most hits; ties break alphabetically; 'unk' when nothing matches."""
    toks = [t for t in TOKEN_RE.findall(text.lower())][:200]
    if not toks:
        return "unk"
    best_lang, best = "unk", 0
    for lang in sorted(_LANG_MARKERS):
        hits = sum(1 for t in toks if t in _LANG_MARKERS[lang])
        if hits > best:
            best_lang, best = lang, hits
    return best_lang


def char_ngrams(text: str, n: int = 3) -> set[str]:
    """Character n-gram shingles (lowercased) — the Jaccard / MinHash unit."""
    t = text.lower()
    if len(t) < n:
        return {t} if t else set()
    return {t[i : i + n] for i in range(len(t) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0
