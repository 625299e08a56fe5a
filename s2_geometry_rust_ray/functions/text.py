"""Text-analysis kernels for the documents table (large-scale training-data
pipeline ops): token counting, quality scoring, language-ID heuristic,
document fingerprinting, shingling for MinHash.

Vectorization: pandas string kernels / numpy; regexes compiled at module
import (once per worker process).  Where a DuckDB oracle exists the kernel
restricts itself to operations with identical semantics in both engines
(ASCII regex token split, integer hashing via md5 prefixes).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = re.compile(r"[A-Za-z0-9]+")
# DuckDB twin: regexp_extract_all(text, '[A-Za-z0-9]+')

STOPWORDS = frozenset(
    "the of and a to in is it you that he was for on are as with his they at".split()
)


def token_count(texts: pd.Series) -> np.ndarray:
    """Number of [A-Za-z0-9]+ tokens (oracle: len(regexp_extract_all(...)))."""
    return texts.str.count(TOKEN_RE).to_numpy(dtype=np.int64)


def char_count(texts: pd.Series) -> np.ndarray:
    return texts.str.len().to_numpy(dtype=np.int64)


def quality_score(texts: pd.Series) -> np.ndarray:
    """Heuristic quality in [0,1]: penalize very short docs, high punct
    ratio, low stopword ratio (rows-only check; not SQL-mirrored)."""
    n = texts.str.len().to_numpy(dtype=np.float64)
    n = np.maximum(n, 1.0)
    punct = texts.str.count(r"[^\w\s]").to_numpy(dtype=np.float64)
    words = texts.str.findall(TOKEN_RE)
    stop = words.map(lambda ws: sum(1 for w in ws if w.lower() in STOPWORDS)).to_numpy(
        dtype=np.float64
    )
    nw = np.maximum(words.str.len().to_numpy(dtype=np.float64), 1.0)
    len_score = np.clip(n / 200.0, 0.0, 1.0)
    punct_score = 1.0 - np.clip(punct / n * 4.0, 0.0, 1.0)
    stop_score = np.clip(stop / nw * 4.0, 0.0, 1.0)
    return (len_score + punct_score + stop_score) / 3.0


_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to "],
    "de": [" der ", " und ", " die ", " ist "],
    "fr": [" le ", " la ", " et ", " les "],
    "es": [" el ", " de la ", " que ", " los "],
}


def lang_id(texts: pd.Series) -> np.ndarray:
    """Marker-n-gram language guess; 'und' (undetermined) when no marker
    hits.  Deterministic; rows-only check."""
    low = (" " + texts.str.lower() + " ").fillna("")
    scores = {}
    for lang, markers in _LANG_MARKERS.items():
        s = np.zeros(len(texts), dtype=np.int64)
        for m in markers:
            s += low.str.count(re.escape(m)).to_numpy(dtype=np.int64)
        scores[lang] = s
    mat = np.stack(list(scores.values()))
    best = np.argmax(mat, axis=0)
    hit = mat.max(axis=0) > 0
    langs = np.array(list(scores.keys()), dtype=object)
    return np.where(hit, langs[best], "und")


def md5_hash64(texts: pd.Series) -> np.ndarray:
    """First 16 hex chars of md5 as uint64-compatible int64 (wraps).
    Oracle twin: ('0x' || substr(md5(text),1,16))::UBIGINT::BIGINT."""
    out = np.empty(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        out[i] = int(hashlib.md5(str(t).encode("utf-8")).hexdigest()[:16], 16)
    return out.view(np.int64)


def fingerprint(texts: pd.Series, window: int = 8) -> np.ndarray:
    """Winnowing-style document fingerprint: min of rolling hashes of
    character windows (rows-only check)."""
    out = np.empty(len(texts), dtype=np.int64)
    B = np.uint64(1000003)
    for i, t in enumerate(texts):
        b = str(t).encode("utf-8")
        if len(b) < window:
            out[i] = md5_hash64(pd.Series([t]))[0]
            continue
        arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
        h = np.zeros(len(arr) - window + 1, dtype=np.uint64)
        acc = np.uint64(0)
        pw = B ** np.uint64(window - 1)
        for j in range(window):
            acc = acc * B + arr[j]
        h[0] = acc
        for j in range(1, len(h)):
            acc = (acc - arr[j - 1] * pw) * B + arr[j + window - 1]
            h[j] = acc
        out[i] = np.int64(h.min().astype(np.int64))
    return out


def shingles(text: str, k: int = 5) -> set[str]:
    """Word k-shingles (lowercased token windows)."""
    toks = [t.lower() for t in TOKEN_RE.findall(text)]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_signature(text: str, num_hashes: int = 32, k: int = 5) -> np.ndarray:
    """MinHash over md5-hashed shingles: permutation h_i = md5(f"{i}|{s}")
    (md5-based so a DuckDB oracle can reproduce it exactly)."""
    sh = shingles(text, k)
    sig = np.full(num_hashes, np.iinfo(np.uint64).max, dtype=np.uint64)
    if not sh:
        return sig.view(np.int64)
    for s in sh:
        for i in range(num_hashes):
            h = int(hashlib.md5(f"{i}|{s}".encode("utf-8")).hexdigest()[:16], 16)
            if h < sig[i]:
                sig[i] = h
    return sig.view(np.int64)


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))
