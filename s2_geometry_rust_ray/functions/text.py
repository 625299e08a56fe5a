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

TOKEN_RE = re.compile(r"[A-Za-z0-9]+", re.ASCII)
# DuckDB twin: regexp_extract_all(text, '[A-Za-z0-9]+')

STOPWORDS = frozenset(
    "the of and a to in is it you that he was for on are as with his they at".split()
)


# GPT-2-style ASCII pretokenizer (contractions, letter runs, digit runs,
# punctuation runs, whitespace) restricted to constructs with IDENTICAL
# semantics in Python re and DuckDB RE2 (no \p{}, no lookarounds —
# verified match over contraction/unicode-free corpora)
# re.ASCII: Python \s is Unicode-aware while DuckDB RE2 \s is not — the
# ASCII flag makes both engines tokenize identically on any input (the
# oracle contract otherwise silently diverges on non-ASCII text)
BPE_TOKEN_RE = re.compile(
    r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+",
    re.ASCII,
)
BPE_TOKEN_SQL = "'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+"


def bpe_token_count(texts: pd.Series) -> np.ndarray:
    """BPE-ish pretokenizer token count (oracle:
    len(regexp_extract_all(text, BPE_TOKEN_SQL)))."""
    return texts.str.count(BPE_TOKEN_RE).to_numpy(dtype=np.int64)


def token_count(texts: pd.Series) -> np.ndarray:
    """Number of [A-Za-z0-9]+ tokens (oracle: len(regexp_extract_all(...)))."""
    return texts.str.count(TOKEN_RE).to_numpy(dtype=np.int64)


def char_count(texts: pd.Series) -> np.ndarray:
    return texts.str.len().to_numpy(dtype=np.int64)


# one alternation regex == "token in STOPWORDS": a stopword counts iff not
# adjacent to another token char (exactly the [A-Za-z0-9]+ tokenization) —
# which is also how the SQL twin counts it (RE2 has no lookbehind, so the
# oracle filters regexp_extract_all tokens by stopword membership; the two
# formulations are equivalent because both boundary rules consider only
# [a-z0-9])
_STOPWORD_RE = re.compile(
    r"(?<![a-z0-9])(?:" + "|".join(sorted(STOPWORDS)) + r")(?![a-z0-9])",
    re.ASCII,
)

# ASCII \w/\s spelled out so Python and RE2 agree on every input
# (Python's un-flagged \w is Unicode-aware; RE2's \s lacks \v)
_PUNCT_RE = re.compile(r"[^A-Za-z0-9_ \t\n\r\f\v]", re.ASCII)
PUNCT_SQL = "[^A-Za-z0-9_ \\t\\n\\r\\f\\x0b]"


def quality_score(texts: pd.Series) -> np.ndarray:
    """Heuristic quality in [0,1]: penalize very short docs, high punct
    ratio, low stopword ratio.  Pure IEEE +-*/ over integer counts =>
    bit-exact SQL twin (oracle/sql.q_quality: same expressions with
    round_even, which matches np.round's half-to-even — verified)."""
    n = texts.str.len().to_numpy(dtype=np.float64)
    n = np.maximum(n, 1.0)
    punct = texts.str.count(_PUNCT_RE).to_numpy(dtype=np.float64)
    stop = texts.str.lower().str.count(_STOPWORD_RE).to_numpy(dtype=np.float64)
    nw = np.maximum(texts.str.count(TOKEN_RE).to_numpy(dtype=np.float64), 1.0)
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
    character windows.

    h[j] = sum_t codepoint[j+t] * B^(w-1-t) mod 2^64 (numpy uint64
    wraparound), min over all windows; docs shorter than `window` fall
    back to the md5-prefix hash.  Operates on Unicode CODE POINTS (not
    utf-8 bytes) so the DuckDB twin's ord(substr(text, j, 1)) reproduces
    it bit-exactly on any input (oracle/sql.q_fingerprints).  Vectorized:
    all window hashes at once via a sliding-window view — no per-char
    Python loop."""
    out = np.empty(len(texts), dtype=np.int64)
    B = np.uint64(1000003)
    powers = B ** np.arange(window - 1, -1, -1, dtype=np.uint64)  # B^(w-1)..B^0
    with np.errstate(over="ignore"):
        for i, t in enumerate(texts):
            s = str(t)
            if len(s) < window:
                out[i] = md5_hash64(pd.Series([t]))[0]
                continue
            arr = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.uint64
            )
            v = np.lib.stride_tricks.sliding_window_view(arr, window)
            h = (v * powers[None, :]).sum(axis=1, dtype=np.uint64)
            out[i] = h.min().astype(np.int64)
    return out


def shingles(text: str, k: int = 5, mode: str = "word") -> set[str]:
    """k-shingles: mode='word' (lowercased token windows, joined by a
    space) or mode='char' (lowercased raw-character k-grams).  Oracle
    twins: word -> array_to_string over token list windows; char ->
    substr(lower(text), i, k) windows."""
    if mode == "char":
        low = text.lower()
        if len(low) < k:
            return {low} if low else set()
        return {low[i : i + k] for i in range(len(low) - k + 1)}
    toks = [t.lower() for t in TOKEN_RE.findall(text)]
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


# MinHash permutation domain: the Mersenne prime 2^31-1.  Shingles are
# md5-hashed ONCE to u64, reduced mod p, then run through num_hashes
# universal-hash permutations h_i(x) = (a_i*x + b_i) mod p — all values
# < 2^31 so every product fits in 64 bits in BOTH numpy (uint64) and
# DuckDB (BIGINT/UBIGINT), making the whole pipeline SQL-reproducible
# bit-exactly (see oracle/sql.py q_near_dup_pairs).
MINHASH_P = 2147483647  # 2^31 - 1


def minhash_consts(num_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic permutation constants, reproducible in SQL as
    a_i = (i*2654435761 + 1) % p, b_i = (i*40503 + 17) % p."""
    i = np.arange(num_hashes, dtype=np.uint64)
    p = np.uint64(MINHASH_P)
    a = (i * np.uint64(2654435761) + np.uint64(1)) % p
    b = (i * np.uint64(40503) + np.uint64(17)) % p
    assert (a != 0).all(), "degenerate permutation multiplier"
    return a, b


def shingle_hashes(text: str, k: int = 5, mode: str = "word") -> np.ndarray:
    """Distinct shingles md5-hashed to uint64 (first 16 hex chars).
    Oracle twin: ('0x' || substr(md5(s),1,16))::UBIGINT."""
    sh = shingles(text, k, mode)
    return np.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) for s in sh],
        dtype=np.uint64,
    )


def minhash_signature(text: str, num_hashes: int = 32, k: int = 5,
                      mode: str = "word") -> np.ndarray:
    """MinHash signature (uint64 values < 2^31): one md5 per distinct
    shingle, then num_hashes vectorized universal-hash permutations over
    GF(2^31-1) — no per-(shingle x hash) Python loop.  Empty shingle sets
    return the sentinel p (impossible hash value)."""
    p = np.uint64(MINHASH_P)
    x = shingle_hashes(text, k, mode) % p
    if len(x) == 0:
        return np.full(num_hashes, p, dtype=np.uint64)
    a, b = minhash_consts(num_hashes)
    h = (x[:, None] * a[None, :] + b[None, :]) % p  # (shingles, hashes)
    return h.min(axis=0)


def minhash_signatures_batch(texts, num_hashes: int = 32, k: int = 5,
                             mode: str = "word") -> np.ndarray:
    """MinHash signatures for a WHOLE batch at once -> (n_docs, num_hashes)
    uint64.  The md5-per-distinct-shingle loop is the oracle contract (SQL
    twin hashes the same strings); everything after it — the (total_shingles
    x num_hashes) universal-hash matrix and the per-doc min — is one
    vectorized pass with segment reduceat, no per-doc permutation loops.
    Docs with no shingles get the sentinel row (all MINHASH_P)."""
    p = np.uint64(MINHASH_P)
    xs = [shingle_hashes(str(t), k, mode) % p for t in texts]
    counts = np.array([len(x) for x in xs], dtype=np.int64)
    out = np.full((len(xs), num_hashes), p, dtype=np.uint64)
    if len(xs) == 0 or counts.sum() == 0:
        return out
    a, b = minhash_consts(num_hashes)
    allx = np.concatenate(xs)
    h = (allx[:, None] * a[None, :] + b[None, :]) % p  # (total, num_hashes)
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nonzero = counts > 0
    out[nonzero] = np.minimum.reduceat(h, offsets[nonzero], axis=0)
    return out


# integer band-bucket fold: bucket_b = ((b+1)*M^k + sum_t sig[b*k+t] *
# M^(k-1-t)) mod p with M = 1000003, k = band_size — every product < 2^62
# (operands < p < 2^31), so BIGINT math in DuckDB reproduces it bit-exactly
# (oracle/sql.q_near_dup_pairs).  Replaces the per-doc md5-of-string-join
# bucket hash: one (n_docs, n_bands, band_size) vectorized pass.
BAND_M = 1000003


def band_buckets(sig: np.ndarray, band_size: int) -> np.ndarray:
    """(n_docs, num_hashes) minhash signatures -> (n_docs, n_bands) int64
    band buckets.  Tail hashes beyond n_bands*band_size are dropped (both
    engines — the SQL twin filters i < n_bands*band_size identically)."""
    p = np.uint64(MINHASH_P)
    n_docs, num_hashes = sig.shape
    n_bands = num_hashes // band_size
    used = sig[:, : n_bands * band_size].reshape(n_docs, n_bands, band_size)
    w = np.array(
        [pow(BAND_M, band_size - 1 - t, MINHASH_P) for t in range(band_size)],
        dtype=np.uint64,
    )
    terms = (used * w[None, None, :]) % p          # each < p
    s = terms.sum(axis=2)                          # < band_size * p (no mod yet)
    head = np.array(
        [((b + 1) * pow(BAND_M, band_size, MINHASH_P)) % MINHASH_P
         for b in range(n_bands)],
        dtype=np.uint64,
    )
    return ((head[None, :] + s) % p).astype(np.int64)


def token_hashes(text: str) -> np.ndarray:
    """Distinct lowercased tokens md5-hashed to uint64 (first 16 hex).
    Oracle twin: ('0x' || substr(md5(t),1,16))::UBIGINT over DISTINCT
    lower(token)."""
    toks = {t.lower() for t in TOKEN_RE.findall(text)}
    return np.array(
        [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:16], 16) for t in toks],
        dtype=np.uint64,
    )


def simhash64(text: str) -> np.ndarray:
    """64-bit SimHash over distinct token hashes: bit i set iff more token
    hashes have bit i set than clear (strict majority; ties -> 0).  Pure
    integer pipeline, bit-exact reproducible in SQL (oracle/sql.q_simhash).
    Returns uint64 scalar array of shape ()."""
    h = token_hashes(text)
    if len(h) == 0:
        return np.uint64(0)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
    votes = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    sig = np.uint64(0)
    set_bits = np.nonzero(votes > 0)[0]
    for i in set_bits:
        sig |= np.uint64(1) << np.uint64(i)
    return sig


def simhash64_batch(texts) -> np.ndarray:
    """SimHash for a whole batch -> (n_docs,) uint64.  Same semantics as
    simhash64 (strict-majority votes over distinct token hashes; empty ->
    0); the (total_tokens x 64) vote matrix and per-doc reduceat replace
    the per-doc vote loop."""
    hs = [token_hashes(str(t)) for t in texts]
    counts = np.array([len(h) for h in hs], dtype=np.int64)
    out = np.zeros(len(hs), dtype=np.uint64)
    if len(hs) == 0 or counts.sum() == 0:
        return out
    allh = np.concatenate(hs)
    shifts = np.arange(64, dtype=np.uint64)
    bits = ((allh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int64)
    votes_all = 2 * bits - 1
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    nz = counts > 0
    votes = np.add.reduceat(votes_all, offsets[nz], axis=0)  # (n_nz, 64)
    pows = np.uint64(1) << shifts
    out[nz] = ((votes > 0).astype(np.uint64) * pows[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    return out


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized SWAR popcount for uint64 (numpy<2 lacks bitwise_count)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    m1 = np.uint64(0x5555555555555555)
    m2 = np.uint64(0x3333333333333333)
    m4 = np.uint64(0x0F0F0F0F0F0F0F0F)
    x -= (x >> np.uint64(1)) & m1
    x = (x & m2) + ((x >> np.uint64(2)) & m2)
    x = (x + (x >> np.uint64(4))) & m4
    return ((x * np.uint64(0x0101010101010101)) >> np.uint64(56)).astype(np.int64)


def hamming64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount of XOR over uint64 arrays."""
    return popcount64(np.asarray(a, dtype=np.uint64) ^ np.asarray(b, dtype=np.uint64))


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / max(1, len(a | b))
