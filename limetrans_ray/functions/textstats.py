"""Text-analysis scalar/batch functions for training-data pipelines:
language ID, quality scoring, token counting, document fingerprinting,
and the MinHash / SimHash / shingle primitives used by the dedup suite.

These extend the reference's per-record normalization surface (SURVEY.md
§2.3/2.10) with the operations a large-scale training-data pipeline
needs. Everything is deterministic (seeded, no wall clock) and uses
stable hashes (blake2b), never Python's salted ``hash()``.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

from .analyzer import simple_terms

# --------------------------------------------------------------------------
# stable hashing

_U64 = np.uint64


def stable_hash64(s: str | bytes) -> int:
    """Stable 64-bit hash (blake2b-8); identical across processes/runs."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int.from_bytes(hashlib.blake2b(b, digest_size=8).digest(), "little")


def hash64_column(values) -> np.ndarray:
    """Vector of stable 64-bit hashes for an iterable of strings (uint64)."""
    return np.fromiter(
        (stable_hash64(v) for v in values), dtype=np.uint64, count=len(values)
    )


def md5_low64(s: str | bytes) -> int:
    """64-bit hash equal to DuckDB's ``md5_number_lower`` (bytes 8..16
    of the MD5 digest, little-endian) — used where an oracle SQL query
    must recompute the exact same per-token hash."""
    b = s.encode("utf-8") if isinstance(s, str) else s
    return int.from_bytes(hashlib.md5(b).digest()[8:16], "little")


# --------------------------------------------------------------------------
# language identification (stop-word-hit heuristic)

_LANG_MARKERS = {
    "en": frozenset(
        "the and of to in is was for with that it on as are this at by from "
        "be or an have not they his her which you we".split()
    ),
    "de": frozenset(
        "der die das und ist von zu den mit nicht sich des auf für ein eine "
        "als auch es an werden aus er hat dass sie nach bei um noch wie".split()
    ),
    "fr": frozenset(
        "le la les de des et est un une du dans que pour qui au sur pas ne "
        "se ce il elle sont avec son ses mais plus ou nous vous".split()
    ),
}
_WORD_RE = re.compile(r"[a-zàâäéèêëîïôöùûüçß]+")


def detect_language(text: str, default: str = "und") -> str:
    """N-gram-free stop-word-hit language ID over {en, de, fr}.

    Deterministic tie-break: highest hit count wins, ties resolved by
    language code ascending; below 2 hits → ``default``.
    """
    words = _WORD_RE.findall(text.lower())
    if not words:
        return default
    best_lang, best_hits = default, 1
    for lang in sorted(_LANG_MARKERS):
        hits = sum(1 for w in words if w in _LANG_MARKERS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


# --------------------------------------------------------------------------
# quality scoring

# Explicit character classes (NOT \w) so the DuckDB oracle's RE2 regex
# — where \w is ASCII-only — can mirror them exactly: word chars are
# ASCII alnum/underscore plus Latin-1 Supplement/Extended-A/B letters.
_PUNCT_RE = re.compile(r"[^0-9A-Za-z_\sÀ-ɏ]")
_DIGIT_RE = re.compile(r"\d")
_BPEISH_RE = re.compile(r"\w+|[^\w\s]", re.UNICODE)

_QUALITY_STOPWORDS = _LANG_MARKERS["en"] | _LANG_MARKERS["de"] | _LANG_MARKERS["fr"]


def quality_features(text: str) -> dict:
    """Deterministic quality features: lengths, punct/digit/stopword
    ratios, mean token length, and a composite [0,1] score."""
    n_chars = len(text)
    tokens = simple_terms(text)
    n_tokens = len(tokens)
    n_punct = len(_PUNCT_RE.findall(text))
    n_digits = len(_DIGIT_RE.findall(text))
    stop_hits = sum(1 for t in tokens if t in _QUALITY_STOPWORDS)
    mean_tok = (sum(len(t) for t in tokens) / n_tokens) if n_tokens else 0.0
    punct_ratio = n_punct / n_chars if n_chars else 0.0
    digit_ratio = n_digits / n_chars if n_chars else 0.0
    stop_ratio = stop_hits / n_tokens if n_tokens else 0.0
    score = 1.0
    if n_tokens < 10:
        score *= n_tokens / 10.0
    if mean_tok < 2.0 or mean_tok > 12.0:
        score *= 0.5
    score *= max(0.0, 1.0 - 2.0 * punct_ratio) * max(0.0, 1.0 - 2.0 * digit_ratio)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "punct_ratio": punct_ratio,
        "digit_ratio": digit_ratio,
        "stop_ratio": stop_ratio,
        "mean_token_len": mean_tok,
        "quality": score,
    }


def count_tokens_bpeish(text: str) -> int:
    """BPE-ish token count: words + isolated punctuation marks."""
    return len(_BPEISH_RE.findall(text))


# --------------------------------------------------------------------------
# fingerprinting (rolling polynomial hash of the normalized token stream)

_FP_BASE = np.uint64(1099511628211)  # FNV prime


def fingerprint64(text: str) -> int:
    """Order-sensitive 64-bit document fingerprint: polynomial rolling
    hash (mod 2^64) over the ``simple_terms`` token-hash stream."""
    acc = np.uint64(14695981039346656037)  # FNV offset basis
    for t in simple_terms(text):
        acc = (acc * _FP_BASE + _U64(stable_hash64(t))) & _U64(0xFFFFFFFFFFFFFFFF)
    return int(acc)


def fingerprint_md5(text: str) -> str:
    """Order-sensitive document fingerprint as the MD5 hex of the
    space-joined ``simple_terms`` stream — chosen because the DuckDB
    oracle can recompute it exactly
    (``md5(array_to_string(tokens, ' '))``), unlike the rolling-hash
    variant whose mod-2^64 arithmetic SQL cannot express."""
    return hashlib.md5(" ".join(simple_terms(text)).encode("utf-8")).hexdigest()


# --------------------------------------------------------------------------
# shingles / MinHash / SimHash primitives

def word_shingles(text: str, k: int = 1) -> np.ndarray:
    """Distinct word k-shingle hashes (uint64, sorted) of ``text``."""
    toks = simple_terms(text)
    if len(toks) < k:
        return np.zeros(0, dtype=np.uint64)
    if k == 1:
        items = set(toks)
    else:
        items = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
    return np.sort(np.fromiter((stable_hash64(s) for s in items), dtype=np.uint64, count=len(items)))


def minhash_params(num_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    """Seeded (a, b) parameters for ``num_perm`` MinHash mixes
    h_i(x) ≈ (a_i * x + b_i) mod 2^61-1 (see
    :func:`minhash_signature` for the exact, slightly ad-hoc map)."""
    rng = np.random.default_rng(seed)
    mersenne = (1 << 61) - 1
    a = rng.integers(1, mersenne, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, mersenne, size=num_perm, dtype=np.uint64)
    return a, b


_MERSENNE = _U64((1 << 61) - 1)


def minhash_signature(shingle_hashes: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature (uint64, len(a)) of a set of shingle hashes.

    NOTE: ``a*x`` wraps mod 2^64 *before* the mod 2^61-1 reduction, so
    this is a deterministic ad-hoc mix, not the textbook universal hash
    family — the analytic LSH false-negative bound does not strictly
    apply (empirical recall is pinned by tests/test_dedup_ann.py's
    planted-duplicate test instead). The wraparound keeps the kernel a
    single vectorized uint64 numpy op."""
    if len(shingle_hashes) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    x = shingle_hashes.astype(np.uint64) & _MERSENNE
    # (num_perm, n) — modular arithmetic via Python-object ints would be
    # slow; uint64 wraparound then mod keeps the map deterministic.
    vals = (np.outer(a, x) + b[:, None]) % _MERSENNE
    return vals.min(axis=1).astype(np.uint64)


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard similarity of two sorted uint64 shingle-hash sets."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    union = len(a) + len(b) - inter
    return inter / union if union else 0.0


def simhash64(text: str) -> int:
    """64-bit SimHash over the ``simple_terms`` token stream
    (tf-weighted). Per-token hash is :func:`md5_low64` so the DuckDB
    oracle (``md5_number_lower`` + per-bit vote) reproduces fingerprints
    bit-for-bit."""
    toks = simple_terms(text)
    if not toks:
        return 0
    hashes = np.fromiter((md5_low64(t) for t in toks), dtype=np.uint64, count=len(toks))
    bits = ((hashes[:, None] >> np.arange(64, dtype=np.uint64)) & _U64(1)).astype(np.int64)
    acc = (2 * bits - 1).sum(axis=0)
    return int(((acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)).sum())


def hamming64(x: int, y: int) -> int:
    return bin(x ^ y).count("1")
