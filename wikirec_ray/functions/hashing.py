"""Stable hashing primitives for dedup/fingerprinting stages.

Everything here must be deterministic ACROSS PROCESSES (Python's builtin
``hash`` is salted per process and is never used).  Token/byte hashes are
8-byte blake2b digests; shingle hashes combine token hashes with uint64
polynomial arithmetic (vectorized, wraparound mod 2^64).
"""

from __future__ import annotations

import hashlib

import numpy as np

_POLY = np.uint64(1099511628211)  # FNV-1a prime, reused as polynomial base


def token_hash(token: str) -> int:
    return int.from_bytes(hashlib.blake2b(token.encode("utf-8"), digest_size=8).digest(), "little")


def token_hashes(tokens: list[str], cache: dict[str, int] | None = None) -> np.ndarray:
    """Vector of stable 64-bit hashes; pass a dict cache to amortize repeats
    (vocabulary is tiny relative to token stream)."""
    if cache is None:
        cache = {}
    out = np.empty(len(tokens), dtype=np.uint64)
    for i, t in enumerate(tokens):
        h = cache.get(t)
        if h is None:
            h = token_hash(t)
            cache[t] = h
        out[i] = h
    return out


def shingle_hashes(tok_hashes: np.ndarray, k: int = 3) -> np.ndarray:
    """Rolling k-shingle hashes over a doc's token-hash sequence (uint64
    polynomial; deterministic).  len < k → single shingle over what's there."""
    n = len(tok_hashes)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    if n < k:
        h = np.uint64(14695981039346656037)
        for v in tok_hashes:
            h = (h * _POLY) ^ np.uint64(v)
        return np.array([h], dtype=np.uint64)
    acc = np.full(n - k + 1, np.uint64(14695981039346656037), dtype=np.uint64)
    for j in range(k):
        acc = (acc * _POLY) ^ tok_hashes[j : j + n - k + 1]
    return np.unique(acc)


# --- MinHash ---------------------------------------------------------------

_MERSENNE = np.uint64((1 << 61) - 1)


def minhash_params(n_perm: int, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    b = rng.integers(0, (1 << 61) - 1, size=n_perm, dtype=np.uint64)
    return a, b


def minhash_signature(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n_perm,) uint64 signature: min over shingles of (a·x + b) mod 2^61-1.

    The multiply wraps mod 2^64 — a standard 'cheap universal-ish' family;
    adequate for near-dup bucketing (not cryptographic)."""
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_perm, n_shingles) — bounded: shingle count per doc is small
    prod = a[:, None] * shingles[None, :] + b[:, None]
    return (prod % _MERSENNE).min(axis=1)


def band_keys(sig: np.ndarray, n_bands: int) -> list[int]:
    """Split the signature into bands and hash each band to a bucket key."""
    rows = len(sig) // n_bands
    keys = []
    for b in range(n_bands):
        h = hashlib.blake2b(sig[b * rows : (b + 1) * rows].tobytes(), digest_size=8)
        keys.append(int.from_bytes(h.digest(), "little"))
    return keys


# --- SimHash ---------------------------------------------------------------


def simhash64(tok_hashes: np.ndarray, weights: np.ndarray) -> int:
    """64-bit SimHash: weighted sign-sum of token-hash bits."""
    if len(tok_hashes) == 0:
        return 0
    bits = ((tok_hashes[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.float64
    )
    acc = ((bits * 2.0 - 1.0) * weights[:, None].astype(np.float64)).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if acc[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 lacks ``bitwise_count``): view as
    bytes, unpack to bits, sum per 64-bit lane."""
    v = np.ascontiguousarray(x, dtype=np.uint64)
    if len(v) == 0:
        return np.empty(0, np.int64)
    return np.unpackbits(v.view(np.uint8)).reshape(len(v), 64).sum(axis=1).astype(np.int64)
