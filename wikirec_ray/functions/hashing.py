"""Stable hashing primitives for dedup/fingerprinting stages.

Everything here must be deterministic ACROSS PROCESSES (Python's builtin
``hash`` is salted per process and is never used).  Token hashes are a
polynomial fold of the utf-8 bytes mod 2^64 followed by a murmur-style
bit-mix finalizer — chosen because it is BOTH numpy-vectorizable over the
flat Arrow string buffer (no per-token Python loop; VERDICT r02 item 3) AND
exactly expressible in DuckDB SQL (HUGEINT modular arithmetic +
xor/shift), which is what lets the MinHash/SimHash pipelines carry real
DuckDB oracles.  Shingle hashes combine token hashes with uint64
polynomial arithmetic (vectorized, wraparound mod 2^64).
"""

from __future__ import annotations

import hashlib

import numpy as np

_POLY = np.uint64(1099511628211)  # FNV-1a prime, reused as polynomial base

# 2^64/phi — the classic multiplicative-hash salt, shared by every
# module that keys fmix64 (one definition so hash streams cannot drift)
GOLD64 = np.uint64(0x9E3779B97F4A7C15)

# murmur3 fmix64 constants (public domain finalizer)
_MIX1 = np.uint64(0xFF51AFD7ED558CCD)
_MIX2 = np.uint64(0xC4CEB9FE1A85EC53)


def fmix64(h: np.ndarray | np.uint64) -> np.ndarray | np.uint64:
    """murmur3 64-bit finalizer, vectorized (uint64 wraparound)."""
    with np.errstate(over="ignore"):
        h = np.asarray(h, np.uint64)
        h = h ^ (h >> np.uint64(33))
        h = h * _MIX1
        h = h ^ (h >> np.uint64(33))
        h = h * _MIX2
        return h ^ (h >> np.uint64(33))


_M64 = 1 << 64


def token_hash(token: str) -> int:
    """Scalar reference implementation of the token hash: Horner fold of the
    utf-8 bytes (acc = acc*B + byte, mod 2^64) then fmix64.  The SQL oracle
    generator (``__ray_entry__._token_hash_ctes``) emits exactly this."""
    acc = 0
    base = int(_POLY)
    for byte in token.encode("utf-8"):
        acc = (acc * base + byte) % _M64
    return int(fmix64(np.uint64(acc)))


def token_hashes_arrow(flat) -> np.ndarray:
    """Vectorized token hash over an Arrow string array (the flat,
    empty-filtered token stream).  Two stages, both vectorized:

    1. ``dictionary_encode`` (Arrow C++) collapses the stream to its
       unique vocabulary — the per-byte arithmetic then touches only vocab
       bytes, not stream bytes (the token stream is zipfian, so this is
       the vectorized analog of the old per-token memo cache, and it keeps
       the fresh-allocation footprint tiny — large fresh numpy buffers
       fault in slowly on this box, see CLAUDE.md);
    2. the unique tokens hash in one numpy pass over the shared byte
       buffer (byte × B^(distance-from-end) mod 2^64, ``add.reduceat`` at
       token starts, fmix64 finalizer).

    Equals ``token_hash`` per element (pinned in tests); replaces the
    per-token Python loop that dominated the dedup hot path."""
    import pyarrow as pa

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    if len(flat) == 0:
        return np.empty(0, np.uint64)
    enc = flat.dictionary_encode()
    uniq = _hash_string_array(enc.dictionary)
    idx = enc.indices.to_numpy(zero_copy_only=False)
    return uniq[idx]


def _hash_string_array(flat) -> np.ndarray:
    """The per-byte vectorized hash core (see ``token_hashes_arrow``)."""
    import pyarrow as pa

    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(flat)
    if n == 0:
        return np.empty(0, np.uint64)
    if pa.types.is_large_string(flat.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = flat.buffers()
    off = np.frombuffer(bufs[1], off_dtype, count=n + 1, offset=flat.offset * np.dtype(off_dtype).itemsize).astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8)
    start, end = off[0], off[-1]
    lengths = np.diff(off)
    if end == start:  # all-empty tokens
        return fmix64(np.zeros(n, np.uint64))
    # exponent of byte i (global) = token_end - 1 - i
    ends = np.repeat(off[1:], lengths)
    exps = ends - 1 - np.arange(start, end)
    maxlen = int(lengths.max())
    # power table via wrapping cumprod (uint64 multiply is mod 2^64) — a
    # Python loop here scales with the LONGEST row, which for binary blob
    # rows (index-build fingerprints) can be tens of KB
    with np.errstate(over="ignore"):
        pows = np.concatenate(
            [[np.uint64(1)],
             np.cumprod(np.full(max(maxlen - 1, 0), _POLY, np.uint64))]
        )
    with np.errstate(over="ignore"):
        vals = data[start:end].astype(np.uint64) * pows[exps]
    sums = np.zeros(n, np.uint64)
    nonempty = lengths > 0
    ne_starts = (off[:-1] - start)[nonempty]
    if len(ne_starts):
        sums[nonempty] = np.add.reduceat(vals, ne_starts)
    return fmix64(sums)


def token_hashes(tokens: list[str], cache: dict[str, int] | None = None) -> np.ndarray:
    """Vector of stable 64-bit hashes for a Python token list (convenience
    wrapper over the Arrow-vectorized path).  ``cache`` is accepted for
    source compatibility with the pre-vectorization signature but IGNORED —
    the dictionary-encode stage inside ``token_hashes_arrow`` is the
    vectorized equivalent of that memo cache."""
    import pyarrow as pa

    return token_hashes_arrow(pa.array(tokens, pa.string()))


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


_FNV_OFFSET = np.uint64(14695981039346656037)


def window_fold(flat_hashes: np.ndarray, k: int) -> np.ndarray:
    """Rolling polynomial fold over every k-window of a hash stream:
    ``acc = (acc * POLY) ^ h_j`` from the FNV offset — the single shared
    n-gram/shingle kernel (MinHash shingles, Gopher repetition n-grams).
    Returns uint64[max(len(flat_hashes) - k + 1, 0)] (empty when the stream
    is shorter than k); caller masks windows that cross doc boundaries."""
    n = len(flat_hashes)
    if n < k:
        return np.empty(0, dtype=np.uint64)
    acc = np.full(n - k + 1, _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            acc = (acc * _POLY) ^ flat_hashes[j : j + n - k + 1]
    return acc


def shingle_hashes_flat(
    flat_hashes: np.ndarray, doc_bounds: np.ndarray, k: int = 3
) -> tuple[np.ndarray, np.ndarray]:
    """Rolling k-shingles for MANY docs in one pass (the batch-vectorized
    ``shingle_hashes``): windows crossing doc boundaries are masked out with
    one comparison.  Duplicates are retained — the MinHash min is
    duplicate-insensitive, so ``np.unique`` per doc is unnecessary work.
    Docs shorter than k get one whole-doc fold hash (same as the per-doc
    path); empty docs get zero shingles.

    Returns (flat shingles, int64[n_docs+1] per-doc boundaries)."""
    n = len(flat_hashes)
    n_docs = len(doc_bounds) - 1
    doc_len = np.diff(doc_bounds)
    if n >= k:
        acc = window_fold(flat_hashes, k)
        parent = np.repeat(np.arange(n_docs), doc_len)
        valid = parent[: n - k + 1] == parent[k - 1 :]
        sh_main = acc[valid]
        par_main = parent[: n - k + 1][valid]
    else:
        sh_main = np.empty(0, np.uint64)
        par_main = np.empty(0, np.int64)
    short = np.flatnonzero((doc_len > 0) & (doc_len < k))
    sh_short = np.empty(len(short), np.uint64)
    for i, d in enumerate(short):  # short docs only — rare
        h = _FNV_OFFSET
        for v in flat_hashes[doc_bounds[d] : doc_bounds[d + 1]]:
            h = (h * _POLY) ^ np.uint64(v)
        sh_short[i] = h
    par_all = np.concatenate([par_main, short.astype(np.int64)])
    sh_all = np.concatenate([sh_main, sh_short])
    order = np.argsort(par_all, kind="stable")
    sh_all = sh_all[order]
    counts = np.zeros(n_docs, np.int64)
    np.add.at(counts, par_all, 1)
    starts = np.zeros(n_docs + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    return sh_all, starts


def minhash_signatures_flat(
    sh_flat: np.ndarray, sh_starts: np.ndarray, a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """(n_docs, n_perm) signatures for many docs at once: one vectorized
    pass over the whole shingle stream per permutation + ``minimum.reduceat``
    at doc boundaries — replaces the per-doc ``minhash_signature`` loop.
    Empty docs get the all-max sentinel (same as the per-doc path)."""
    n_docs = len(sh_starts) - 1
    sig = np.full((n_docs, len(a)), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(sh_flat) == 0 or n_docs == 0:
        return sig
    counts = np.diff(sh_starts)
    nonempty = counts > 0
    # reduceat over NON-EMPTY segment starts only: clamping an empty trailing
    # doc's start to len-1 would insert a bogus boundary that truncates the
    # PRECEDING doc's segment (dropped its last shingle — caught in review,
    # pinned by test_batch_minhash_trailing_empty_doc)
    ne_starts = sh_starts[:-1][nonempty]
    if len(ne_starts) == 0:
        return sig
    for i in range(len(a)):
        vals = (a[i] * sh_flat + b[i]) % _MERSENNE
        sig[nonempty, i] = np.minimum.reduceat(vals, ne_starts)
    return sig


def band_keys_matrix(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """(n_docs, n_bands) bucket keys — FNV-style fold of each band's
    signature rows, vectorized over docs (replaces per-doc blake2b calls;
    bucket values are internal to the LSH shuffle, so the hash family only
    needs good dispersion, not compatibility)."""
    n_docs, n_perm = sigs.shape
    rows = n_perm // n_bands
    out = np.empty((n_docs, n_bands), np.uint64)
    for b in range(n_bands):
        h = np.full(n_docs, _FNV_OFFSET, np.uint64)
        for c in range(b * rows, (b + 1) * rows):
            h = (h * _POLY) ^ sigs[:, c]
        out[:, b] = (h * _POLY) ^ np.uint64(b)
    return out


def simhash64_flat(flat_hashes: np.ndarray, doc_bounds: np.ndarray) -> np.ndarray:
    """(n_docs,) 64-bit SimHash for many docs at once: per-bit ±1 occurrence
    sums via ``add.reduceat`` (equivalent to the per-doc unique+counts
    weighting — summing occurrences IS count-weighting); empty docs -> 0."""
    n_docs = len(doc_bounds) - 1
    out = np.zeros(n_docs, np.uint64)
    n = len(flat_hashes)
    if n == 0 or n_docs == 0:
        return out
    counts = np.diff(doc_bounds)
    nonempty = counts > 0
    # non-empty starts only — same trailing-empty-doc truncation hazard as
    # minhash_signatures_flat
    ne_starts = doc_bounds[:-1][nonempty]
    if len(ne_starts) == 0:
        return out
    ne_idx = np.flatnonzero(nonempty)
    for j in range(64):
        col = (((flat_hashes >> np.uint64(j)) & np.uint64(1)).astype(np.int64) * 2 - 1)
        acc = np.add.reduceat(col, ne_starts)
        out[ne_idx] |= (acc > 0).astype(np.uint64) << np.uint64(j)
    return out


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


# --- HyperLogLog (Flajolet, Fusy, Gandouet, Meunier 2007) ------------------

HLL_P = 12  # 4096 registers; typical error 1.04/sqrt(m) ≈ 1.6%


def hll_partial(hashes: np.ndarray, p: int = HLL_P) -> np.ndarray:
    """uint8[m] register array for one batch of 64-bit hashes (vectorized):
    register = leading p bits; rank = leftmost-1 position of the rest + 1.
    Mergeable by elementwise max — the sketch property the reduce uses."""
    if not 11 <= p <= 18:
        # frexp-based bit_length is exact only while rem < 2^53, i.e. p >= 11
        raise ValueError(f"hll p must be in [11, 18], got {p}")
    m = 1 << p
    regs = np.zeros(m, np.uint8)
    if len(hashes) == 0:
        return regs
    h = np.ascontiguousarray(hashes, np.uint64)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rem = h & np.uint64((1 << (64 - p)) - 1)
    # bit_length via frexp exponent (exact: rem < 2^(64-p) <= 2^53)
    bitlen = np.frexp(rem.astype(np.float64))[1]
    rank = np.where(rem > 0, (64 - p) - bitlen + 1, (64 - p) + 1).astype(np.uint8)
    np.maximum.at(regs, idx, rank)
    return regs


def hll_merge(parts: list[np.ndarray]) -> np.ndarray:
    out = parts[0].copy()
    for r in parts[1:]:
        np.maximum(out, r, out=out)
    return out


def hll_estimate(regs: np.ndarray) -> float:
    """Cardinality estimate with the standard small-range (linear counting)
    correction."""
    m = len(regs)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)
