"""DuckDB SQL generators for the engine's hash primitives.

The MinHash/SimHash/HLL pipelines hash tokens with
``hashing.token_hash`` — a Horner byte fold mod 2^64 + murmur fmix64 —
chosen so the SAME function is computable in DuckDB (HUGEINT modular
arithmetic, xor/shift on UBIGINT).  These helpers emit the SQL; the
oracles in ``__ray_entry__`` are generated from them so the Ray side and
the DuckDB side cannot drift.  Equality with the numpy implementation is
pinned in ``tests/test_compress.py``.

All multiplications are mod 2^64.  A direct 64×64 HUGEINT multiply can
overflow INT128, so products use 32-bit split multiplication:
    x*c mod 2^64 = ((hi(x)*c mod 2^32) << 32) + lo(x)*c   (mod 2^64)
where every intermediate fits in HUGEINT.
"""

from __future__ import annotations

from wikirec_ray.functions.hashing import _MIX1, _MIX2, _POLY

M64 = 1 << 64
M32 = 1 << 32


def mulmod64(x: str, c: int | str) -> str:
    """SQL expr: (x * c) mod 2^64 with HUGEINT-safe split multiplication.
    ``x`` must be a HUGEINT-typed expression in [0, 2^64); ``c`` an integer
    constant or a column expression < 2^61 (so every partial product fits
    INT128)."""
    return (
        f"((((({x}) >> 32) * ({c})) % {M32}) * {M32} + (({x}) % {M32}) * ({c})) % {M64}"
    )


def fmix64_steps(src: str, out: str, col: str = "h", keys: str = "term") -> str:
    """CTE chain applying murmur fmix64 to column ``col`` (UBIGINT domain)
    of CTE ``src``; emits CTEs ``{out}_1..4`` and a final ``{out}``."""
    c1, c2 = int(_MIX1), int(_MIX2)
    return f"""
{out}_1 AS (SELECT {keys}, xor({col}, {col} >> 33) AS {col} FROM {src}),
{out}_2 AS (SELECT {keys}, CAST({mulmod64(f'CAST({col} AS HUGEINT)', c1)} AS UBIGINT) AS {col} FROM {out}_1),
{out}_3 AS (SELECT {keys}, xor({col}, {col} >> 33) AS {col} FROM {out}_2),
{out}_4 AS (SELECT {keys}, CAST({mulmod64(f'CAST({col} AS HUGEINT)', c2)} AS UBIGINT) AS {col} FROM {out}_3),
{out} AS (SELECT {keys}, xor({col}, {col} >> 33) AS {col} FROM {out}_4)"""


def token_hash_ctes(terms_src: str, out: str = "tokh") -> str:
    """CTE chain: ``terms_src`` must provide DISTINCT non-empty ``term``
    strings; ``{out}`` yields (term, h UBIGINT) = hashing.token_hash(term).
    Hashing only the distinct vocabulary keeps the oracle cheap — the token
    stream joins on term afterwards.

    The fold runs over the UTF-8 BYTES (via ``to_hex(encode(term))``, two
    hex chars per byte), matching the Python side exactly for non-ASCII
    terms too — a code-point fold diverges on anything outside ASCII
    (review r03 finding, pinned in tests)."""
    b = int(_POLY)
    fold = (
        "CAST(list_reduce(list_prepend(CAST(0 AS HUGEINT), "
        "list_transform(range(octet_length(encode(term))), "
        "i -> CAST(CAST(('0x' || substr(hx, i * 2 + 1, 2)) AS INTEGER) AS HUGEINT))), "
        f"(acc, c) -> (acc * {b} + c) % {M64}) AS UBIGINT)"
    )
    return (
        f"{out}_0 AS (SELECT term, {fold} AS h FROM "
        f"(SELECT term, to_hex(encode(term)) AS hx FROM {terms_src})),"
        + fmix64_steps(f"{out}_0", out)
    )


def shingle_fold_expr(*hs: str) -> str:
    """SQL expr for hashing.shingle_hashes' rolling fold over any number of
    token hashes: acc = FNV_OFFSET; acc = (acc*B) ^ h_j (uint64 domain).
    Three args = the k=3 window; one/two args = the whole-doc fold that
    ``shingle_hashes``/``shingle_hashes_flat`` give docs shorter than k.
    Inputs/outputs are UBIGINT expressions."""
    b = int(_POLY)
    off = 14695981039346656037
    acc = str(off)
    for h in hs:
        prod = mulmod64(f"CAST({acc} AS HUGEINT)", b)
        acc = f"xor(CAST(({prod}) AS UBIGINT), {h})"
    return acc


def minhash_perm_expr(sh: str, a: int | str, bb: int | str) -> str:
    """SQL expr for one MinHash permutation value of shingle-hash ``sh``
    (UBIGINT): ((a*x + b) mod 2^64) mod (2^61-1) — numpy's uint64 wraparound
    then the Mersenne modulus, as in hashing.minhash_signature.  ``a``/``bb``
    may be constants or column expressions (< 2^61)."""
    mers = (1 << 61) - 1
    prod = mulmod64(f"CAST({sh} AS HUGEINT)", a)
    return f"CAST(((({prod}) + ({bb})) % {M64}) % {mers} AS UBIGINT)"
