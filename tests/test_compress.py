"""Codec roundtrips (delta-gap + LEB128 varint), incl. hypothesis fuzzing."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from wikirec_ray.functions.compress import (
    decode_postings,
    delta_decode,
    delta_encode,
    encode_postings,
    varint_decode,
    varint_encode,
)


def test_empty():
    assert varint_encode(np.empty(0, np.uint64)) == b""
    assert len(varint_decode(b"")) == 0


def test_known_values():
    v = np.array([0, 1, 127, 128, 300, 2**63, 2**64 - 1], dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v), len(v)), v)
    # single-byte encodings for < 128
    assert varint_encode(np.array([5], np.uint64)) == b"\x05"
    assert varint_encode(np.array([300], np.uint64)) == b"\xac\x02"


def test_count_validation():
    with pytest.raises(ValueError):
        varint_decode(varint_encode(np.array([1, 2], np.uint64)), 3)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**64 - 1), max_size=300))
def test_varint_roundtrip_fuzz(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(varint_decode(varint_encode(v), len(v)), v)


@settings(max_examples=100, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**12), min_size=1, max_size=300))
def test_postings_roundtrip_fuzz(ids):
    doc_ids = np.array(sorted(ids), dtype=np.uint64)
    tfs = (doc_ids % 97 + 1).astype(np.uint64)
    db, tb = encode_postings(doc_ids, tfs)
    d2, t2 = decode_postings(db, tb, len(doc_ids))
    assert np.array_equal(d2, doc_ids)
    assert np.array_equal(t2, tfs)


def test_delta():
    ids = np.array([3, 5, 6, 100], dtype=np.uint64)
    assert np.array_equal(delta_encode(ids), np.array([3, 2, 1, 94], np.uint64))
    assert np.array_equal(delta_decode(delta_encode(ids)), ids)


def test_batch_minhash_equals_per_doc():
    """Vectorized whole-batch signatures must equal the per-doc path
    (which stays in the codebase as the oracle)."""
    import numpy as np

    from wikirec_ray.functions.hashing import (
        minhash_params,
        minhash_signature,
        minhash_signatures_flat,
        shingle_hashes,
        shingle_hashes_flat,
        simhash64,
        simhash64_flat,
        token_hashes,
    )

    docs = [
        "spark join window hash merge sort".split(),
        [],                     # empty doc
        ["one"],                # shorter than k
        ["a", "b"],             # shorter than k
        "the quick brown fox jumps over the lazy dog the quick".split(),
        ["x"] * 40,             # degenerate repeats
    ]
    a, b = minhash_params(64)
    cache: dict = {}
    flat = token_hashes([t for d in docs for t in d], cache)
    bounds = np.cumsum([0] + [len(d) for d in docs])
    sh_flat, sh_starts = shingle_hashes_flat(flat, bounds, 3)
    got = minhash_signatures_flat(sh_flat, sh_starts, a, b)
    for i, d in enumerate(docs):
        want = minhash_signature(shingle_hashes(token_hashes(d, cache), 3), a, b)
        assert np.array_equal(got[i], want), f"doc {i}"
    # simhash: batch == per-doc unique+counts weighting
    sh = simhash64_flat(flat, bounds)
    for i, d in enumerate(docs):
        hs = token_hashes(d, cache)
        uniq, counts = np.unique(hs, return_counts=True)
        assert int(sh[i]) == simhash64(uniq, counts), f"doc {i}"


def test_batch_minhash_trailing_empty_doc():
    """Review finding: a trailing empty doc must not truncate the preceding
    doc's reduceat segment (its last shingle was being dropped)."""
    import numpy as np

    from wikirec_ray.functions.hashing import (
        minhash_params,
        minhash_signature,
        minhash_signatures_flat,
        shingle_hashes,
        shingle_hashes_flat,
        simhash64,
        simhash64_flat,
        token_hashes,
    )

    docs = ["alpha beta gamma delta".split(), [], "x y z w q".split(), [], []]
    a, b = minhash_params(32)
    cache: dict = {}
    flat = token_hashes([t for d in docs for t in d], cache)
    bounds = np.cumsum([0] + [len(d) for d in docs])
    sh_flat, sh_starts = shingle_hashes_flat(flat, bounds, 3)
    got = minhash_signatures_flat(sh_flat, sh_starts, a, b)
    for i, d in enumerate(docs):
        want = minhash_signature(shingle_hashes(token_hashes(d, cache), 3), a, b)
        assert np.array_equal(got[i], want), f"doc {i}"
    sh = simhash64_flat(flat, bounds)
    for i, d in enumerate(docs):
        hs = token_hashes(d, cache)
        uniq, counts = np.unique(hs, return_counts=True)
        assert int(sh[i]) == simhash64(uniq, counts), f"doc {i}"
    # the review's minimal repro shapes
    assert minhash_signatures_flat(
        np.array([100, 50, 7], np.uint64), np.array([0, 3, 3]),
        np.array([1], np.uint64), np.array([0], np.uint64),
    )[0][0] == 7
    assert int(simhash64_flat(np.array([0b01, 0b10], np.uint64), np.array([0, 2, 2]))[0]) == 0


def test_token_hash_vectorized_equals_scalar_and_sql():
    """The poly64+fmix64 token hash must agree across its three forms: the
    scalar reference, the Arrow-vectorized batch path (incl. sliced/offset
    arrays), and the DuckDB SQL emitted by functions.sqlhash — the oracle
    contract the minhash/simhash entries rely on."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from wikirec_ray.functions.hashing import (
        minhash_params,
        minhash_signature,
        shingle_hashes,
        token_hash,
        token_hashes,
        token_hashes_arrow,
    )
    from wikirec_ray.functions.sqlhash import (
        minhash_perm_expr,
        shingle_fold_expr,
        token_hash_ctes,
    )

    toks = ["spark", "join", "a", "x" * 40, "value9", "the", "9", "zz0"]
    arr = pa.array(toks, pa.string())
    vec = token_hashes_arrow(arr)
    ref = np.array([token_hash(t) for t in toks], np.uint64)
    assert np.array_equal(vec, ref)
    assert np.array_equal(token_hashes_arrow(arr.slice(2, 4)), ref[2:6])

    con = duckdb.connect()
    vals = ",".join(f"('{t}')" for t in toks)
    q = f"WITH t(term) AS (VALUES {vals}), {token_hash_ctes('t')} SELECT term, h FROM tokh"
    rows = dict(con.execute(q).fetchall())
    assert all(int(rows[t]) == int(h) for t, h in zip(toks, ref))

    th = token_hashes(["spark", "join", "the"])
    want_sh = shingle_hashes(th, 3)[0]
    expr = shingle_fold_expr(*(str(int(h)) for h in th))
    assert int(con.execute(f"SELECT {expr}").fetchone()[0]) == int(want_sh)

    a, b = minhash_params(4)
    sig = minhash_signature(np.array([want_sh], np.uint64), a, b)
    for i in range(4):
        e = minhash_perm_expr(str(int(want_sh)), int(a[i]), int(b[i]))
        assert int(con.execute(f"SELECT {e}").fetchone()[0]) == int(sig[i])
