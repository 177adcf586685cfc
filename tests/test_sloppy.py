"""Sloppy phrase (Lucene ``"a b"~n`` — in-order span with slack <= slop).

Brute oracle: a doc matches iff SOME strictly increasing position tuple
matching the phrase terms in order has span slack pL - p1 - (L-1) <= slop
(checked over ALL occurrence combinations, deliberately NOT the engine's
greedy chain, so greedy-optimality itself is under test).  Scoring is the
plain multi-term BM25 filter contract shared with phrase/NEAR.
"""
import itertools
import math
from collections import Counter

import numpy as np
import pytest

from wikirec_ray.pipelines.query import IndexReader, parse_query, search
from wikirec_ray.schema import BM25_B, BM25_K1, NEAR_WINDOW_MAX


def _brute_filtered_bm25(toks, terms, k, match_fn):
    n = len(toks)
    df = Counter(t for tl in toks for t in set(tl))
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for i, tl in enumerate(toks):
        if not match_fn(tl):
            continue
        s = 0.0
        for t in terms:
            tf = tl.count(t)
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * len(tl) / avgdl)
                )
        out.append((i, round(s, 9)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _sloppy_match(tl, terms, slop):
    occ = [[j for j, x in enumerate(tl) if x == t] for t in terms]
    if any(not o for o in occ):
        return False
    for combo in itertools.product(*occ):
        if all(b > a for a, b in zip(combo, combo[1:])) and \
                combo[-1] - combo[0] - (len(terms) - 1) <= slop:
            return True
    return False


@pytest.fixture(scope="module")
def sloppy_index(ray_session, tmp_path_factory):
    import pyarrow as pa
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    rng = np.random.default_rng(29)
    vocab = [f"w{i}" for i in range(20)]
    ids = list(range(400))
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(4, 50))))
             for _ in ids]
    # crafted docs pinning order-sensitivity and exact span boundaries
    texts += [
        "alpha beta",            # 400: adjacent, in order
        "beta alpha",            # 401: reversed only
        "alpha x beta",          # 402: gap 1
        "alpha x y z beta",      # 403: gap 3
        "alpha alpha beta",      # 404: duplicate first term
    ]
    ids += [400, 401, 402, 403, 404]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    d = str(tmp_path_factory.mktemp("sloppy_idx"))
    build_index(ds, d, resume=False, store_positions=True)
    return d, [t.split() for t in texts]


def test_sloppy_phrase_equals_brute(sloppy_index):
    idx, toks = sloppy_index
    rd = IndexReader(idx)
    cases = [
        (["w1", "w2"], 0), (["w1", "w2"], 1), (["w1", "w2"], 3),
        (["w3", "w7", "w9"], 2), (["w3", "w7", "w9"], 6),
        (["w0", "w1", "w2"], 0), (["w5", "w5"], 1), (["w5", "w5"], 4),
        (["w2", "w4"], 1000), (["absent", "w1"], 4),
        (["alpha", "beta"], 0), (["alpha", "beta"], 1),
        (["alpha", "beta"], 3), (["beta", "alpha"], 0),
        (["beta", "alpha"], 2), (["w1"], 0), (["w1"], 5),
    ]
    for terms, slop in cases:
        got = rd.sloppy_phrase_topk(terms, 1000, slop=slop)
        want = _brute_filtered_bm25(
            toks, terms, 1000, lambda tl: _sloppy_match(tl, terms, slop)
        )
        assert [(d, round(s, 6)) for d, s in got] == \
               [(d, round(s, 6)) for d, s in want], (terms, slop)


def test_sloppy_phrase_fuzz_random_queries(sloppy_index):
    # randomized sweep over the anchored bidirectional greedy: phrase
    # lengths 2-4 (anchor lands at different offsets), slops 0-6,
    # duplicates allowed — every case vs the all-combinations brute
    idx, toks = sloppy_index
    rd = IndexReader(idx)
    rng = np.random.default_rng(41)
    vocab = [f"w{i}" for i in range(20)]
    for _ in range(60):
        terms = list(rng.choice(vocab, size=int(rng.integers(2, 5))))
        slop = int(rng.integers(0, 7))
        got = {d for d, _ in rd.sloppy_phrase_topk(terms, 10_000, slop=slop)}
        want = {i for i, tl in enumerate(toks)
                if _sloppy_match(tl, terms, slop)}
        assert got == want, (terms, slop)


def test_sloppy_zero_equals_exact_phrase(sloppy_index):
    idx, _ = sloppy_index
    rd = IndexReader(idx)
    for terms in (["w1", "w2"], ["w3", "w7", "w9"], ["alpha", "beta"],
                  ["w5", "w5"]):
        assert rd.sloppy_phrase_topk(terms, 50, slop=0) == \
            rd.phrase_topk(terms, 50), terms


def test_sloppy_is_order_sensitive_and_monotone(sloppy_index):
    idx, _ = sloppy_index
    rd = IndexReader(idx)
    fwd = {d for d, _ in rd.sloppy_phrase_topk(["alpha", "beta"], 100,
                                               slop=NEAR_WINDOW_MAX)}
    rev = {d for d, _ in rd.sloppy_phrase_topk(["beta", "alpha"], 100,
                                               slop=NEAR_WINDOW_MAX)}
    # crafted docs: 400/402/403/404 are alpha-before-beta; 401 is reversed
    assert {400, 402, 403, 404} <= fwd and 401 not in fwd
    assert 401 in rev
    # widening the slop can only grow the match set
    prev: set[int] = set()
    for slop in (0, 1, 2, 3, 10):
        cur = {d for d, _ in rd.sloppy_phrase_topk(["alpha", "beta"], 100,
                                                   slop=slop)}
        assert prev <= cur, slop
        prev = cur
    # and the exact span boundaries hold on the crafted docs
    s0 = {d for d, _ in rd.sloppy_phrase_topk(["alpha", "beta"], 100, 0)}
    s1 = {d for d, _ in rd.sloppy_phrase_topk(["alpha", "beta"], 100, 1)}
    s3 = {d for d, _ in rd.sloppy_phrase_topk(["alpha", "beta"], 100, 3)}
    assert {400, 404} == {d for d in s0 if d >= 400}
    assert {400, 402, 404} == {d for d in s1 if d >= 400}
    assert {400, 402, 403, 404} == {d for d in s3 if d >= 400}


def test_sloppy_guards(sloppy_index):
    idx, _ = sloppy_index
    rd = IndexReader(idx)
    assert rd.sloppy_phrase_topk([], 10, slop=2) == []
    assert rd.sloppy_phrase_topk(["w1"], 10, slop=-1) == []
    assert rd.sloppy_phrase_topk(["w1"], 0, slop=1) == []
    with pytest.raises(ValueError):
        rd.sloppy_phrase_topk(["w1", "w2"], 10, slop=NEAR_WINDOW_MAX + 1)


def test_parse_query_sloppy_mode():
    assert parse_query('"alpha beta"~2') == ("sloppy", ["alpha", "beta"], 2)
    assert parse_query('"alpha beta" ~2') == ("sloppy", ["alpha", "beta"], 2)
    assert parse_query('"a b"~0') == ("sloppy", ["a", "b"], 0)
    assert parse_query('"a b"~0000000005') == ("sloppy", ["a", "b"], 5)
    big = parse_query('"a b"~99999999999')
    assert big == ("sloppy", ["a", "b"], NEAR_WINDOW_MAX)
    # plain quoted stays exact phrase; a bare ~ with NO digits is not
    # sloppy syntax — the chunk falls through to the fuzzy (~) route,
    # the pre-sloppy behavior, pinned so the precedence cannot drift
    assert parse_query('"alpha beta"') == ("phrase", ["alpha", "beta"], None)
    assert parse_query('"alpha beta"~') == \
        ("expand", (["alpha"], [("beta", 1)], [], [], []), None)
    # multi-quote queries are NOT one merged sloppy phrase (the phrase
    # body excludes interior quotes) — they keep their pre-sloppy parse
    assert parse_query('"new york" "los angeles"~1') == \
        ("expand", (["new", "york", "los"], [("angeles", 1)], [], [], []), None)


def test_search_routes_sloppy(sloppy_index):
    idx, _ = sloppy_index
    rd = IndexReader(idx)
    assert search(rd, '"alpha beta"~3', 50) == \
        rd.sloppy_phrase_topk(["alpha", "beta"], 50, slop=3)
    assert search(rd, '"alpha beta"~0', 50) == \
        rd.phrase_topk(["alpha", "beta"], 50)
