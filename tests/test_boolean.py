"""Boolean retrieval (Lucene-style MUST / MUST_NOT clauses).

The reference has no boolean surface (its ``recommend`` is similarity-only,
``/root/reference/src/wikirec/model.py:294-383``); this is the engine
extension a fulltext tier needs for required/excluded terms.  Contract
pinned here:

- clauses FILTER, BM25 over should+must occurrences SCORES (the same
  filter-vs-score split as phrase/NEAR, so results stay SQL-replayable);
- duplicates contribute once per occurrence on every route (the r5
  engine-wide parity rule); candidacy uses the distinct clause sets;
- absent must term -> empty; must_not dominates must; no positive clause
  -> empty; boolean with no must/must_not degrades to plain BM25;
- range-sharded served results == local reader == brute oracle;
- tombstoned docs never surface.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from wikirec_ray.pipelines.query import IndexReader, parse_query, search
from wikirec_ray.schema import BM25_B, BM25_K1


def _mk_texts(n=360):
    vocab = np.array([f"w{i}" for i in range(20)])
    probs = 1.0 / np.arange(1, 21)
    probs /= probs.sum()
    texts = []
    for i in range(n):
        rng = np.random.default_rng(7000 + i)
        ln = int(rng.integers(6, 60))
        texts.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    return texts


@pytest.fixture(scope="module")
def bool_index(ray_session, tmp_path_factory):
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    texts = _mk_texts()
    ids = [i * 97 for i in range(len(texts))]  # spans several doc ranges
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )
    index_dir = str(tmp_path_factory.mktemp("boolidx"))
    build_index(ds, index_dir, resume=False)
    toks = {i: t.split() for i, t in zip(ids, texts)}
    return index_dir, toks


def _brute_boolean(toks, should, must, must_not, k, msm=0):
    n = len(toks)
    df = Counter(t for tl in toks.values() for t in set(tl))
    avgdl = sum(len(tl) for tl in toks.values()) / n
    scoring = list(should) + list(must)
    out = []
    for i, tl in toks.items():
        present = set(tl)
        if any(m not in present for m in must):
            continue
        if any(x in present for x in must_not):
            continue
        if msm and len(set(should) & present) < msm:
            continue
        s = 0.0
        for t in scoring:
            tf = tl.count(t)
            if tf and df[t]:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * len(tl) / avgdl)
                )
        s = round(s, 9)
        if s > 0:
            out.append((i, s))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


CASES = [
    (["w0", "w1"], ["w2"], []),
    (["w0"], [], ["w1"]),
    (["w3", "w4"], ["w0", "w5"], ["w19"]),
    ([], ["w1", "w2"], []),                 # pure conjunctive
    (["w0", "w0"], [], []),                 # duplicate should occurrences
    (["w6"], ["w7", "w7"], []),             # duplicate must occurrences
    (["w8"], ["nosuchterm"], []),           # absent must -> empty
    (["w9"], [], ["nosuchterm"]),           # absent must_not is a no-op
    (["w10"], ["w11"], ["w11"]),            # must_not dominates must
    ([], [], ["w0"]),                       # no positive clause -> empty
    (["w18", "w19"], ["w17"], ["w0", "w1"]),
]


@pytest.mark.parametrize("k", [1, 10, 500])
def test_boolean_topk_matches_brute(bool_index, k):
    index_dir, toks = bool_index
    reader = IndexReader(index_dir)
    for should, must, must_not in CASES:
        got = reader.boolean_topk(should, must, must_not, k)
        want = _brute_boolean(toks, should, must, must_not, k)
        assert got == want, (should, must, must_not, k)


def test_boolean_degenerates_to_bm25(bool_index):
    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    assert reader.boolean_topk(["w0", "w3"], [], [], 10) == reader.topk(
        ["w0", "w3"], 10
    )
    assert reader.boolean_topk([], [], [], 10) == []


def test_parse_query_boolean():
    assert parse_query("join +table -slow") == (
        "boolean", (["join"], ["table"], ["slow"]), None
    )
    # +/- operate only at chunk start: hyphenated words stay plain BM25
    assert parse_query("Spark-JOIN!") == ("bm25", ["spark", "join"], None)
    # a multi-token chunk's tokens all inherit its clause
    assert parse_query("+New-York pizza") == (
        "boolean", (["pizza"], ["new", "york"], []), None
    )
    # bare operators and empty bodies are not clauses
    assert parse_query("a + - b") == ("bm25", ["a", "b"], None)
    assert parse_query("-...") == ("bm25", [], None)
    # phrase and NEAR wrappers win over +/- inside them
    assert parse_query('"a +b"') == ("phrase", ["a", "b"], None)
    assert parse_query("NEAR/3(a -b)") == ("near", ["a", "b"], 3)
    # pure-exclusion queries parse but cannot match
    assert parse_query("-slow") == ("boolean", ([], [], ["slow"]), None)


def test_search_routes_boolean(bool_index):
    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    assert search(reader, "w0 +W2! -w1") == reader.boolean_topk(
        ["w0"], ["w2"], ["w1"], 10
    )
    assert search(reader, "-w1") == []


def test_range_sharded_boolean_equals_local(bool_index, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    eng = RangeShardedQueryEngine(index_dir, pool_size=3)
    try:
        for should, must, must_not in CASES:
            assert eng.boolean_topk(should, must, must_not, 10) == \
                reader.boolean_topk(should, must, must_not, 10), (
                    should, must, must_not)
        # query-string route through the served engine
        q = "w0 +w2 -w19"
        assert search(eng, q) == search(reader, q)
    finally:
        eng.shutdown()


# minimum_should_match (ES minimum_should_match / Lucene quorum):
# (should, must, must_not, msm) — quorum counts DISTINCT should terms,
# composes with must/must_not, and an OOV should term raises the arity
# without ever being satisfiable
MSM_CASES = [
    (["w0", "w1", "w3"], [], [], 2),
    (["w0", "w1", "w3"], [], [], 3),
    (["w3", "w4", "w6"], ["w0"], ["w19"], 2),   # quorum + must + must_not
    (["w0", "w0", "w1"], [], [], 2),            # dups count once in quorum
    (["w0", "w0"], [], [], 2),                  # 1 distinct < msm -> empty
    (["w0", "nosuchterm"], [], [], 2),          # OOV can't fill the quorum
    (["w5", "w8"], [], [], 3),                  # msm > arity -> empty
    (["w2"], ["w1", "w7"], [], 1),              # quorum with must present
]


def test_min_should_match_matches_brute(bool_index):
    index_dir, toks = bool_index
    reader = IndexReader(index_dir)
    for should, must, must_not, msm in MSM_CASES:
        got = reader.boolean_topk(should, must, must_not, 500,
                                  min_should_match=msm)
        want = _brute_boolean(toks, should, must, must_not, 500, msm=msm)
        assert got == want, (should, must, must_not, msm)
    # explicit empties: quorum over the distinct arity / only-dup should
    assert reader.boolean_topk(["w0", "w0"], [], [], 10,
                               min_should_match=2) == []
    assert reader.boolean_topk(["w0", "nosuchterm"], [], [], 500,
                               min_should_match=2) == []


def test_min_should_match_boundary_equivalences(bool_index):
    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    # msm=0 and msm=1 are both the plain OR for should-only queries (a
    # scoring doc already has >= 1 should posting)
    plain = reader.boolean_topk(["w2", "w5"], [], [], 500)
    assert reader.boolean_topk(["w2", "w5"], [], [], 500,
                               min_should_match=1) == plain
    # msm == distinct arity == pure conjunction over the same scoring
    # multiset (no duplicate occurrences, so the multisets agree)
    assert reader.boolean_topk(["w2", "w5"], [], [], 500,
                               min_should_match=2) == \
        reader.boolean_topk([], ["w2", "w5"], [], 500)


def test_min_should_match_validation(bool_index):
    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    for bad in (-1, 1.5, "2", True):
        with pytest.raises(ValueError, match="min_should_match"):
            reader.boolean_topk(["w0"], [], [], 10, min_should_match=bad)


def test_min_should_match_served_and_search(bool_index, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    index_dir, _ = bool_index
    reader = IndexReader(index_dir)
    eng = RangeShardedQueryEngine(index_dir, pool_size=3)
    try:
        for should, must, must_not, msm in MSM_CASES:
            assert eng.boolean_topk(
                should, must, must_not, 10, min_should_match=msm
            ) == reader.boolean_topk(
                should, must, must_not, 10, min_should_match=msm
            ), (should, must, must_not, msm)
        # the search() string surface: a plain term list + quorum routes
        # through the should-only boolean path, identically on both engines
        want = reader.boolean_topk(["w0", "w1", "w3"], [], [], 10,
                                   min_should_match=2)
        assert search(reader, "w0 w1 w3", min_should_match=2) == want
        assert search(eng, "w0 w1 w3", min_should_match=2) == want
        # quorum on an explicit boolean query
        assert search(eng, "w3 w4 w6 +w0 -w19", min_should_match=2) == \
            reader.boolean_topk(["w3", "w4", "w6"], ["w0"], ["w19"], 10,
                                min_should_match=2)
        with pytest.raises(ValueError, match="min_should_match requires"):
            search(reader, '"w0 w1"', min_should_match=2)
    finally:
        eng.shutdown()


def test_boolean_respects_tombstones(bool_index, tmp_path):
    import shutil

    from wikirec_ray.stages.lifecycle import delete_docs

    index_dir, toks = bool_index
    snap = str(tmp_path / "idx")
    shutil.copytree(index_dir, snap)
    hits = IndexReader(snap).boolean_topk(["w0"], ["w2"], [], 5)
    assert hits
    victim = hits[0][0]
    delete_docs(snap, [victim])
    after = IndexReader(snap).boolean_topk(["w0"], ["w2"], [], 5)
    assert victim not in [d for d, _ in after]
    # surviving docs' scores are bit-for-bit unchanged (stats frozen)
    kept = {d: s for d, s in hits if d != victim}
    assert all(s == kept[d] for d, s in after if d in kept)
