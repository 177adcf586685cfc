"""Build-time frequent-bigram posting precompute (VERDICT r04 item 1).

``build_index(precompute_bigrams=K)`` materializes posting lists for the K
highest-document-frequency adjacent pairs as composite terms ("w1 w2"), so
a two-term phrase whose pair is precomputed is answered by a plain posting
lookup — no position-stream decode (the stopword-pair cold path).

Pinned here:
- ``top_bigrams_by_df`` equals a brute single-process DF count with the
  deterministic (df desc, w1, w2) ordering;
- precomputed phrase results are IDENTICAL to the positional path and to
  the brute adjacency+BM25 oracle, including on a non-positional index
  (proof the fast path never touches positions — a non-positional index
  has none to touch);
- BM25/WAND and corpus stats are unchanged by the composite postings
  (doc lengths count unigrams only);
- layout is parallelism-invariant; resume skips with the same K and fully
  rebuilds on a K flip; ``append_index`` emits delta composite postings
  from the frozen build-time pair set and equals a full rebuild;
- the range-sharded serving engine routes precomputed pairs to the
  composite chunks and matches the local reader exactly.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from wikirec_ray.pipelines.query import IndexReader
from wikirec_ray.schema import BM25_B, BM25_K1

K_PRE = 8


def _mk_texts(n=400):
    """Per-id deterministic zipf-ish corpus (shared rng across calls makes
    append != rebuild look like an engine bug — memory lesson r4)."""
    vocab = np.array([f"w{i}" for i in range(20)])
    probs = 1.0 / np.arange(1, 21)
    probs /= probs.sum()
    texts = []
    for i in range(n):
        rng = np.random.default_rng(1000 + i)
        ln = int(rng.integers(6, 60))
        texts.append(" ".join(rng.choice(vocab, size=ln, p=probs)))
    return texts


def _brute_pair_df(texts):
    c = Counter()
    for t in texts:
        tl = t.split()
        c.update({(a, b) for a, b in zip(tl, tl[1:])})
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))


def _brute_phrase(toks, phr, k):
    n = len(toks)
    df = Counter(t for tl in toks for t in set(tl))
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for i, tl in enumerate(toks):
        if not any(tl[j : j + len(phr)] == phr
                   for j in range(len(tl) - len(phr) + 1)):
            continue
        s = 0.0
        for t in phr:
            tf = tl.count(t)
            if tf:
                idf = math.log(1.0 + (n - df[t] + 0.5) / (df[t] + 0.5))
                s += idf * tf * (BM25_K1 + 1.0) / (
                    tf + BM25_K1 * (1 - BM25_B + BM25_B * len(tl) / avgdl)
                )
        out.append((i, round(s, 9)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


@pytest.fixture(scope="module")
def corpora(ray_session, tmp_path_factory):
    import ray.data

    from wikirec_ray.stages.index_build import build_index

    texts = _mk_texts()
    ids = [i * 53 for i in range(len(texts))]  # spans 3 doc ranges

    def mk(parallelism=None):
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids, pa.int64()),
                      "text": pa.array(texts, pa.string())})
        )
        return ds.repartition(parallelism) if parallelism else ds

    root = tmp_path_factory.mktemp("bigram")
    idx_pos = str(root / "pos")
    idx_pre = str(root / "pre")
    idx_pre_nopos = str(root / "pre-nopos")
    build_index(mk(), idx_pos, resume=False, store_positions=True)
    m_pre = build_index(mk(), idx_pre, resume=False, store_positions=True,
                        precompute_bigrams=K_PRE)
    build_index(mk(), idx_pre_nopos, resume=False, store_positions=False,
                precompute_bigrams=K_PRE)
    return {"texts": texts, "ids": ids, "mk": mk, "idx_pos": idx_pos,
            "idx_pre": idx_pre, "idx_pre_nopos": idx_pre_nopos,
            "m_pre": m_pre, "root": root}


def test_top_bigrams_by_df_matches_brute(corpora):
    from wikirec_ray.stages.phrases import top_bigrams_by_df

    got = top_bigrams_by_df(corpora["mk"](), K_PRE)
    want = [p for p, _ in _brute_pair_df(corpora["texts"])[:K_PRE]]
    assert got == want
    assert top_bigrams_by_df(corpora["mk"](), 0) == []


def test_precomputed_phrase_equals_positional_and_brute(corpora):
    texts, ids = corpora["texts"], corpora["ids"]
    toks = [t.split() for t in texts]
    id_of = dict(enumerate(ids))
    rd_pos = IndexReader(corpora["idx_pos"])
    rd_pre = IndexReader(corpora["idx_pre"])
    rd_np = IndexReader(corpora["idx_pre_nopos"])

    ranked = _brute_pair_df(texts)
    pre_pairs = [p for p, _ in ranked[:K_PRE]]
    assert rd_pre.bigrams == {f"{a} {b}" for a, b in pre_pairs}
    assert corpora["m_pre"]["stats"]["n_bigrams"] == K_PRE

    for a, b in pre_pairs[:4] + [pre_pairs[-1]]:
        phr = [a, b]
        want = [(id_of[d], round(s, 6))
                for d, s in _brute_phrase(toks, phr, 10)]
        for rd in (rd_pre, rd_np):
            got = [(d, round(s, 6)) for d, s in rd.phrase_topk(phr, 10)]
            assert got == want, (phr, rd.index_dir)
        assert [(d, round(s, 6)) for d, s in rd_pos.phrase_topk(phr, 10)] \
            == want
        # the fast path is the one being exercised
        fast = rd_pre._precomputed_phrase_topk(phr, f"{a} {b}", 10)
        assert fast == rd_pre.phrase_topk(phr, 10)

    # non-precomputed pair: positional fallback on idx_pre, loud refusal on
    # the non-positional index
    non_pre = next(p for p, _ in ranked[K_PRE:] if list(p) not in
                   [list(q) for q in pre_pairs])
    phr = list(non_pre)
    assert rd_pre.phrase_topk(phr, 10) == rd_pos.phrase_topk(phr, 10)
    with pytest.raises(ValueError, match="store_positions"):
        rd_np.phrase_topk(phr, 10)

    # 3-term phrases still take the positional path on idx_pre
    phr3 = ["w0", "w1", "w0"]
    assert rd_pre.phrase_topk(phr3, 10) == rd_pos.phrase_topk(phr3, 10)


def test_bm25_and_stats_unchanged_by_composites(corpora):
    rd_pos = IndexReader(corpora["idx_pos"])
    rd_pre = IndexReader(corpora["idx_pre"])
    assert rd_pre.stats["n_docs"] == rd_pos.stats["n_docs"]
    assert rd_pre.stats["total_tokens"] == rd_pos.stats["total_tokens"]
    assert rd_pre.stats["avgdl"] == rd_pos.stats["avgdl"]
    assert np.array_equal(rd_pre.norms, rd_pos.norms)
    for q in (["w0"], ["w1", "w5"], ["w0", "w3", "w9"]):
        assert rd_pre.topk(q, 10) == rd_pos.topk(q, 10)
        assert rd_pre.topk_wand(q, 10) == rd_pos.topk_wand(q, 10)
    # unigram dfs identical; composites additive
    for t, v in rd_pos.df.items():
        assert rd_pre.df[t] == v
    extra = set(rd_pre.df) - set(rd_pos.df)
    assert extra == rd_pre.bigrams


def test_parallelism_invariance_and_resume(corpora, tmp_path):
    from wikirec_ray.stages.index_build import build_index

    rd_pre = IndexReader(corpora["idx_pre"])
    idx13 = str(tmp_path / "pre13")
    build_index(corpora["mk"](13), idx13, resume=False,
                store_positions=True, precompute_bigrams=K_PRE)
    rd13 = IndexReader(idx13)
    assert rd13.bigrams == rd_pre.bigrams
    top = sorted(rd_pre.bigrams)[0].split()
    assert rd13.phrase_topk(top, 10) == rd_pre.phrase_topk(top, 10)

    # resume with the same K skips every index partition (the pair list is
    # deterministically re-selected and rewritten)
    m2 = build_index(corpora["mk"](), corpora["idx_pre"], resume=True,
                     store_positions=True, precompute_bigrams=K_PRE)
    assert all(e.get("skipped") for k, e in m2["partitions"].items()
               if e.get("kind") != "bigrams")
    # flipping K rebuilds everything
    m3 = build_index(corpora["mk"](), corpora["idx_pre"], resume=True,
                     store_positions=True, precompute_bigrams=K_PRE + 2)
    assert all(not e.get("skipped", False) for e in m3["partitions"].values())
    # restore the module fixture's layout for later tests
    m4 = build_index(corpora["mk"](), corpora["idx_pre"], resume=True,
                     store_positions=True, precompute_bigrams=K_PRE)
    assert IndexReader(corpora["idx_pre"]).bigrams == rd_pre.bigrams


def test_append_uses_frozen_pair_set(corpora, ray_session, tmp_path):
    import ray.data

    from wikirec_ray.stages.index_build import append_index, build_index

    texts, ids = corpora["texts"], corpora["ids"]
    n_base = 300

    def mk_slice(lo, hi):
        return ray.data.from_arrow(
            pa.table({"doc_id": pa.array(ids[lo:hi], pa.int64()),
                      "text": pa.array(texts[lo:hi], pa.string())})
        )

    idx_inc = str(tmp_path / "inc")
    build_index(mk_slice(0, n_base), idx_inc, resume=False,
                store_positions=True, precompute_bigrams=K_PRE)
    pre_set = IndexReader(idx_inc).bigrams
    append_index(mk_slice(n_base, len(ids)), idx_inc)

    idx_full = str(tmp_path / "full")
    build_index(mk_slice(0, len(ids)), idx_full, resume=False,
                store_positions=True, precompute_bigrams=K_PRE)

    rd_inc, rd_full = IndexReader(idx_inc), IndexReader(idx_full)
    # the appended index keeps the BASE pair set (frozen at build time)
    assert rd_inc.bigrams == pre_set
    # phrase parity holds wherever the pair sets agree
    shared = sorted(rd_inc.bigrams & rd_full.bigrams)
    assert shared, "corpus should keep at least one top pair stable"
    for comp in shared[:3]:
        phr = comp.split()
        assert rd_inc.phrase_topk(phr, 10) == rd_full.phrase_topk(phr, 10)
    # composite dfs for shared pairs match the full rebuild
    for comp in shared:
        assert rd_inc.df[comp] == rd_full.df[comp]


def test_served_precomputed_phrase_matches_local(corpora, ray_session):
    from wikirec_ray.state.server import RangeShardedQueryEngine

    rd_pre = IndexReader(corpora["idx_pre"])
    eng = RangeShardedQueryEngine(corpora["idx_pre"], pool_size=2,
                                  resolver_pool_size=2)
    try:
        assert eng.bigrams == rd_pre.bigrams
        pairs = sorted(rd_pre.bigrams)
        for comp in (pairs[0], pairs[-1]):
            phr = comp.split()
            assert eng.phrase_topk(phr, 10) == rd_pre.phrase_topk(phr, 10)
        # non-precomputed phrases still served via the positional path
        phr3 = ["w0", "w1", "w0"]
        assert eng.phrase_topk(phr3, 10) == rd_pre.phrase_topk(phr3, 10)
    finally:
        eng.shutdown()


def test_subpair_pruned_long_phrases(corpora, ray_session):
    """3+-term phrases whose consecutive sub-pairs are precomputed take the
    candidate-pruning path; results must equal the plain positional index,
    the brute oracle, and the served engine."""
    from wikirec_ray.state.server import RangeShardedQueryEngine

    texts, ids = corpora["texts"], corpora["ids"]
    toks = [t.split() for t in texts]
    id_of = dict(enumerate(ids))
    rd_pos = IndexReader(corpora["idx_pos"])
    rd_pre = IndexReader(corpora["idx_pre"])
    a, b = sorted(rd_pre.bigrams)[0].split()
    phrases = [[a, b, a], [a, b, b], ["w0", a, b], [b, a, b, a]]
    for phr in phrases:
        got = [(d, round(s, 6)) for d, s in rd_pre.phrase_topk(phr, 10)]
        assert got == [(d, round(s, 6)) for d, s in rd_pos.phrase_topk(phr, 10)], phr
        want = [(id_of[d], round(s, 6)) for d, s in _brute_phrase(toks, phr, 10)]
        assert got == want, phr
    eng = RangeShardedQueryEngine(corpora["idx_pre"], pool_size=2)
    try:
        for phr in phrases:
            assert eng.phrase_topk(phr, 10) == rd_pre.phrase_topk(phr, 10), phr
    finally:
        eng.shutdown()


def test_search_query_string_routing(corpora, ray_session):
    """search(): one query string routes to phrase / NEAR / BM25 with the
    indexing tokenizer's normalization, over BOTH the local reader and the
    range-sharded engine."""
    from wikirec_ray.pipelines.query import parse_query, search
    from wikirec_ray.state.server import RangeShardedQueryEngine

    assert parse_query('"table hash"') == ("phrase", ["table", "hash"], None)
    assert parse_query("NEAR/5(Spark JOIN)") == ("near", ["spark", "join"], 5)
    assert parse_query("Spark-JOIN!") == ("bm25", ["spark", "join"], None)
    assert parse_query("   ") == ("bm25", [], None)
    # oversized user windows clamp to the AND-degenerate max, never raise
    assert parse_query("NEAR/99999999999999(a b)")[2] == (1 << 31) - 1
    assert parse_query(f"NEAR/{1 << 31}(a b)")[2] == (1 << 31) - 1
    # leading zeros don't trip the digit-length guard into the clamp
    assert parse_query("NEAR/0000000005(a b)")[2] == 5
    assert parse_query("NEAR/" + "0" * 40 + "7(a b)")[2] == 7
    assert parse_query("NEAR/000(a b)")[2] == 0
    # operator is case-insensitive with optional whitespace, like the terms
    assert parse_query("near/5(Spark JOIN)") == ("near", ["spark", "join"], 5)
    assert parse_query("Near / 5 (a b)") == ("near", ["a", "b"], 5)

    rd = IndexReader(corpora["idx_pre"])
    a, b = sorted(rd.bigrams)[0].split()
    assert search(rd, f'"{a} {b}"') == rd.phrase_topk([a, b], 10)
    assert search(rd, f"NEAR/4({a} {b})") == rd.near_topk([a, b], 10, 4)
    assert search(rd, f"{a.upper()} {b}!") == rd.topk_wand([a, b], 10)
    assert search(rd, "") == []
    assert search(rd, '""') == []
    assert search(rd, f"NEAR/{1 << 40}({a} {b})") == rd.near_topk(
        [a, b], 10, (1 << 31) - 1)
    # duplicate terms hit the same per-occurrence contract on every route
    assert search(rd, f"{a} {a}") == rd.topk([a, a], 10)

    eng = RangeShardedQueryEngine(corpora["idx_pre"], pool_size=2)
    try:
        for q in (f'"{a} {b}"', f"NEAR/4({a} {b})", f"{a} {b}"):
            got = search(eng, q)
            want = search(rd, q)
            # engine BM25 routes to exact topk (no WAND) — identical results
            assert got == want, q
    finally:
        eng.shutdown()
