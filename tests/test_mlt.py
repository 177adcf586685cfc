"""More-like-this (tf x idf term selection -> BM25) vs a brute oracle."""

from __future__ import annotations

import math
import os
from collections import Counter

import pyarrow.parquet as pq
import pytest

from wikirec_ray.schema import BM25_B, BM25_K1

M, K = 8, 10


@pytest.fixture(scope="module")
def doc_texts(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    return dict(zip(t["doc_id"].to_pylist(), t["text"].to_pylist()))


def _brute_stats(toks):
    N = len(toks)
    dls = {d: len(ws) for d, ws in toks.items()}
    avgdl = sum(dls.values()) / N
    dfc: Counter = Counter()
    tfs = {}
    for d, ws in toks.items():
        c = Counter(ws)
        tfs[d] = c
        for w in c:
            dfc[w] += 1
    return N, dls, avgdl, dfc, tfs


def _brute_select(toks, src: int, m: int):
    N, _, _, dfc, tfs = _brute_stats(toks)
    scored = []
    for t, n in tfs[src].items():
        idf = math.log(1 + (N - dfc[t] + 0.5) / (dfc[t] + 0.5))
        scored.append((-round(n * idf, 9), t))
    scored.sort()
    return [t for _, t in scored[:m]]


def _brute_mlt(toks, src: int, m: int, k: int):
    N, dls, avgdl, dfc, tfs = _brute_stats(toks)
    terms = _brute_select(toks, src, m)
    scores = {}
    for d in toks:
        if d == src:
            continue
        s = 0.0
        for t in terms:
            tf = tfs[d].get(t, 0)
            if not tf:
                continue
            idf = math.log(1 + (N - dfc[t] + 0.5) / (dfc[t] + 0.5))
            s += idf * tf * (BM25_K1 + 1) / (
                tf + BM25_K1 * (1 - BM25_B + BM25_B * dls[d] / avgdl)
            )
        if round(s, 9) > 0:
            scores[d] = s
    return sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))[:k]


def test_select_query_terms_matches_brute(built_index, corpus_tokens, doc_texts):
    from wikirec_ray.pipelines.query import IndexReader

    reader = IndexReader(built_index[0])
    for src in (0, 7, 23):
        assert reader.select_query_terms(doc_texts[src], M) == _brute_select(
            corpus_tokens, src, M
        )


def test_select_query_terms_skips_oov_and_validates(built_index):
    from wikirec_ray.pipelines.query import IndexReader

    reader = IndexReader(built_index[0])
    got = reader.select_query_terms("Spark! spark JOIN zzzunknownzzz", 10)
    assert "zzzunknownzzz" not in got
    assert set(got) <= {"spark", "join"}
    with pytest.raises(ValueError, match="max_query_terms"):
        reader.select_query_terms("spark", 0)
    assert reader.select_query_terms("zzzunknownzzz only123unknown", 5) == []


def test_more_like_this_matches_brute(built_index, corpus_tokens, doc_texts):
    from wikirec_ray.pipelines.query import IndexReader

    reader = IndexReader(built_index[0])
    for src in (0, 7, 23, 41):
        got = reader.more_like_this(doc_texts[src], k=K, max_query_terms=M, exclude=src)
        want = _brute_mlt(corpus_tokens, src, M, K)
        assert [d for d, _ in got] == [d for d, _ in want]
        for (_, gs), (_, ws) in zip(got, want):
            assert abs(gs - ws) < 1e-9
        assert all(d != src for d, _ in got)


def test_more_like_this_without_exclude_can_return_source(
    built_index, doc_texts
):
    from wikirec_ray.pipelines.query import IndexReader

    reader = IndexReader(built_index[0])
    got = reader.more_like_this(doc_texts[7], k=K, max_query_terms=M)
    # the source doc scores highest against its own characteristic terms
    # on this corpus; without exclusion it is a legal (and top) hit
    assert 7 in [d for d, _ in got]


def test_more_like_this_empty_text(built_index):
    from wikirec_ray.pipelines.query import IndexReader

    reader = IndexReader(built_index[0])
    assert reader.more_like_this("", k=5) == []
