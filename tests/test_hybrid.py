"""Hybrid BM25 + vector retrieval (RRF fusion) — kernel + end-to-end oracle.

The end-to-end check fuses the real index's BM25 leg with the real
embedding column's cosine leg and compares against a single-process brute
recomputation of BOTH legs and the fusion — the same oracle style as the
other retrieval suites (no engine code on the oracle side).
"""

from __future__ import annotations

import math
import os
from collections import Counter

import numpy as np
import pyarrow.parquet as pq
import pytest

from wikirec_ray.pipelines.hybrid import RRF_K_DEFAULT, hybrid_topk, rrf_fuse
from wikirec_ray.schema import BM25_B, BM25_K1


# ---------------------------------------------------------------------------
# rrf_fuse kernel
# ---------------------------------------------------------------------------


def test_rrf_fuse_two_legs_hand_computed():
    # leg A ranks: 10, 20, 30 ; leg B ranks: 20, 40
    out = rrf_fuse([[10, 20, 30], [20, 40]], k=10, rrf_k=60)
    by_doc = {d: (s, r) for d, s, r in out}
    assert by_doc[20] == (1 / 62 + 1 / 61, (2, 1))
    assert by_doc[10] == (1 / 61, (1, 0))
    assert by_doc[40] == (1 / 62, (0, 2))
    assert by_doc[30] == (1 / 63, (3, 0))
    # doc 20 is in both legs -> wins; the rest order by their single rank
    assert [d for d, _, _ in out] == [20, 10, 40, 30]


def test_rrf_fuse_k_truncates_and_three_legs():
    out = rrf_fuse([[1, 2], [2, 3], [3, 1]], k=2, rrf_k=0)
    # doc1: 1/1 + 1/2 = 1.5 ; doc2: 1/2 + 1/1 = 1.5 ; doc3: 1/2 + 1/1 = 1.5
    # all tie -> id ASC, k=2 keeps docs 1, 2
    assert [d for d, _, _ in out] == [1, 2]
    assert out[0][2] == (1, 0, 2)  # per-leg ranks, 0 = absent


def test_rrf_fuse_validates():
    with pytest.raises(ValueError, match="twice"):
        rrf_fuse([[1, 1]], k=5)
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([[1]], k=0)
    with pytest.raises(ValueError, match="rrf_k"):
        rrf_fuse([[1]], k=1, rrf_k=-1)
    assert rrf_fuse([[], []], k=3) == []


# ---------------------------------------------------------------------------
# end-to-end vs brute oracle
# ---------------------------------------------------------------------------

QUERIES = [
    (0, ["spark", "join"]),
    (1, ["window", "merge", "sort"]),
    (2, ["the", "vector"]),
]
K, LEG_N = 8, 20


def _brute_bm25_leg(toks: dict[int, list[str]], terms: list[str], n: int) -> list[int]:
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
    scores = {}
    for d in toks:
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
    ranked = sorted(scores.items(), key=lambda kv: (-round(kv[1], 9), kv[0]))
    return [d for d, _ in ranked[:n]]


def _brute_vec_leg(ids: np.ndarray, mat: np.ndarray, qv: np.ndarray, n: int) -> list[int]:
    qn = qv / np.linalg.norm(qv)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = mn @ qn
    order = sorted(range(len(ids)), key=lambda i: (-round(float(sims[i]), 6), ids[i]))
    return [int(ids[i]) for i in order[:n]]


@pytest.fixture(scope="module")
def emb_table(sf_dir):
    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    ids = np.asarray(t["vec_id"].to_pylist(), np.int64)
    mat = np.asarray(t["embedding"].to_pylist(), np.float64)
    return ids, mat


def _expected(toks, ids, mat, emb_rows: set[int] | None = None):
    keep = np.ones(len(ids), bool)
    if emb_rows is not None:
        keep = np.isin(ids, sorted(emb_rows))
    kids, kmat = ids[keep], mat[keep]
    exp = []
    for qid, terms in QUERIES:
        qv = mat[list(ids).index(qid)]
        legs = [
            _brute_bm25_leg(toks, terms, LEG_N),
            _brute_vec_leg(kids, kmat, qv, LEG_N),
        ]
        for doc, rrf, (br, vr) in rrf_fuse(legs, K, RRF_K_DEFAULT):
            exp.append((qid, doc, round(rrf, 6), br, vr))
    return exp


def _run(built_index, emb_ds, ids, mat):
    specs = [(qid, terms, mat[list(ids).index(qid)]) for qid, terms in QUERIES]
    out = hybrid_topk(built_index[0], emb_ds, specs, k=K, leg_n=LEG_N)
    return list(
        zip(
            out["query_id"].to_pylist(),
            out["doc_id"].to_pylist(),
            out["rrf_score"].to_pylist(),
            out["bm25_rank"].to_pylist(),
            out["vec_rank"].to_pylist(),
        )
    )


def test_hybrid_topk_matches_brute(ray_session, built_index, sf_dir, corpus_tokens, emb_table):
    import ray.data

    ids, mat = emb_table
    emb_ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    assert _run(built_index, emb_ds, ids, mat) == _expected(corpus_tokens, ids, mat)


def test_hybrid_partial_embedding_coverage(
    ray_session, built_index, sf_dir, corpus_tokens, emb_table
):
    """Only half the corpus carries vectors (the sf0.1 shape): lexical-only
    docs still rank via their BM25 term; embedded docs fuse both."""
    import pyarrow.compute as pc

    import ray.data

    ids, mat = emb_table
    half = int(ids.max()) // 2
    emb_ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet")
    ).map_batches(
        lambda b: b.filter(pc.less(b["vec_id"], half)), batch_format="pyarrow"
    )
    got = _run(built_index, emb_ds, ids, mat)
    assert got == _expected(corpus_tokens, ids, mat, emb_rows=set(range(half)))
    assert all(doc < half for _, doc, _, _, vr in got if vr > 0)
    assert any(vr == 0 for *_, vr in got)  # lexical-only docs present


def test_hybrid_validates(ray_session, built_index, sf_dir, emb_table):
    import ray.data

    ids, mat = emb_table
    emb_ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
    with pytest.raises(ValueError, match="leg_n"):
        hybrid_topk(built_index[0], emb_ds, [(0, ["a"], mat[0])], k=5, leg_n=3)
    with pytest.raises(ValueError, match="unique"):
        hybrid_topk(
            built_index[0], emb_ds, [(0, ["a"], mat[0]), (0, ["b"], mat[1])], k=2, leg_n=5
        )
