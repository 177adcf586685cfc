"""Hybrid retrieval: BM25 + embedding cosine fused by Reciprocal Rank Fusion.

Modern fulltext tiers (Elasticsearch 8 `rrf`, Vespa, Azure AI Search) answer
a query with TWO rankers — lexical BM25 over the inverted index and cosine
over a document-embedding column — and fuse the two rank lists with
Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):

    rrf(d) = sum over legs containing d of 1 / (rrf_k + rank_leg(d))

Rank fusion uses RANKS, never raw scores, so the legs need no score
calibration (BM25 sums and cosines live on incomparable scales).

Scale shape: each leg is the already-distributed engine path — the BM25 leg
runs through the ``BM25Scorer`` actor pool (`pipelines/query.py`), the
vector leg through ``brute_force_topk``'s per-batch partial top-k (or the
IVF partitioned layout for corpus scale — `pipelines/ann.ivf_topk_
partitioned` reads only probed partitions).  Fusion itself consumes only
the O(queries x leg_n) leg RESULTS — bounded like any top-k merge, never
corpus-sized — so it runs driver-side by design.

The reference has no hybrid path (its only ranker is the dense sim-matrix
scan, `/root/reference/src/wikirec/model.py:258-290`); this operator is part
of the engine's web-scale surface, not reference parity.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data

RRF_K_DEFAULT = 60  # the SIGIR-2009 constant; every production default


def rrf_fuse(
    legs: Sequence[Sequence[int]], k: int, rrf_k: int = RRF_K_DEFAULT
) -> list[tuple[int, float, tuple[int, ...]]]:
    """Fuse per-leg rank lists into the top-k by RRF score.

    ``legs[i]`` is leg i's doc ids in rank order (rank = position + 1,
    ids unique within a leg).  Returns ``(doc_id, rrf_score, ranks)``
    rows, where ``ranks[i]`` is the doc's 1-based rank in leg i or 0 if
    absent, ordered by ``(round(rrf, 9) DESC, doc_id ASC)`` — the same
    rounded-score tie contract as every other retrieval route, so the SQL
    oracle replays the ordering exactly.  Works for any number of legs
    (a third leg — e.g. a phrase or recency ranker — fuses the same way).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if rrf_k < 0:
        raise ValueError("rrf_k must be >= 0")
    n_legs = len(legs)
    ranks: dict[int, list[int]] = {}
    for li, leg in enumerate(legs):
        seen: set[int] = set()
        for pos, doc in enumerate(leg, start=1):
            doc = int(doc)
            if doc in seen:
                raise ValueError(f"leg {li} ranks doc {doc} twice")
            seen.add(doc)
            ranks.setdefault(doc, [0] * n_legs)[li] = pos
    fused = [
        (doc, sum(1.0 / (rrf_k + r) for r in rs if r), tuple(rs))
        for doc, rs in ranks.items()
    ]
    fused.sort(key=lambda t: (-round(t[1], 9), t[0]))
    return fused[:k]


def _vector_leg_ranks(
    emb_ds: ray.data.Dataset,
    query_ids: list[int],
    query_vecs: np.ndarray,
    leg_n: int,
    id_col: str,
    vec_col: str,
) -> dict[int, list[int]]:
    """query_id -> neighbor ids in cosine rank order (top ``leg_n``).

    Candidate generation is the distributed per-batch partial top-k of
    ``brute_force_topk``; this helper only re-derives the deterministic
    rank order (``round(cos, 6) DESC, id ASC`` — the ANN oracle contract)
    from the O(Q x leg_n) result rows, because ``map_groups`` output
    blocks carry no cross-group order guarantee.
    """
    from wikirec_ray.pipelines.ann import brute_force_topk

    rows = brute_force_topk(
        emb_ds,
        query_ids,
        query_vecs,
        k=leg_n,
        id_col=id_col,
        vec_col=vec_col,
        exclude_self=False,  # the query vector is "the query", not a corpus row
        metric="cosine",
    ).take_all()
    per_q: dict[int, list[tuple[float, int]]] = {int(q): [] for q in query_ids}
    for r in rows:
        per_q[int(r["query_id"])].append((float(r["cos_sim"]), int(r["neighbor_id"])))
    out: dict[int, list[int]] = {}
    for q, hits in per_q.items():
        hits.sort(key=lambda t: (-round(t[0], 6), t[1]))
        out[q] = [d for _, d in hits[:leg_n]]
    return out


def hybrid_topk(
    index_dir: str,
    emb_ds: ray.data.Dataset,
    query_specs: Sequence[tuple[int, list[str], np.ndarray]],
    k: int = 10,
    leg_n: int = 30,
    rrf_k: int = RRF_K_DEFAULT,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int = 2,
) -> pa.Table:
    """RRF-fused BM25 + cosine top-k per query.

    ``query_specs`` = (query_id, terms, query_vector) triples: the lexical
    and dense forms of the same query.  Each leg retrieves its own top
    ``leg_n`` (deeper than ``k`` so a doc ranked moderately in BOTH legs
    can beat a doc ranked high in one — the point of fusion), then
    ``rrf_fuse`` combines them.

    A doc missing from a leg (not retrieved, or simply not embedded — at
    scale only part of the corpus may carry vectors) contributes only its
    present-leg term, with rank 0 recorded in the absent column.

    Output: (query_id, doc_id, rrf_score, bm25_rank, vec_rank), rrf_score
    rounded to 6 dp, ordered within each query by the fused contract.
    """
    if leg_n < k:
        raise ValueError("leg_n must be >= k (legs feed the fused top-k)")
    from wikirec_ray.pipelines.query import score_queries_dataset

    qids = [int(q) for q, _, _ in query_specs]
    if len(set(qids)) != len(qids):
        raise ValueError("query ids must be unique")

    # --- lexical leg: the distributed BM25 scorer pool --------------------
    qds = ray.data.from_items(
        [{"query_id": q, "terms": list(t), "k": leg_n} for q, t, _ in query_specs]
    )
    bm25_rows = score_queries_dataset(
        qds, index_dir, k=leg_n, concurrency=concurrency
    ).take_all()
    bm25_leg: dict[int, list[int]] = {q: [] for q in qids}
    for r in sorted(bm25_rows, key=lambda r: (int(r["query_id"]), int(r["rank"]))):
        bm25_leg[int(r["query_id"])].append(int(r["doc_id"]))

    # --- dense leg: distributed partial top-k over the embedding column ---
    qvecs = np.stack([np.asarray(v, np.float64) for _, _, v in query_specs])
    vec_leg = _vector_leg_ranks(emb_ds, qids, qvecs, leg_n, id_col, vec_col)

    # --- fuse (O(Q x leg_n) rows — a top-k merge, not a data-scale op) ----
    out_q: list[int] = []
    out_d: list[int] = []
    out_s: list[float] = []
    out_br: list[int] = []
    out_vr: list[int] = []
    for q in qids:
        for doc, rrf, (br, vr) in rrf_fuse([bm25_leg[q], vec_leg[q]], k, rrf_k):
            out_q.append(q)
            out_d.append(doc)
            out_s.append(round(rrf, 6))
            out_br.append(br)
            out_vr.append(vr)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "doc_id": pa.array(out_d, pa.int64()),
            "rrf_score": pa.array(out_s, pa.float64()),
            "bm25_rank": pa.array(out_br, pa.int64()),
            "vec_rank": pa.array(out_vr, pa.int64()),
        }
    )
