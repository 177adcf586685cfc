"""Query serving: an actor pool holding the immutable index segments (T8).

The reference serves queries from a driver-resident dense sim-matrix
(``/root/reference/src/wikirec/model.py:258-290``); here the index is
**term-sharded across an actor pool**: each ``SegmentServer`` owns a subset
of term partitions (its segment files are loaded once in ``__init__`` and
never mutated), and a query fans out only to the owners of its terms.

Per-query flow (term-at-a-time, distributed):

  terms → route by hash(term) % P → owner actors score their terms against
  their postings (idf · BM25 tf factor, vectorized) and return sparse
  partial score vectors (doc_ids, contribs) → the coordinator accumulates
  into a dense array and takes top-k (same rounding/tie rules as
  ``pipelines/query.py``; results are asserted identical in tests).

Sharding note: term-sharding matches the build layout (one segment per term
partition) and keeps each query touching ≤ |terms| actors.  The classic
alternative — doc-sharding with per-shard WAND and a top-k merge — trades
fan-out for smaller partials; at 10^12 docs the partial score vectors here
would be doc-sharded too (each owner returns its per-RANGE top
contributions instead of full postings).  norms (doc lengths) are loaded by
every server for the ranges it scores; in this single-node sandbox that is
the whole norms table.
"""

from __future__ import annotations

import math
import zlib

import numpy as np
import ray

from wikirec_ray.schema import BM25_B, BM25_K1, N_TERM_PARTITIONS


@ray.remote
class SegmentServer:
    """Owns a set of term partitions; scores query terms against them."""

    def __init__(self, index_dir: str, tparts: list[int]):
        from wikirec_ray.state.segments import SegmentReader, load_norms, load_stats

        import os

        self.stats = load_stats(index_dir)
        self.norms = load_norms(index_dir)
        # a tpart with no terms has no segment file (sparse vocabularies);
        # missing readers score as empty
        self.readers = {}
        for t in tparts:
            p = os.path.join(index_dir, "segments", f"seg-{t:03d}.parquet")
            if os.path.exists(p):
                self.readers[t] = SegmentReader(p)

    def score_terms(self, terms_with_idf: list[tuple[str, int, float]]):
        """[(term, tpart, idf)] -> list of (doc_ids uint64, contribs f64)."""
        avgdl = self.stats["avgdl"]
        out = []
        for term, tpart, idf in terms_with_idf:
            reader = self.readers.get(tpart)
            if reader is None:
                out.append((np.empty(0, np.uint64), np.empty(0, np.float64)))
                continue
            doc_ids, tfs = reader.postings(term)
            if len(doc_ids) == 0:
                out.append((doc_ids, np.empty(0, np.float64)))
                continue
            tf = tfs.astype(np.float64)
            dl = self.norms[doc_ids.astype(np.int64)].astype(np.float64)
            contrib = idf * tf * (BM25_K1 + 1.0) / (
                tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / avgdl)
            )
            out.append((doc_ids, contrib))
        return out


class DistributedQueryEngine:
    """Coordinator over a SegmentServer pool; the serving-path analog of
    ``IndexReader`` (results must match it exactly)."""

    def __init__(self, index_dir: str, pool_size: int = 4):
        from wikirec_ray.state.segments import load_df, load_stats

        self.stats = load_stats(index_dir)
        self.n_tparts = int(self.stats.get("n_term_partitions", N_TERM_PARTITIONS))
        self.df = load_df(index_dir)
        self.n_docs = self.stats["n_docs"]
        pool_size = max(1, min(pool_size, self.n_tparts))
        assign: list[list[int]] = [[] for _ in range(pool_size)]
        for t in range(self.n_tparts):
            assign[t % pool_size].append(t)
        self.owner_of = {t: t % pool_size for t in range(self.n_tparts)}
        self.servers = [
            SegmentServer.remote(index_dir, tparts) for tparts in assign
        ]

    def _idf(self, term: str) -> float:
        df = self.df.get(term, 0)
        if df == 0:
            return 0.0
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        by_server: dict[int, list[tuple[str, int, float]]] = {}
        for term in terms:
            idf = self._idf(term)
            if idf == 0.0:
                continue
            tpart = zlib.crc32(term.encode("utf-8")) % self.n_tparts
            by_server.setdefault(self.owner_of[tpart], []).append((term, tpart, idf))
        if not by_server:
            return []
        futures = {
            sid: self.servers[sid].score_terms.remote(batch)
            for sid, batch in by_server.items()
        }
        scores = np.zeros(self.n_docs, dtype=np.float64)
        for sid, fut in futures.items():
            for doc_ids, contribs in ray.get(fut):
                if len(doc_ids):
                    scores[doc_ids.astype(np.int64)] += contribs
        from wikirec_ray.pipelines.query import topk_from_dense

        return topk_from_dense(scores, k)

    def shutdown(self):
        for s in self.servers:
            ray.kill(s)
        self.servers = []
