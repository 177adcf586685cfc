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

from wikirec_ray.schema import (
    FUZZY_EXPANSION_MAX,
    N_TERM_PARTITIONS,
    NEAR_WINDOW_MAX,
)


def _idf_from_df(df: int, n_docs: int) -> float:
    if df == 0:
        return 0.0
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


@ray.remote
class SegmentServer:
    """Owns a set of term partitions; scores query terms against them.

    idf is resolved HERE, from the df rows of the tparts this shard owns
    (``load_df_tparts`` — O(vocab/P) per actor): the coordinator sends raw
    terms and holds no vocabulary-scale state (VERDICT r03 item 2 — a
    whole-vocab coordinator dict is tens of GB at a 10^9-term crawl)."""

    def __init__(self, index_dir: str, tparts: list[int]):
        from wikirec_ray.state.segments import (
            SegmentReader,
            load_df_tparts,
            load_norms,
            load_stats,
            load_tombstones,
        )

        import os

        self.stats = load_stats(index_dir)
        self.n_docs = self.stats["n_docs"]
        self.norms = load_norms(index_dir)
        self.df = load_df_tparts(index_dir, tparts)
        # pending deletes: filtered shard-side so the coordinator never
        # sees a tombstoned doc (stats/df stay frozen until compaction)
        self.tombstones = load_tombstones(index_dir)
        # a tpart with no terms has no segment file (sparse vocabularies);
        # missing readers score as empty
        self.readers = {}
        for t in tparts:
            p = os.path.join(index_dir, "segments", f"seg-{t:03d}.parquet")
            if os.path.exists(p):
                self.readers[t] = SegmentReader(p)

    def score_terms(
        self, terms_with_tpart: list[tuple[str, int]],
        weights: list[float] | None = None,
    ):
        """[(term, tpart)] -> list of (doc_ids uint64, contribs f64).
        ``weights`` (aligned, optional) scale each term's idf BEFORE the
        shared ``bm25_contrib`` kernel — the same evaluation order as the
        local reader's ``idf(term) * wsum``, so weighted serving results
        are bit-identical, not merely ulp-close."""
        from wikirec_ray.pipelines.query import bm25_contrib
        from wikirec_ray.state.segments import alive_mask

        avgdl = self.stats["avgdl"]
        out = []
        for i, (term, tpart) in enumerate(terms_with_tpart):
            idf = _idf_from_df(self.df.get(term, 0), self.n_docs)
            if weights is not None:
                idf *= weights[i]
            reader = self.readers.get(tpart)
            if reader is None or idf == 0.0:
                out.append((np.empty(0, np.uint64), np.empty(0, np.float64)))
                continue
            doc_ids, tfs = reader.postings(term)
            if len(self.tombstones) and len(doc_ids):
                keep = alive_mask(doc_ids, self.tombstones)
                doc_ids, tfs = doc_ids[keep], tfs[keep]
            if len(doc_ids) == 0:
                out.append((doc_ids, np.empty(0, np.float64)))
                continue
            tf = tfs.astype(np.float64)
            dl = self.norms[doc_ids.astype(np.int64)].astype(np.float64)
            out.append((doc_ids, bm25_contrib(idf, tf, dl, avgdl)))
        return out

    def resolve_idf(self, terms: list[str]) -> list[float]:
        """idf for terms in THIS shard's tparts (df lookup service for the
        range-sharded engine's phase-1)."""
        return [_idf_from_df(self.df.get(t, 0), self.n_docs) for t in terms]


class DistributedQueryEngine:
    """Coordinator over a SegmentServer pool; the serving-path analog of
    ``IndexReader`` (results must match it exactly)."""

    def __init__(self, index_dir: str, pool_size: int = 4):
        from wikirec_ray.state.segments import load_stats

        # coordinator state: stats only — df/idf lives in the owner shards
        self.stats = load_stats(index_dir)
        self.n_tparts = int(self.stats.get("n_term_partitions", N_TERM_PARTITIONS))
        self.n_docs = self.stats["n_docs"]
        pool_size = max(1, min(pool_size, self.n_tparts))
        assign: list[list[int]] = [[] for _ in range(pool_size)]
        for t in range(self.n_tparts):
            assign[t % pool_size].append(t)
        self.owner_of = {t: t % pool_size for t in range(self.n_tparts)}
        self.servers = [
            SegmentServer.remote(index_dir, tparts) for tparts in assign
        ]

    def topk(self, terms: list[str], k: int,
             after: tuple[int, float] | None = None,
             weights: list[float] | None = None) -> list[tuple[int, float]]:
        from wikirec_ray.pipelines.query import aggregate_weights

        # weighted normal form (one entry per unique term, summed weight):
        # contributions are linear in idf, so scaling the shard's returned
        # contribs by the term's weight sum coordinator-side needs no
        # shard plumbing — and duplicate terms ship (and decode) once
        by_server: dict[int, list[tuple[str, int]]] = {}
        w_of: dict[int, list[float]] = {}
        for term, wsum in aggregate_weights(terms, weights).items():
            tpart = zlib.crc32(term.encode("utf-8")) % self.n_tparts
            sid = self.owner_of[tpart]
            by_server.setdefault(sid, []).append((term, tpart))
            w_of.setdefault(sid, []).append(wsum)
        if not by_server:
            return []
        futures = {
            sid: self.servers[sid].score_terms.remote(batch, w_of[sid])
            for sid, batch in by_server.items()
        }
        # sparse aggregation: O(Σ df of query terms) pairs, never an
        # O(n_docs) dense array on the coordinator (VERDICT r02 item 4 —
        # the dense accumulator was impossible at the 10^12-doc design
        # point; RangeShardedQueryEngine remains the layout whose SHARDS
        # also hold no O(n_docs) state)
        id_parts: list[np.ndarray] = []
        c_parts: list[np.ndarray] = []
        for sid, fut in futures.items():
            for doc_ids, contribs in ray.get(fut):
                if len(doc_ids):
                    id_parts.append(doc_ids.astype(np.int64))
                    c_parts.append(contribs)
        if not id_parts:
            return []
        from wikirec_ray.pipelines.query import topk_from_sparse

        return topk_from_sparse(
            np.concatenate(id_parts), np.concatenate(c_parts), k, after=after
        )

    def shutdown(self):
        for s in self.servers:
            ray.kill(s)
        self.servers = []


# ---------------------------------------------------------------------------
# doc-range-sharded serving (the 10^12-doc design point)
# ---------------------------------------------------------------------------


@ray.remote
class DfResolver:
    """Vocabulary-lookup shard: holds term->df for a subset of term
    partitions (O(vocab/P) memory) and answers idf for raw terms.  The
    range-sharded engine's phase-1 — doc-range shards hold per-RANGE state,
    so vocabulary state needs its own (tpart-sharded) owners."""

    def __init__(self, index_dir: str, tparts: list[int]):
        from wikirec_ray.state.segments import load_df_tparts, load_stats

        stats = load_stats(index_dir)
        self.n_docs = stats["n_docs"]
        self.df = load_df_tparts(index_dir, tparts)

    def resolve_idf(self, terms: list[str]) -> list[float]:
        return [_idf_from_df(self.df.get(t, 0), self.n_docs) for t in terms]

    def resolve_df(self, terms: list[str]) -> list[int]:
        """Raw document frequencies (0 = out of vocabulary) — the
        ``significant_text`` background surface."""
        return [int(self.df.get(t, 0)) for t in terms]

    # ---- vocabulary lexicon over THIS shard's tparts only: suggest/fuzzy
    # state is O(vocab/P) per resolver; the shared ``lexicon.Lexicon``
    # wrapper owns the normalization contract (lowercase, bigram-composite
    # exclusion) AND builds each sub-index lazily on first use, so a pool
    # that never serves ~/autocomplete pays nothing.
    def _lexicon(self):
        from wikirec_ray.pipelines.lexicon import Lexicon

        if not hasattr(self, "_lex"):
            self._lex = Lexicon(self.df)
        return self._lex

    def suggest(self, prefix: str, k: int) -> list[tuple[str, int]]:
        """This shard's top-k (term, df) completions of ``prefix``."""
        return self._lexicon().suggest(prefix, k)

    def suggest_suffix(self, suffix: str, k: int) -> list[tuple[str, int]]:
        """This shard's top-k (term, df) terms ending with ``suffix``."""
        return self._lexicon().suggest_suffix(suffix, k)

    def regex_terms(self, pattern: str, k: int) -> list[tuple[str, int]]:
        """This shard's top-k (term, df) terms fully matching ``pattern``."""
        return self._lexicon().regex_terms(pattern, k)

    def expand_terms(
        self, items: list, cap: int | None = None
    ) -> list[list[tuple[str, int]]]:
        """Per input term or (term, d) pair, this shard's
        levenshtein<=d neighborhood (d defaults to 1).  ``cap`` bounds
        the PAYLOAD per occurrence: shards are disjoint and share the
        (df desc, term asc) total order, so the global top-cap is a
        subset of the per-shard top-caps' union — capping here never
        changes a capped coordinator merge."""
        return self._lexicon().expand_many(items, cap)


class RangeServerImpl:
    """Owns a set of DOC RANGES: scores queries against the per-(tpart,
    range) posting chunks the build shuffle wrote, holding only its ranges'
    norms — nothing in this actor is O(n_docs).  The dense accumulator it
    allocates per query is O(DOC_RANGE_SIZE) (8192 by default), regardless
    of corpus size.

    Plain class (``RangeServer`` below is its ``ray.remote`` wrapping) so
    composite shards — ``MultiFieldRangeShard`` holds one per FIELD and
    sums their dense accumulators locally — can embed it without an actor
    hop per field."""

    def __init__(self, index_dir: str, range_ids: list[int]):
        import os

        import pyarrow.parquet as pq

        from wikirec_ray.state.segments import load_stats

        self.index_dir = index_dir
        self.stats = load_stats(index_dir)
        self.n_tparts = int(self.stats.get("n_term_partitions", N_TERM_PARTITIONS))
        self.range_size = int(self.stats.get("doc_range_size", 8192))
        self.range_ids = list(range_ids)
        # per-range norms: (sorted doc_ids, doc_lens) — O(range docs) each
        self.norms: dict[int, tuple[np.ndarray, np.ndarray]] = {}
        for r in self.range_ids:
            p = os.path.join(index_dir, "norms", f"range-{r:06d}.parquet")
            if os.path.exists(p):
                t = pq.read_table(p)
                self.norms[r] = (t["doc_id"].to_numpy(), t["doc_len"].to_numpy())
        # pending deletes restricted to THIS shard's ranges (a shard holds
        # only O(its doc share) of the tombstone set, like its norms)
        from wikirec_ray.state.segments import load_tombstones

        all_tombs = load_tombstones(index_dir)
        self.tombs: dict[int, np.ndarray] = {}
        if len(all_tombs):
            t_range = (all_tombs // np.uint64(self.range_size)).astype(np.int64)
            for r in self.range_ids:
                tr = all_tombs[t_range == r]
                if len(tr):
                    self.tombs[r] = tr
        self._chunks: dict[tuple[int, int], object] = {}
        self._meta_cols: dict[str, dict] = {}  # lazy attribute sidecar
        # strict-float-parsed dictionaries per (col, range) — snapshot
        # state; re-parsing per query is O(dictionary) Python work (the
        # 88 ms-per-call lesson at a 100k-value dictionary, see
        # IndexReader._meta_parsed)
        self._parsed_meta: dict[tuple[str, int], np.ndarray] = {}
        self._meta_manifest: dict | None = None  # one snapshot per shard
        self._prior_arrays: dict[str, dict] = {}  # per-col static priors
        # byte sizes of THIS shard's posting chunks in the manifest snapshot
        # the shard was constructed on: compact_index rewrites chunks in
        # place, so a lazy open after one must fail loudly (see
        # IndexReader.segment) instead of mixing pre-/post-compact state
        from wikirec_ray.state.segments import load_manifest

        m = load_manifest(index_dir) or {}
        mine = set(self.range_ids)
        self._chunk_bytes = {
            k: int(v["bytes"])
            for k, v in (m.get("partitions") or {}).items()
            if v.get("kind") == "postings"
            and int(v.get("range_id", -1)) in mine
        }

    def _chunk(self, tpart: int, range_id: int):
        """Lazy per-(tpart, range) posting chunk reader; missing file = no
        postings for that pair."""
        import os

        from wikirec_ray.state.segments import SegmentReader

        key = (tpart, range_id)
        if key not in self._chunks:
            rel = f"postings/tpart-{tpart:03d}/range-{range_id:06d}.parquet"
            p = os.path.join(self.index_dir, rel)
            expect = self._chunk_bytes.get(rel)
            if expect is not None and (
                not os.path.exists(p) or os.path.getsize(p) != expect
            ):
                raise RuntimeError(
                    f"{rel} no longer matches the manifest snapshot this "
                    f"shard was opened on (compact_index ran under a live "
                    f"serving pool?) — rebuild the pool"
                )
            self._chunks[key] = SegmentReader(p) if os.path.exists(p) else None
        return self._chunks[key]

    def _score_range(self, r: int, nr, terms_with_idf):
        """Dense per-range BM25 accumulator — THE scoring kernel behind
        ``topk`` / ``boolean_topk`` / ``filtered_topk`` (one place to
        change the served scoring contract).  Returns None when no term
        posts in this range."""
        from wikirec_ray.pipelines.query import bm25_contrib

        avgdl = self.stats["avgdl"]
        base = r * self.range_size
        local = np.zeros(self.range_size, dtype=np.float64)
        hit = False
        for term, tpart, idf in terms_with_idf:
            chunk = self._chunk(tpart, r)
            if chunk is None or not chunk.has(term):
                continue
            doc_ids, tfs = chunk.postings(term)
            if not len(doc_ids):
                continue
            hit = True
            d = doc_ids.astype(np.int64)
            tf = tfs.astype(np.float64)
            dl = nr[1][np.searchsorted(nr[0], d)].astype(np.float64)
            local[d - base] += bm25_contrib(idf, tf, dl, avgdl)
        return local if hit else None

    def _zero_tombs(self, r: int, local: np.ndarray) -> None:
        """Zero this range's tombstoned slots in a dense accumulator."""
        tr = self.tombs.get(r)
        if tr is not None:
            local[(tr - np.uint64(r * self.range_size)).astype(np.int64)] = 0.0

    def topk(self, terms_with_idf: list[tuple[str, int, float]], k: int,
             attrs: list[tuple[str, str]] | None = None, after=None):
        """This shard's top-k [(doc_id, rounded_score)] over its ranges —
        each doc lives in exactly one shard, so the global top-k is the
        top-k of the per-shard unions.  ``attrs`` = optional [(col, value)]
        metadata filters (pure filters — scoring stays corpus-global);
        ``after`` = optional GLOBAL (doc_id, score) search_after cursor (the previous page's last hit) —
        the per-range dense accumulator localizes its doc_id by the range
        base (strictly-after is base-shift-invariant)."""
        return self._dense_topk(terms_with_idf, k, attrs, after)

    def _dense_topk(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        k: int,
        attrs: list[tuple[str, str]] | None,
        after,
        neg_twt: list[tuple[str, int]] | None = None,
        negative_boost: float = 1.0,
    ):
        """The ONE per-range dense scoring loop behind ``topk`` and
        ``boosting_topk`` (review r5: the demotion variant had copied it
        — any cursor/attrs/tombstone fix must land once).  ``neg_twt`` +
        ``negative_boost`` = the optional ES-boosting demotion: slots on
        any negative term's posting list are multiplied before the
        per-range cut (a (tpart, range) chunk's postings lie inside the
        range by construction)."""
        from wikirec_ray.pipelines.query import topk_from_dense

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            base = r * self.range_size
            local = self._score_range(r, nr, terms_with_idf)
            if local is None:
                continue
            self._zero_tombs(r, local)
            if attrs:
                self._apply_attrs_dense(r, local, attrs)
            if neg_twt:
                parts = []
                for term, tpart in neg_twt:
                    chunk = self._chunk(tpart, r)
                    if chunk is None or not chunk.has(term):
                        continue
                    parts.append(chunk.postings(term)[0])
                if parts:
                    negd = np.unique(
                        np.concatenate(parts)).astype(np.int64)
                    local[negd - base] *= negative_boost
            loc_after = (after[0] - base, after[1]) if after else None
            out.extend(
                (d + base, s)
                for d, s in topk_from_dense(local, k, after=loc_after)
            )
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def boosting_topk(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        neg_twt: list[tuple[str, int]],
        negative_boost: float,
        k: int,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
    ):
        """This shard's ES-``boosting`` top-k — ``topk``'s shared dense
        loop (``_dense_topk``) with the demotion hook engaged: slots on
        ANY negative term's posting list are multiplied by
        ``negative_boost`` before the per-range cut.  Demotion is
        per-doc, so shards apply it exactly."""
        return self._dense_topk(terms_with_idf, k, attrs, after,
                                neg_twt=neg_twt,
                                negative_boost=negative_boost)

    def boolean_topk(
        self,
        score_twi: list[tuple[str, int, float]],
        must_twi: list[tuple[str, int, float]],
        not_twi: list[tuple[str, int, float]],
        k: int,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
        msm_twt: list[tuple[str, int]] | None = None,
        msm: int = 0,
    ):
        """This shard's boolean top-k: the dense per-range scoring of
        ``topk`` over ``score_twi`` (should + must occurrences), masked to
        the AND-intersection of the ``must`` terms' postings and zeroed on
        any ``must_not`` posting — the served twin of
        ``IndexReader.boolean_topk`` (boolean clauses filter, BM25
        scores).  ``msm_twt`` + ``msm`` = the distinct ``should`` terms
        (with tparts) and the ``minimum_should_match`` quorum: slots whose
        distinct-presence count falls short are zeroed, range-locally —
        quorum membership is per-doc, so shards decide it exactly."""
        from wikirec_ray.pipelines.query import topk_from_dense

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            base = r * self.range_size
            allowed = None
            if must_twi:
                for term, tpart, _ in must_twi:
                    chunk = self._chunk(tpart, r)
                    if chunk is None or not chunk.has(term):
                        allowed = np.empty(0, np.uint64)
                        break
                    d, _ = chunk.postings(term)
                    allowed = d if allowed is None else allowed[
                        np.isin(allowed, d, assume_unique=True)
                    ]
                    if not len(allowed):
                        break
                if not len(allowed):
                    continue
            local = self._score_range(r, nr, score_twi)
            if local is None:
                continue
            if allowed is not None:
                masked = np.zeros_like(local)
                sel = allowed.astype(np.int64) - base
                masked[sel] = local[sel]
                local = masked
            if msm:
                quorum = np.zeros(self.range_size, dtype=np.int32)
                for term, tpart in msm_twt or ():
                    chunk = self._chunk(tpart, r)
                    if chunk is None or not chunk.has(term):
                        continue
                    d, _ = chunk.postings(term)
                    quorum[d.astype(np.int64) - base] += 1
                local[quorum < msm] = 0.0
            for term, tpart, _ in not_twi:
                chunk = self._chunk(tpart, r)
                if chunk is None or not chunk.has(term):
                    continue
                d, _ = chunk.postings(term)
                local[d.astype(np.int64) - base] = 0.0
            self._zero_tombs(r, local)
            if attrs:
                self._apply_attrs_dense(r, local, attrs)
            loc_after = (after[0] - base, after[1]) if after else None
            out.extend(
                (d + base, s)
                for d, s in topk_from_dense(local, k, after=loc_after)
            )
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def _meta(self, col: str):
        """Lazy per-range metadata for THIS shard's ranges: {range_id:
        (sorted doc_ids, dictionary codes, values)} — O(shard docs), the
        same locality contract as the shard's norms/tombstones.  Every
        column loads against ONE meta-manifest snapshot taken at first
        use; a ``build_doc_meta`` rewrite under a live shard fails loudly
        (file-size mismatch) instead of serving mixed sidecar
        generations — the same guard the posting chunks get via
        ``_chunk_bytes``."""
        cached = self._meta_cols.get(col)
        if cached is None:
            from wikirec_ray.stages.doc_meta import (
                load_meta_range,
                meta_manifest,
            )

            if self._meta_manifest is None:
                self._meta_manifest = meta_manifest(self.index_dir)
            cached = {}
            for r in self.range_ids:
                m = load_meta_range(
                    self.index_dir, col, r, manifest=self._meta_manifest
                )
                if m is not None:
                    cached[r] = m
            self._meta_cols[col] = cached
        return cached

    def _attr_keep_sorted(
        self, r: int, docs: np.ndarray, attrs: list[tuple[str, str]]
    ) -> np.ndarray:
        """Subset of range ``r``'s sorted alive ``docs`` matching EVERY
        (col, value) attribute — the shard twin of
        ``IndexReader._attr_keep_sorted`` (loud on a stale sidecar, an
        unknown value matches nothing; value specs — literal equality or
        ``>=``-style numeric ranges — go through the SAME
        ``attr_matching_codes`` interpreter as the local reader)."""
        from wikirec_ray.pipelines.query import attr_matching_codes

        for col, value in attrs:
            if not len(docs):
                return docs
            mr = self._meta(col).get(r)
            if mr is None:
                raise RuntimeError(
                    f"range {r} has live matching docs but no metadata "
                    f"sidecar file — stale meta/: re-run build_doc_meta"
                )
            ids, codes, values = mr
            sel = np.searchsorted(ids, docs)
            if (sel >= len(ids)).any() or (ids[np.minimum(sel, len(ids) - 1)]
                                           != docs).any():
                raise RuntimeError(
                    f"live matching doc missing from metadata range {r} — "
                    f"stale meta/: re-run build_doc_meta"
                )
            match = attr_matching_codes(values, value)
            if not len(match):
                return docs[:0]
            docs = docs[
                codes[sel] == match[0] if len(match) == 1
                else np.isin(codes[sel], match)
            ]
        return docs

    def _prior_range(self, r: int, col: str) -> np.ndarray | None:
        """Range ``r``'s static-prior slots (float64, ``range_size`` long,
        0.0 for absent/non-numeric docs; None when the range has no
        sidecar slice — the caller skips the add instead of paying a
        fresh zeros allocation per query) — the shard-local twin of
        ``IndexReader.prior_dense`` (same strict numeric parse), cached
        per column like the meta codes."""
        per_range = self._prior_arrays.get(col)
        if per_range is None:
            from wikirec_ray.pipelines.query import _strict_float

            per_range = {}
            for rr, (ids, codes, values) in self._meta(col).items():
                vals = np.array(
                    [_strict_float(v) or 0.0 for v in values] + [0.0],
                    np.float64,
                )
                arr = np.zeros(self.range_size, np.float64)
                base = rr * self.range_size
                arr[(ids.astype(np.int64) - base)] = vals[codes]
                per_range[rr] = arr
            self._prior_arrays[col] = per_range
        return per_range.get(r)

    def prior_topk(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        k: int,
        prior_col: str,
        prior_weight: float,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
    ):
        """This shard's static-score top-k: the dense per-range BM25 of
        ``topk`` plus ``prior_weight × prior`` on the MATCHING slots only
        (bm25 > 0 decides membership, the prior only re-ranks) — the
        served twin of ``IndexReader.prior_topk``, same add order."""
        from wikirec_ray.pipelines.query import topk_from_dense

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            base = r * self.range_size
            local = self._score_range(r, nr, terms_with_idf)
            if local is None:
                continue
            self._zero_tombs(r, local)
            m = local > 0.0
            if m.any():
                pr = self._prior_range(r, prior_col)
                if pr is not None:
                    local[m] += prior_weight * pr[m]
            if attrs:
                self._apply_attrs_dense(r, local, attrs)
            loc_after = (after[0] - base, after[1]) if after else None
            out.extend(
                (d + base, s)
                for d, s in topk_from_dense(local, k, after=loc_after)
            )
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def _apply_attrs_dense(
        self, r: int, local: np.ndarray, attrs: list[tuple[str, str]]
    ) -> None:
        """Zero every scoring slot of range ``r``'s dense accumulator whose
        doc fails any attribute (tombstones must already be zeroed — a
        tombstoned doc is not 'missing from the sidecar')."""
        base = r * self.range_size
        scoring = np.flatnonzero(local > 0)
        if not len(scoring):
            return
        docs = (scoring + base).astype(np.uint64)
        kept = self._attr_keep_sorted(r, docs, attrs)
        keep = np.zeros(self.range_size, dtype=bool)
        keep[(kept - np.uint64(base)).astype(np.int64)] = True
        local[~keep] = 0.0

    def _or_match_by_range(
        self,
        terms_with_tpart: list[tuple[str, int]],
        attrs: list[tuple[str, str]] | None,
    ):
        """Yield (range_id, docs) per doc range with a NON-EMPTY OR-matched
        alive doc set (optional ``attrs`` pre-filter) — the one shared
        preamble of every match-set aggregation partial (facets,
        cardinality, grouped stats, numeric moments), so the match /
        tombstone / filter logic cannot drift between routes (review
        r5: it was four copies)."""
        for r in self.range_ids:
            parts = []
            for term, tpart in terms_with_tpart:
                chunk = self._chunk(tpart, r)
                if chunk is None or not chunk.has(term):
                    continue
                parts.append(chunk.postings(term)[0])
            if not parts:
                continue
            docs = np.unique(np.concatenate(parts)).astype(np.uint64)
            tr = self.tombs.get(r)
            if tr is not None:
                from wikirec_ray.state.segments import filter_tombstoned

                docs = filter_tombstoned(docs, tr)
            if attrs and len(docs):
                docs = self._attr_keep_sorted(r, docs, attrs)
            if len(docs):
                yield r, docs

    def _meta_select(self, meta: dict, r: int, docs: np.ndarray):
        """(dictionary codes, values) of one loaded meta column for
        ``docs`` of range ``r`` — loud on a missing sidecar file or a doc
        absent from it (the shared stale-meta contract)."""
        mr = meta.get(r)
        if mr is None:
            raise RuntimeError(
                f"range {r} has matches but no metadata sidecar file — "
                f"stale meta/: re-run build_doc_meta"
            )
        ids, codes, values = mr
        sel = np.searchsorted(ids, docs)
        if (sel >= len(ids)).any() or (ids[np.minimum(sel, len(ids) - 1)]
                                       != docs).any():
            raise RuntimeError(
                f"matched doc missing from metadata range {r} — stale "
                f"meta/: re-run build_doc_meta"
            )
        return codes[sel], values

    def facet_counts(
        self, terms_with_tpart: list[tuple[str, int]], col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[str, int]:
        """This shard's {value: match count} of ``col`` over docs matching
        ANY term (alive only, optional ``attrs`` pre-filter — the
        significant-terms foreground) — the coordinator sums shard dicts;
        every doc lives in exactly one shard, so the sum is exact."""
        meta = self._meta(col)
        out: dict[str, int] = {}
        for r, docs in self._or_match_by_range(terms_with_tpart, attrs):
            codes, values = self._meta_select(meta, r, docs)
            counts = np.bincount(codes, minlength=len(values))
            for c in np.flatnonzero(counts):
                v = values[c]
                out[v] = out.get(v, 0) + int(counts[c])
        return out

    def distinct_values(
        self,
        terms_with_tpart: list[tuple[str, int]],
        col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[str]:
        """This shard's DISTINCT stored values of ``col`` over docs
        matching ANY term (alive only, optional ``attrs`` pre-filter) —
        the ``cardinality`` aggregation partial.  Bounded by the column's
        dictionary size, not the match count; the coordinator unions the
        sets (for a genuinely high-cardinality column at cluster scale the
        right swap is HLL registers, see ``IndexReader.cardinality``)."""
        meta = self._meta(col)
        out: set[str] = set()
        for r, docs in self._or_match_by_range(terms_with_tpart, attrs):
            codes, values = self._meta_select(meta, r, docs)
            for c in np.unique(codes):
                out.add(values[c])
        return sorted(out)

    def multi_value_counts(
        self,
        terms_with_tpart: list[tuple[str, int]],
        cols: list[str],
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[tuple[str, ...], int]:
        """This shard's {composite value tuple: match count} over its
        OR-matched alive docs — the ``multi_terms`` partial.  Composite
        codes are range-local (each range has its own dictionaries), so
        counting happens per range on a mixed-radix code and only the
        DISTINCT tuples are decoded to strings; the dict is bounded by
        the product of observed per-range value combinations."""
        metas = [self._meta(c) for c in cols]
        out: dict[tuple[str, ...], int] = {}
        for r, docs in self._or_match_by_range(terms_with_tpart, attrs):
            per_col = [self._meta_select(m, r, docs) for m in metas]
            radix = 1
            for _codes, values in per_col:
                radix *= max(len(values), 1)
                if radix >= (1 << 62):
                    # the same named error (and threshold) as the local
                    # route — silent int64 wraparound would collide
                    # composite keys into wrong buckets (review r5 #2)
                    raise ValueError(
                        "multi_terms: composite dictionary space exceeds "
                        "int64 — bucket on one column and sub-aggregate"
                    )
            key = np.zeros(len(docs), np.int64)
            for codes, values in per_col:
                key = key * max(len(values), 1) + codes.astype(np.int64)
            uniq, counts = np.unique(key, return_counts=True)
            for c, n in zip(uniq.tolist(), counts.tolist()):
                parts = []
                for codes, values in reversed(per_col):
                    base = max(len(values), 1)
                    parts.append(values[c % base])
                    c //= base
                t = tuple(reversed(parts))
                out[t] = out.get(t, 0) + int(n)
        return out

    def grouped_stats(
        self,
        terms_with_tpart: list[tuple[str, int]],
        by_col: str,
        val_col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[str, tuple[int, int, float, float | None, float | None]]:
        """This shard's terms+stats sub-aggregation partial: {by-value:
        (n_match, n_contrib, sum, min, max)} of ``val_col`` over docs
        matching ANY term (alive only, optional ``attrs`` pre-filter),
        grouped by ``by_col``.  The coordinator merges per value (sums /
        min-of-mins / max-of-maxes), then orders and cuts top-k — exact,
        every doc lives in exactly one shard.  Dict size is bounded by
        ``by_col``'s dictionary, not the match count."""
        meta_b = self._meta(by_col)
        meta_v = self._meta(val_col)
        out: dict[str, tuple[int, int, float, float | None, float | None]] = {}
        for r, docs in self._or_match_by_range(terms_with_tpart, attrs):
            bc, values_b = self._meta_select(meta_b, r, docs)
            vc, _values_v = self._meta_select(meta_v, r, docs)
            x = self._meta_parsed(val_col, r)[vc]
            ok = ~np.isnan(x)
            for c in np.unique(bc):
                in_g = bc == c
                xs = x[in_g & ok]
                v = values_b[c]
                nm, nc, tot, mn, mx = out.get(v, (0, 0, 0.0, None, None))
                nm += int(in_g.sum())
                if len(xs):
                    nc += int(len(xs))
                    tot += float(xs.sum())
                    gmn, gmx = float(xs.min()), float(xs.max())
                    mn = gmn if mn is None else min(mn, gmn)
                    mx = gmx if mx is None else max(mx, gmx)
                out[v] = (nm, nc, tot, mn, mx)
        return out

    def top_hits_for_values(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        col: str,
        values: list[str],
        k: int,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[str, list[tuple[int, float]]]:
        """This shard's per-value top-k hits for the REQUESTED ``values``
        only — the ``top_hits_by`` second round (the coordinator already
        chose the buckets from bounded facet partials, so the payload here
        is O(len(values) × k), never O(dictionary × k)).  Same scoring
        and (round(score, 9) desc, doc asc) order as every route; the
        global per-value top-k is a subset of the shard top-ks because
        every doc lives in exactly one shard.  (Score-based, so it rides
        the dense scorer, not ``_or_match_by_range``.)"""
        from wikirec_ray.pipelines.query import ROUND_DP

        vset = set(values)
        out: dict[str, list[tuple[int, float]]] = {v: [] for v in values}
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            base = r * self.range_size
            local = self._score_range(r, nr, terms_with_idf)
            if local is None:
                continue
            self._zero_tombs(r, local)
            if attrs:
                self._apply_attrs_dense(r, local, attrs)
            rr = np.round(local, ROUND_DP)
            nz = np.flatnonzero(rr > 0)
            if not len(nz):
                continue
            nzc, rvalues = self._meta_select(
                self._meta(col), r, (nz + base).astype(np.uint64)
            )
            for ci, v in enumerate(rvalues):
                if v not in vset:
                    continue
                in_b = nz[nzc == ci]
                if not len(in_b):
                    continue
                if len(in_b) > k:
                    kth = -np.partition(-rr[in_b], k - 1)[k - 1]
                    in_b = in_b[rr[in_b] >= kth]
                out[v].extend(
                    (int(d + base), float(rr[d])) for d in in_b
                )
        for v in out:
            out[v] = sorted(out[v], key=lambda h: (-h[1], h[0]))[:k]
        return out

    def _numeric_match_values(
        self,
        terms_with_tpart: list[tuple[str, int]],
        col: str,
        attrs: list[tuple[str, str]] | None,
    ):
        """Yield one float64 array per doc range: the strict-numeric-parsed
        ``col`` values of this shard's OR-matched alive docs (optional
        ``attrs`` pre-filter) — the shared per-range input of the
        ``metric_stats`` and ``histogram`` partials.  Matches with a
        missing sidecar file or missing doc raise (stale meta/), the
        ``IndexReader`` contract."""
        meta = self._meta(col)
        for r, docs in self._or_match_by_range(terms_with_tpart, attrs):
            codes, _values = self._meta_select(meta, r, docs)
            x = self._meta_parsed(col, r)[codes]
            x = x[~np.isnan(x)]
            if len(x):
                yield x

    def _meta_parsed(self, col: str, r: int) -> np.ndarray:
        """Range ``r``'s sidecar dictionary of ``col`` strict-parsed to
        float64 (NaN = non-numeric), CACHED per (col, range) — snapshot
        state, same rationale as ``IndexReader._meta_parsed`` (per-query
        re-parse is O(dictionary) Python work)."""
        from wikirec_ray.pipelines.query import _strict_float

        cached = self._parsed_meta.get((col, r))
        if cached is None:
            _ids, _codes, values = self._meta(col)[r]
            cached = np.array(
                [x if (x := _strict_float(v)) is not None else np.nan
                 for v in values],
                np.float64,
            )
            self._parsed_meta[(col, r)] = cached
        return cached

    def metric_stats(
        self,
        terms_with_tpart: list[tuple[str, int]],
        col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> tuple[int, float, float | None, float | None, float]:
        """This shard's stats-aggregation partial over docs matching ANY
        term (alive only, optional ``attrs`` pre-filter): (count, sum,
        min, max, sum_of_squares) of ``col`` under the strict numeric
        parse — non-numeric stored values are skipped, the
        ``IndexReader.metric_stats`` contract.  Every doc lives in
        exactly one shard, so the coordinator's merge (sum
        counts/sums/sum_sqs, min of mins, max of maxes) is exact; the
        sum_of_squares leg feeds ``extended_stats``' variance with no
        second shard round-trip."""
        cnt, tot, sum_sq = 0, 0.0, 0.0
        mn: float | None = None
        mx: float | None = None
        for x in self._numeric_match_values(terms_with_tpart, col, attrs):
            cnt += int(len(x))
            tot += float(x.sum())
            sum_sq += float((x * x).sum())
            rmn, rmx = float(x.min()), float(x.max())
            mn = rmn if mn is None else min(mn, rmn)
            mx = rmx if mx is None else max(mx, rmx)
        return cnt, tot, mn, mx, sum_sq

    def attr_values(
        self, docs: list[int], cols: list[str]
    ) -> dict[int, dict[str, str]]:
        """Sidecar attribute values for the subset of ``docs`` living in
        THIS shard's ranges (others are simply absent from the returned
        dict — the coordinator unions shard dicts and checks coverage).
        A doc in an owned range but missing from its sidecar file raises
        (stale meta/)."""
        by_range: dict[int, list[int]] = {}
        owned = set(self.range_ids)
        for d in docs:
            r = int(d) // self.range_size
            if r in owned:
                by_range.setdefault(r, []).append(int(d))
        out: dict[int, dict[str, str]] = {}
        for col in cols:
            meta = self._meta(col)
            for r, ds_ in by_range.items():
                mr = meta.get(r)
                if mr is None:
                    raise RuntimeError(
                        f"range {r} is served but has no metadata sidecar "
                        f"file — stale meta/: re-run build_doc_meta"
                    )
                ids, codes, values = mr
                dd = np.asarray(sorted(set(ds_)), np.uint64)
                sel = np.searchsorted(ids, dd)
                if (sel >= len(ids)).any() or (
                        ids[np.minimum(sel, len(ids) - 1)] != dd).any():
                    missing = int(dd[(sel >= len(ids)) | (
                        ids[np.minimum(sel, len(ids) - 1)] != dd)][0])
                    raise RuntimeError(
                        f"doc {missing} is in the index but not in the "
                        f"metadata sidecar — stale meta/: re-run "
                        f"build_doc_meta"
                    )
                for d, c in zip(dd.tolist(), codes[sel].tolist()):
                    out.setdefault(int(d), {})[col] = values[c]
        return out

    def background_value_counts(self, col: str) -> dict[str, int]:
        """{value: alive doc count} of ``col`` over ALL of this shard's
        sidecar docs — the ``significant_terms`` background partial
        (corpus-global, no query).  Tombstoned docs are dropped, matching
        the local reader's ``_background_counts``; the coordinator sums
        shard dicts (each doc lives in exactly one shard)."""
        from wikirec_ray.state.segments import filter_tombstoned

        meta = self._meta(col)
        out: dict[str, int] = {}
        for r in self.range_ids:
            mr = meta.get(r)
            if mr is None:
                continue
            ids, codes, values = mr
            tr = self.tombs.get(r)
            if tr is not None and len(tr):
                alive = filter_tombstoned(ids.astype(np.uint64), tr)
                codes_r = codes[np.searchsorted(ids, alive)]
            else:
                codes_r = codes
            counts = np.bincount(codes_r, minlength=len(values))
            for c in np.flatnonzero(counts):
                v = values[c]
                out[v] = out.get(v, 0) + int(counts[c])
        return out

    def numeric_value_counts(
        self,
        terms_with_tpart: list[tuple[str, int]],
        col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[float, int]:
        """This shard's {parsed value: contributing-doc count} of ``col``
        over its OR-matched alive docs — the ``percentiles`` partial,
        bounded by the sidecar dictionary (distinct parsed values), not
        the match count.  Both sides run the same strict parse, so the
        float keys are identical across shards and the coordinator's
        merged multiset is exact."""
        out: dict[float, int] = {}
        for x in self._numeric_match_values(terms_with_tpart, col, attrs):
            v, c = np.unique(x, return_counts=True)
            for val, cnt in zip(v, c):
                out[float(val)] = out.get(float(val), 0) + int(cnt)
        return out

    def histogram(
        self,
        terms_with_tpart: list[tuple[str, int]],
        col: str,
        interval: float,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[float, int]:
        """This shard's histogram partial: {floor(v / interval): count}
        over the same contributing values as ``metric_stats`` — the key is
        the integer-valued BUCKET INDEX as float64 (exact up to 2^53, so
        it merges across shards without representation drift); the
        coordinator sums dicts and multiplies by ``interval`` once."""
        out: dict[float, int] = {}
        for x in self._numeric_match_values(terms_with_tpart, col, attrs):
            idx, counts = np.unique(np.floor(x / interval),
                                    return_counts=True)
            for i, c in zip(idx, counts):
                out[float(i)] = out.get(float(i), 0) + int(c)
        return out

    def filtered_topk(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        k: int,
        col: str,
        value: str,
    ):
        """``topk`` restricted to docs whose ``col`` equals ``value`` —
        the attribute is a pure filter (identical scoring).  A live scoring
        doc missing from the sidecar raises (stale sidecar — same loud
        contract as ``facet_counts``), never silently drops.  Shorthand for
        ``topk(terms_with_idf, k, attrs=[(col, value)])``."""
        return self.topk(terms_with_idf, k, attrs=[(col, value)])

    def collapsed_topk(
        self,
        terms_with_idf: list[tuple[str, int, float]],
        k: int,
        col: str,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
    ) -> list[tuple[int, float, str]]:
        """This shard's field-collapsed top-k [(doc_id, score, value)] —
        best doc per distinct ``col`` value over its ranges.  Per-range
        collapse via the shared ``collapsed_topk_from_dense`` kernel, then
        a shard-level re-collapse on value STRINGS (each range has its own
        sidecar dictionary).  Dropping a key's non-best docs shard-side is
        lossless for the global merge: if a key's shard winner misses this
        shard's top-k, k better keys exist here, so the key cannot be in
        the global top-k either (the same per-scope argument the
        coordinator applies across shards)."""
        from wikirec_ray.pipelines.query import collapsed_topk_from_dense

        out: list[tuple[int, float, str]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            base = r * self.range_size
            local = self._score_range(r, nr, terms_with_idf)
            if local is None:
                continue
            self._zero_tombs(r, local)
            if attrs:
                self._apply_attrs_dense(r, local, attrs)
            mr = self._meta(col).get(r)

            def codes_for(pos: np.ndarray) -> np.ndarray:
                if mr is None:
                    raise RuntimeError(
                        f"range {r} has live scoring docs but no metadata "
                        f"sidecar file — stale meta/: re-run build_doc_meta"
                    )
                ids, codes, _values = mr
                docs = pos + base
                sel = np.searchsorted(ids, docs)
                if (sel >= len(ids)).any() or (
                    ids[np.minimum(sel, len(ids) - 1)] != docs
                ).any():
                    raise RuntimeError(
                        f"live scoring doc missing from metadata range {r} "
                        f"— stale meta/: re-run build_doc_meta"
                    )
                return codes[sel]

            loc_after = (after[0] - base, after[1]) if after else None
            out.extend(
                (d + base, s, mr[2][c])
                for d, s, c in collapsed_topk_from_dense(
                    local, k, codes_for, after=loc_after
                )
            )
        out.sort(key=lambda x: (-x[1], x[0]))
        seen: set[str] = set()
        kept: list[tuple[int, float, str]] = []
        for d, s, v in out:
            if v not in seen:
                seen.add(v)
                kept.append((d, s, v))
                if len(kept) == k:
                    break
        return kept

    def _gather_items(self, r: int, terms_with_idf):
        """(items, cand) for one range: per-term chunk postings in QUERY
        order (duplicates kept, matching the scoring contract) plus their
        AND intersection; (None, None) when any term has no postings in
        this range.  Shared per-range scaffolding of every filtered
        retrieval below — one owner, so the gather/guard logic cannot
        drift between phrase, NEAR, and precomputed paths."""
        items = []
        for term, tpart, _ in terms_with_idf:
            chunk = self._chunk(tpart, r)
            if chunk is None or not chunk.has(term):
                return None, None
            d, tf = chunk.postings(term)
            items.append((term, d, tf, chunk))
        cand = items[0][1]
        for _, d, _, _ in items[1:]:
            cand = cand[np.isin(cand, d, assume_unique=True)]
            if not len(cand):
                break
        tr = self.tombs.get(r)
        if tr is not None and len(cand):
            from wikirec_ray.state.segments import filter_tombstoned

            cand = filter_tombstoned(cand, tr)
        return items, cand

    def _score_filtered(self, nr, items, terms_with_idf, docs, k,
                        after=None):
        """Plain multi-term BM25 over the filter-surviving ``docs`` of one
        range (duplicates double-count) -> the range's top-k partial; the
        served twin of ``IndexReader._filtered_topk``."""
        from wikirec_ray.pipelines.query import bm25_contrib, topk_from_sparse

        avgdl = self.stats["avgdl"]
        docs64 = docs.astype(np.int64)
        dl = nr[1][np.searchsorted(nr[0], docs64)].astype(np.float64)
        ids_out, contribs = [], []
        for (term, d, tf, _), (_, _, idf) in zip(items, terms_with_idf):
            if idf == 0.0:
                continue
            tfv = tf[np.searchsorted(d, docs)].astype(np.float64)
            ids_out.append(docs64)
            contribs.append(bm25_contrib(idf, tfv, dl, avgdl))
        if not ids_out:
            return []
        return topk_from_sparse(
            np.concatenate(ids_out), np.concatenate(contribs), k, after=after
        )

    def phrase_topk(self, terms_with_idf: list[tuple[str, int, float]], k: int,
                    sub_comps: list[tuple[str, int]] | None = None,
                    attrs: list[tuple[str, str]] | None = None,
                    after=None):
        """This shard's exact-phrase top-k over its ranges.  ``terms_with_idf``
        is in PHRASE ORDER (duplicates kept).  Adjacency is per-doc and every
        doc lives wholly inside one range, so each range resolves its own
        matches with the shared ``phrase_match_docs`` kernel over its
        per-(tpart, range) chunk readers — the reason phrase serving lives in
        the doc-range-sharded engine (a term-sharded layout would have to
        ship position streams between shards).  ``sub_comps`` =
        [(composite term, its tpart)] for every precomputed consecutive
        sub-pair of a 3+-term phrase: candidates intersect those composite
        doc lists BEFORE the positional chain (same pruning as the local
        reader — exact, since a phrase doc contains every sub-pair; the
        decode-cost guard uses the chunk's cached row metadata)."""
        from wikirec_ray.pipelines.query import (
            SUBPAIR_PRUNE_MAX_RATIO,
            IndexReader,
        )

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            items, cand = self._gather_items(r, terms_with_idf)
            if items is None:
                continue
            for comp, ctpart in sub_comps or ():
                if not len(cand):
                    break
                cchunk = self._chunk(ctpart, r)
                dfc = cchunk.term_df(comp) if cchunk is not None else None
                if dfc is None:
                    cand = cand[:0]  # sub-pair absent in this range
                    break
                if dfc > SUBPAIR_PRUNE_MAX_RATIO * len(cand):
                    continue  # decode would cost more than the prune saves
                dc, _ = cchunk.postings(comp)
                cand = cand[np.isin(cand, dc, assume_unique=True)]
            if not len(cand):
                continue
            pdocs = IndexReader.phrase_match_docs(
                cand, [(t, d, c) for t, d, _, c in items]
            )
            if attrs and len(pdocs):
                pdocs = self._attr_keep_sorted(r, pdocs, attrs)
            if len(pdocs):
                out.extend(self._score_filtered(nr, items, terms_with_idf,
                                                pdocs, k, after=after))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def near_topk(self, terms_with_idf: list[tuple[str, int, float]],
                  anchor_term: str, window: int, k: int,
                  attrs: list[tuple[str, str]] | None = None,
                  after=None):
        """This shard's proximity (NEAR) top-k over its ranges: docs with an
        ``anchor_term`` occurrence whose ±window covers every query term,
        via the shared ``IndexReader.near_match_docs`` kernel.  The anchor
        is chosen by the COORDINATOR from global dfs (max idf, ties
        lexicographic — identical to the local reader's least-df rule), so
        every shard evaluates the same predicate.  Scoring is the plain
        multi-term BM25 over surviving docs, duplicates double-counting,
        same as the local ``_filtered_topk`` contract."""
        from wikirec_ray.pipelines.query import IndexReader

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            items, cand = self._gather_items(r, terms_with_idf)
            if items is None or not len(cand):
                continue
            anchor_item = None
            others = []
            seen: set[str] = set()
            for term, d, _, chunk in items:
                if term in seen:
                    continue
                seen.add(term)
                if term == anchor_term and anchor_item is None:
                    anchor_item = (term, d, chunk)
                else:
                    others.append((term, d, chunk))
            ndocs = IndexReader.near_match_docs(cand, anchor_item, others, window)
            if attrs and len(ndocs):
                ndocs = self._attr_keep_sorted(r, ndocs, attrs)
            if len(ndocs):
                out.extend(self._score_filtered(nr, items, terms_with_idf,
                                                ndocs, k, after=after))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def sloppy_phrase_topk(
        self, terms_with_idf: list[tuple[str, int, float]],
        slop: int, k: int,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
    ):
        """This shard's sloppy-phrase (in-order span, slack <= slop)
        top-k over its ranges via the shared
        ``IndexReader.sloppy_match_docs`` kernel.  ``terms_with_idf`` is
        in PHRASE order (duplicates kept); the span predicate is per-doc,
        so each range resolves its own matches — the same reason
        phrase/NEAR serving lives in the doc-range-sharded engine."""
        from wikirec_ray.pipelines.query import IndexReader

        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            items, cand = self._gather_items(r, terms_with_idf)
            if items is None or not len(cand):
                continue
            docs = IndexReader.sloppy_match_docs(
                cand, [(t, d, c) for t, d, _, c in items], slop
            )
            if attrs and len(docs):
                docs = self._attr_keep_sorted(r, docs, attrs)
            if len(docs):
                out.extend(self._score_filtered(nr, items, terms_with_idf,
                                                docs, k, after=after))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]

    def precomputed_phrase_topk(
        self, comp: str, comp_tpart: int,
        terms_with_idf: list[tuple[str, int, float]], k: int,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
    ):
        """Precomputed-bigram phrase: this shard's top-k using the composite
        term's posting chunks as the phrase-doc filter — no position streams
        touched (the build materialized the adjacency).  Scores are the
        plain per-term BM25, identical to ``phrase_topk`` on the same
        query (pinned in tests).  A composite posting implies both terms
        post in the range, so ``_gather_items`` returning None here means a
        torn file — the range is skipped and heals via manifest checks."""
        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            nr = self.norms.get(r)
            if nr is None:
                continue
            cchunk = self._chunk(comp_tpart, r)
            if cchunk is None or not cchunk.has(comp):
                continue
            pdocs, _ = cchunk.postings(comp)
            tr = self.tombs.get(r)
            if tr is not None and len(pdocs):
                from wikirec_ray.state.segments import filter_tombstoned

                pdocs = filter_tombstoned(pdocs, tr)
            if attrs and len(pdocs):
                pdocs = self._attr_keep_sorted(r, pdocs, attrs)
            if not len(pdocs):
                continue
            items, _cand = self._gather_items(r, terms_with_idf)
            if items is None:
                continue
            out.extend(self._score_filtered(nr, items, terms_with_idf,
                                            pdocs, k, after=after))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]


RangeServer = ray.remote(RangeServerImpl)


def _range_ids(index_dir: str) -> list[int]:
    """Sorted doc-range ids of an index (one norms file per range) — the
    shard-assignment ground truth shared by every doc-range coordinator."""
    import os

    norms_dir = os.path.join(index_dir, "norms")
    return sorted(
        int(p.split("-")[1].split(".")[0])
        for p in os.listdir(norms_dir)
        if p.endswith(".parquet")
    )


def _round_robin(items: list, n: int) -> list[list]:
    """items -> at most ``n`` non-empty round-robin buckets (the pool
    assignment used for both range shards and df resolvers)."""
    n = max(1, min(n, len(items) or 1))
    out: list[list] = [[] for _ in range(n)]
    for i, x in enumerate(items):
        out[i % n].append(x)
    return out


def _sidecar_cols(index_dir: str) -> list[str]:
    """Attribute columns of an index's metadata sidecar ([] without one) —
    the O(1) column list a coordinator caches; per-range data stays in the
    shards."""
    from wikirec_ray.stages.doc_meta import meta_manifest

    try:
        return list(meta_manifest(index_dir).get("cols", []))
    except FileNotFoundError:
        return []


@ray.remote
class MultiFieldRangeShard:
    """One doc-range shard of a MULTI-FIELD index: an embedded
    ``RangeServerImpl`` per field over the SAME range ids, summing
    ``field_weight × field dense accumulator`` range-locally before the
    top-k — the served twin of ``MultiFieldReader.score_exact``, placed
    exactly where the data is (the per-field arrays never cross a process
    boundary; the coordinator sees only this shard's merged top-k).
    Tombstones union across fields (zeroing each field's tombs on the
    summed array), matching the local reader's delete contract."""

    def __init__(self, field_dirs: list[str], range_ids: list[int]):
        self.fields = [RangeServerImpl(d, range_ids) for d in field_dirs]
        self.range_ids = list(range_ids)
        sizes = {f.range_size for f in self.fields}
        if len(sizes) != 1:
            raise ValueError(
                f"field indexes disagree on doc_range_size ({sorted(sizes)})"
            )

    def topk(
        self,
        per_field_twi: list[list[tuple[str, int, float]]],
        field_weights: list[float],
        k: int,
        attrs: list[tuple[str, str]] | None = None,
        after=None,
        mode: str = "most_fields",
        tie_breaker: float = 0.0,
    ):
        """This shard's top-k over the combined per-field BM25.
        ``per_field_twi`` = one (term, tpart, weighted idf) list per
        field, resolved against THAT field's vocabulary (idfs differ per
        field by design); the combine — ``most_fields`` sum or
        ``best_fields`` DisMax — is the SAME ``_combine_fields`` kernel
        the local reader uses, applied per range (scores are ≥ 0, so a
        field absent from a range is equivalent to its zero array)."""
        from wikirec_ray.pipelines.multifield import _combine_fields
        from wikirec_ray.pipelines.query import topk_from_dense

        primary = self.fields[0]
        out: list[tuple[int, float]] = []
        for r in self.range_ids:
            per = []
            for fw, twi, f in zip(field_weights, per_field_twi, self.fields):
                nr = f.norms.get(r)
                if nr is None or not twi:
                    continue
                s = f._score_range(r, nr, twi)
                if s is None:
                    continue
                per.append(fw * s)
            if not per:
                continue
            local = _combine_fields(per, mode, tie_breaker)
            for f in self.fields:
                f._zero_tombs(r, local)
            if attrs:
                primary._apply_attrs_dense(r, local, attrs)
            base = r * primary.range_size
            loc_after = (after[0] - base, after[1]) if after else None
            out.extend(
                (d + base, s)
                for d, s in topk_from_dense(local, k, after=loc_after)
            )
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:k]


class RangeShardedQueryEngine:
    """Coordinator over a RangeServer pool: idf resolves at a tpart-sharded
    ``DfResolver`` pool (phase 1), then queries fan out to every range
    shard, each returns its partial top-k, and the merge keeps the global
    best k under the engine-wide (round(score, 9) desc, doc_id asc) order.
    The coordinator holds ONLY ``stats`` — vocabulary state is sharded in
    the resolvers, per-doc state in the range shards; nothing on any single
    process is O(vocab) or O(n_docs).  This is the serving layout sketched
    in the term-sharded engine's docstring for the 10^12-doc design point."""

    def __init__(self, index_dir: str, pool_size: int = 4,
                 resolver_pool_size: int = 2, handles: dict | None = None):
        from wikirec_ray.state.segments import load_stats

        # coordinator state: stats only.  Vocabulary (df) state lives in a
        # tpart-sharded DfResolver pool; per-doc state in the range shards.
        self.stats = load_stats(index_dir)
        self.index_dir = index_dir
        self._meta_cols_cache: list[str] | None = None
        # significant_terms background cache: {col: ({value: n}, n_bg)} —
        # query-independent and snapshot-frozen, so one shard fan-out per
        # column per coordinator lifetime (O(dictionary) state)
        self._bg_cache: dict[str, tuple[dict[str, int], int]] = {}
        self.n_tparts = int(self.stats.get("n_term_partitions", N_TERM_PARTITIONS))
        self.n_docs = self.stats["n_docs"]
        # precomputed composite terms (O(K) coordinator state, K = the
        # build's precompute_bigrams — thousands, not vocabulary-sized)
        from wikirec_ray.state.segments import load_bigram_pairs

        self.bigrams = frozenset(
            f"{a} {b}" for a, b in load_bigram_pairs(index_dir)
        )
        # ``handles`` ATTACHES this coordinator to an existing shard +
        # resolver pool instead of spawning one — the replication path: a
        # coordinator is O(1) state, so any number of them can serve over
        # the SAME immutable pool (see ReplicatedSearchTier).  An attached
        # coordinator does not own the pool and its shutdown() leaves the
        # actors running.
        self._owns_pool = handles is None
        if handles is not None:
            self.servers = list(handles["servers"])
            self.resolvers = list(handles["resolvers"])
            self.resolver_of = dict(handles["resolver_of"])
            self.n_ranges = int(handles["n_ranges"])
            return
        range_ids = _range_ids(index_dir)
        self.n_ranges = len(range_ids)
        self.servers = [
            RangeServer.remote(index_dir, rs)
            for rs in _round_robin(range_ids, pool_size)
        ]
        r_assign = _round_robin(list(range(self.n_tparts)), resolver_pool_size)
        self.resolver_of = {
            t: t % len(r_assign) for t in range(self.n_tparts)
        }
        self.resolvers = [
            DfResolver.remote(index_dir, ts) for ts in r_assign
        ]

    def handles(self) -> dict:
        """The shareable pool state: pass to another coordinator's
        ``handles=`` to serve over the same shard/resolver actors."""
        return {
            "servers": self.servers,
            "resolvers": self.resolvers,
            "resolver_of": self.resolver_of,
            "n_ranges": self.n_ranges,
        }

    def _resolve_idfs(self, terms: list[str]) -> dict[str, tuple[int, float]]:
        """Phase 1 shared by topk/phrase_topk: one batched round trip to the
        df owners; returns {term: (tpart, idf)} for the UNIQUE terms."""
        uniq = sorted(set(terms))
        tparts = {t: zlib.crc32(t.encode("utf-8")) % self.n_tparts for t in uniq}
        by_resolver: dict[int, list[str]] = {}
        for t in uniq:
            by_resolver.setdefault(self.resolver_of[tparts[t]], []).append(t)
        futures = {
            rid: self.resolvers[rid].resolve_idf.remote(ts)
            for rid, ts in by_resolver.items()
        }
        out: dict[str, tuple[int, float]] = {}
        for rid, ts in by_resolver.items():
            for t, v in zip(ts, ray.get(futures[rid])):
                out[t] = (tparts[t], v)
        return out

    def idfs(self, terms: list[str]) -> dict[str, float]:
        """{unique term: idf} in ONE batched resolver round trip — the
        engine-agnostic idf surface (`IndexReader.idfs` is the local twin)
        that query-rewrite helpers (more-like-this selection, PRF,
        synonym weighting) build on, so they serve distributed too."""
        return {t: v[1] for t, v in self._resolve_idfs(terms).items()}

    def dfs(self, terms: list[str]) -> dict[str, int]:
        """{unique term: document frequency} in batched resolver round
        trips (one per owning resolver) — the engine-agnostic df surface
        (`IndexReader.dfs` is the local twin); ``significant_text``'s
        corpus background."""
        uniq = sorted(set(terms))
        tparts = {
            t: zlib.crc32(t.encode("utf-8")) % self.n_tparts for t in uniq
        }
        by_resolver: dict[int, list[str]] = {}
        for t in uniq:
            by_resolver.setdefault(self.resolver_of[tparts[t]], []).append(t)
        futures = {
            rid: self.resolvers[rid].resolve_df.remote(ts)
            for rid, ts in by_resolver.items()
        }
        out: dict[str, int] = {}
        for rid, ts in by_resolver.items():
            for t, v in zip(ts, ray.get(futures[rid])):
                out[t] = v
        return out

    def meta_cols(self) -> list[str]:
        """Attribute columns available for ``col:value`` filters — [] when
        the index has no metadata sidecar (cached; the coordinator only
        needs the O(1) column list, per-range data lives in the shards)."""
        if self._meta_cols_cache is None:
            self._meta_cols_cache = _sidecar_cols(self.index_dir)
        return list(self._meta_cols_cache)

    def topk(self, terms: list[str], k: int,
             attrs: list[tuple[str, str]] | None = None,
             after: tuple[int, float] | None = None,
             weights: list[float] | None = None,
             ) -> list[tuple[int, float]]:
        from wikirec_ray.pipelines.query import aggregate_weights

        # the weighted-query normal form (FIRST-OCCURRENCE order, one
        # entry per unique term, idf scaled by the summed weight —
        # multiplicity when unweighted): a repeated query term contributes
        # once per occurrence, exactly like the local reader and the SQL
        # oracle's VALUES join (review r5 — the sorted unique list
        # silently halved duplicate-term scores here), and a boost
        # (Lucene term^2.5) scales idf HERE on the coordinator —
        # contributions are linear in idf, so the range shards need no
        # weight plumbing at all.
        agg = aggregate_weights(terms, weights)
        resolved = self._resolve_idfs(terms)
        twi = [
            (t, resolved[t][0], resolved[t][1] * w)
            for t, w in agg.items() if resolved[t][1] != 0.0
        ]
        if not twi:
            return []
        # phase 2: fan out to every range shard, merge partial top-k
        partials = ray.get(
            [s.topk.remote(twi, k, attrs, after) for s in self.servers]
        )
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def prior_topk(
        self, terms: list[str], k: int,
        prior_col: str, prior_weight: float = 1.0,
        attrs: list[tuple[str, str]] | None = None,
        after: tuple[int, float] | None = None,
        weights: list[float] | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed static-score ranking (== ``IndexReader.prior_topk``):
        BM25 decides membership, ``prior_weight × prior_col`` re-ranks —
        the prior arrays live IN the range shards (O(range) each, parsed
        from the shard's own meta sidecar slice), so the coordinator ships
        only the (col, weight) pair.  Each doc lives in exactly one shard;
        the merge is unchanged."""
        w = float(prior_weight)
        if not math.isfinite(w):
            raise ValueError(f"prior_weight must be finite, got {w!r}")
        if prior_col not in self.meta_cols():
            # eager, like the local reader: a typo'd column must raise
            # even when no term matches (not a silent [])
            raise KeyError(
                f"metadata column {prior_col!r} not in the sidecar "
                f"(has {self.meta_cols()})"
            )
        from wikirec_ray.pipelines.query import aggregate_weights

        agg = aggregate_weights(terms, weights)
        resolved = self._resolve_idfs(terms)
        twi = [
            (t, resolved[t][0], resolved[t][1] * ww)
            for t, ww in agg.items() if resolved[t][1] != 0.0
        ]
        if not twi:
            return []
        partials = ray.get([
            s.prior_topk.remote(twi, k, prior_col, w, attrs, after)
            for s in self.servers
        ])
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def boolean_topk(
        self,
        should: list[str],
        must: list[str] | tuple = (),
        must_not: list[str] | tuple = (),
        k: int = 10,
        attrs: list[tuple[str, str]] | None = None,
        after: tuple[int, float] | None = None,
        min_should_match: int = 0,
    ) -> list[tuple[int, float]]:
        """Distributed boolean retrieval (== ``IndexReader.boolean_topk``):
        every doc lives in exactly one range shard, so must/must_not
        filtering and scoring are shard-local and the global top-k is the
        merge of per-shard partials.  (The term-sharded engine cannot
        filter conjunctively without shipping doc sets between shards —
        same limitation as phrase/NEAR, documented there.)
        ``min_should_match`` ships the distinct ``should`` terms to the
        shards as the quorum set — presence is per-doc, so the quorum is
        decided shard-locally, exactly like the ``must`` mask."""
        from wikirec_ray.pipelines.query import validate_min_should_match

        should, must, must_not = list(should), list(must), list(must_not)
        msm = validate_min_should_match(min_should_match)
        if not should and not must:
            return []
        should_set = sorted(set(should))
        if msm > len(should_set):
            return []
        resolved = self._resolve_idfs(should + must + must_not)
        must_set = sorted(set(must))
        if any(resolved[t][1] == 0.0 for t in must_set):
            return []  # absent must term -> empty conjunction
        # scoring terms in QUERY order with duplicates kept (engine-wide
        # duplicate-occurrence contract); filters use the distinct sets
        score_twi = [
            (t, *resolved[t]) for t in should + must if resolved[t][1] != 0.0
        ]
        if not score_twi:
            return []
        must_twi = [(t, *resolved[t]) for t in must_set]
        not_twi = [
            (t, *resolved[t])
            for t in sorted(set(must_not)) if resolved[t][1] != 0.0
        ]
        # OOV should terms can never post — dropping them from the shipped
        # quorum set changes no per-doc count (the quorum THRESHOLD keeps
        # the full distinct-should arity via the early-exit above)
        msm_twt = [
            (t, resolved[t][0]) for t in should_set if resolved[t][1] != 0.0
        ] if msm else None
        partials = ray.get([
            s.boolean_topk.remote(
                score_twi, must_twi, not_twi, k, attrs, after, msm_twt, msm
            )
            for s in self.servers
        ])
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def facet_counts(
        self, terms: list[str], col: str, k: int = 10
    ) -> list[tuple[str, int]]:
        """Distributed facet counts (== ``IndexReader.facet_counts``):
        each shard counts ``col`` values over its own OR-matched alive
        docs; the coordinator sums the dicts and keeps the global top-k
        under (count desc, value asc).  Exact, not approximate — every doc
        lives in exactly one shard."""
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        partials = ray.get(
            [s.facet_counts.remote(twt, col) for s in self.servers]
        )
        merged: dict[str, int] = {}
        for p in partials:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
        return sorted(merged.items(), key=lambda it: (-it[1], it[0]))[:k]

    def boosting_topk(
        self, terms: list[str], k: int, negative: list[str],
        negative_boost: float = 0.5,
        attrs: list[tuple[str, str]] | None = None,
        after: tuple[int, float] | None = None,
        weights: list[float] | None = None,
    ) -> list[tuple[int, float]]:
        """Distributed ES-``boosting`` query (==
        ``IndexReader.boosting_topk``): one idf resolve covers the
        positive AND negative term sets, shards demote range-locally and
        return their top-k, the coordinator merges — exact, demotion is
        per-doc and every doc lives in exactly one shard."""
        import math as _math

        from wikirec_ray.pipelines.query import aggregate_weights

        if not (0.0 < negative_boost <= 1.0) or not _math.isfinite(
                negative_boost):
            raise ValueError(
                "boosting_topk: negative_boost must be in (0, 1]")
        agg = aggregate_weights(terms, weights)
        resolved = self._resolve_idfs(list(agg) + list(negative))
        twi = [
            (t, resolved[t][0], resolved[t][1] * w)
            for t, w in agg.items() if resolved[t][1] != 0.0
        ]
        if not twi:
            return []
        neg_twt = [
            (t, resolved[t][0])
            for t in sorted(set(negative)) if resolved[t][1] != 0.0
        ]
        partials = ray.get([
            s.boosting_topk.remote(twi, neg_twt, negative_boost, k,
                                   attrs, after)
            for s in self.servers
        ])
        merged = [h for p in partials for h in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def multi_terms(
        self, terms: list[str], cols: list[str], k: int = 10,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[tuple[tuple[str, ...], int]]:
        """Distributed ``multi_terms`` (== ``IndexReader.multi_terms``):
        shards return {composite value tuple: count} dicts over their own
        matches, the coordinator sums and applies the same (count desc,
        key tuple asc) order and k cut — exact, every doc lives in
        exactly one shard."""
        if k < 1:
            return []
        if len(cols) < 2:
            raise ValueError("multi_terms needs at least 2 columns "
                             "(use facet_counts for one)")
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        partials = ray.get([
            s.multi_value_counts.remote(twt, list(cols), attrs)
            for s in self.servers
        ])
        merged: dict[tuple[str, ...], int] = {}
        for p in partials:
            for t, n in p.items():
                merged[t] = merged.get(t, 0) + n
        return sorted(merged.items(),
                      key=lambda it: (-it[1], it[0]))[:k]

    def rare_terms(
        self, terms: list[str], col: str, k: int = 10,
        max_doc_count: int | None = None,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[tuple[str, int]]:
        """Distributed ``rare_terms`` (== ``IndexReader.rare_terms``):
        the same attrs-filtered facet partials as every terms-family
        aggregation, merged then ordered ASCENDING (count, value) with
        the optional ``max_doc_count`` cap applied AFTER the merge —
        necessarily, since a value rare on one shard may be common
        globally.  Exact, every doc lives in exactly one shard."""
        if k < 1:
            return []
        if max_doc_count is not None and max_doc_count < 1:
            raise ValueError("rare_terms: max_doc_count must be >= 1")
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        partials = ray.get([
            s.facet_counts.remote(twt, col, attrs) for s in self.servers
        ])
        merged: dict[str, int] = {}
        for p in partials:
            for v, n in p.items():
                merged[v] = merged.get(v, 0) + n
        return sorted(
            ((v, n) for v, n in merged.items()
             if max_doc_count is None or n <= max_doc_count),
            key=lambda it: (it[1], it[0]),
        )[:k]

    def top_hits_by(
        self, terms: list[str], col: str, n_buckets: int = 10,
        k_per_bucket: int = 3,
        attrs: list[tuple[str, str]] | None = None,
        weights: list[float] | None = None,
    ) -> list[dict]:
        """Distributed terms+top_hits sub-aggregation (==
        ``IndexReader.top_hits_by``): round 1 picks the top buckets from
        the shards' bounded facet partials (match count desc, value asc);
        round 2 asks every shard for its per-value top-k of ONLY those
        values (payload O(n_buckets × k) per shard); the coordinator
        merges per value under the global ranking order — exact, every
        doc lives in exactly one shard."""
        from wikirec_ray.pipelines.query import aggregate_weights

        if n_buckets < 1 or k_per_bucket < 1:
            return []
        agg = aggregate_weights(terms, weights)
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        twi = [
            (t, resolved[t][0], resolved[t][1] * w)
            for t, w in agg.items() if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        fg_parts = ray.get([
            s.facet_counts.remote(twt, col, attrs) for s in self.servers
        ])
        counts: dict[str, int] = {}
        for p in fg_parts:
            for v, n in p.items():
                counts[v] = counts.get(v, 0) + n
        top = sorted(counts.items(), key=lambda it: (-it[1], it[0]))
        top = top[:n_buckets]
        if not top:
            return []
        wanted = [v for v, _ in top]
        hit_parts = ray.get([
            s.top_hits_for_values.remote(twi, col, wanted, k_per_bucket,
                                         attrs)
            for s in self.servers
        ])
        out = []
        for v, n in top:
            merged = [h for p in hit_parts for h in p.get(v, ())]
            merged.sort(key=lambda h: (-h[1], h[0]))
            out.append({"value": v, "n_docs": int(n),
                        "hits": merged[:k_per_bucket]})
        return out

    def attr_values(
        self, docs: list[int], cols: list[str]
    ) -> dict[int, dict[str, str]]:
        """Distributed ``docvalue_fields`` hit decoration (==
        ``IndexReader.attr_values``): every shard returns values for the
        docs in its own ranges, the coordinator unions — exact, each doc
        lives in exactly one shard.  A doc no shard covered raises (it is
        not in the served index, or its sidecar is stale)."""
        if not docs:
            return {}
        parts = ray.get([
            s.attr_values.remote(list(docs), list(cols))
            for s in self.servers
        ])
        out: dict[int, dict[str, str]] = {}
        for p in parts:
            out.update(p)
        missing = [int(d) for d in docs if int(d) not in out]
        if missing:
            raise RuntimeError(
                f"doc {missing[0]} is in no served range's metadata "
                f"sidecar — stale meta/ or a doc outside the index"
            )
        return out

    def significant_terms(
        self, terms: list[str], col: str, k: int = 10,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[dict]:
        """Distributed ``significant_terms`` (==
        ``IndexReader.significant_terms``): shards return foreground
        {value: match count} dicts (the attrs-filtered facet partial) and
        — once per column, cached — background {value: alive count}
        dicts; the coordinator sums both sides and runs the shared JLH
        kernel.  Exact: every doc lives in exactly one shard, and the
        background is query-independent snapshot state."""
        from wikirec_ray.pipelines.query import _score_significant

        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        bg_cached = self._bg_cache.get(col)
        fg_refs = [
            s.facet_counts.remote(twt, col, attrs) for s in self.servers
        ]
        if bg_cached is None:
            bg_parts = ray.get([
                s.background_value_counts.remote(col) for s in self.servers
            ])
            bg: dict[str, int] = {}
            for p in bg_parts:
                for v, n in p.items():
                    bg[v] = bg.get(v, 0) + n
            bg_cached = (bg, sum(bg.values()))
            self._bg_cache[col] = bg_cached
        bg, n_bg = bg_cached
        fg: dict[str, int] = {}
        for p in ray.get(fg_refs):
            for v, n in p.items():
                fg[v] = fg.get(v, 0) + n
        n_fg = sum(fg.values())
        if n_fg == 0:
            return []
        return _score_significant(fg, n_fg, bg, n_bg, k)

    def _stats_partials(
        self, terms: list[str], col: str,
        attrs: list[tuple[str, str]] | None,
    ) -> list[tuple[int, float, float | None, float | None, float]] | None:
        """Fan the (count, sum, min, max, sum_sq) stats partial out to
        every shard — the shared leg of ``metric_stats`` and
        ``extended_stats``.  None when no query term exists in the index
        (the empty-shape fast path, no shard round-trip)."""
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return None
        return ray.get(
            [s.metric_stats.remote(twt, col, attrs) for s in self.servers]
        )

    def metric_stats(
        self, terms: list[str], col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict:
        """Distributed stats aggregation (== ``IndexReader.metric_stats``):
        each shard returns its (count, sum, min, max, sum_sq) partial over
        its own OR-matched alive docs under the strict numeric parse; the
        coordinator sums counts/sums and takes min-of-mins / max-of-maxes
        — exact, every doc lives in exactly one shard.  Partials merge in
        fixed shard order so the float sum is deterministic run to run."""
        empty = {"count": 0, "sum": 0.0, "min": None, "max": None,
                 "avg": None}
        partials = self._stats_partials(terms, col, attrs)
        if partials is None:
            return empty
        cnt = sum(p[0] for p in partials)
        if cnt == 0:
            return empty
        tot = 0.0
        for p in partials:
            tot += p[1]
        mins = [p[2] for p in partials if p[2] is not None]
        maxes = [p[3] for p in partials if p[3] is not None]
        return {
            "count": int(cnt),
            "sum": float(tot),
            "min": float(min(mins)),
            "max": float(max(maxes)),
            "avg": float(tot / cnt),
        }

    def extended_stats(
        self, terms: list[str], col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict:
        """Distributed ``extended_stats`` (==
        ``IndexReader.extended_stats``): the same shard partials as
        ``metric_stats`` carry sum_of_squares, so variance/std come from
        the merged scalars with no extra round-trip — variance is
        ``sum_sq/n - mean²`` clamped at 0, the IDENTICAL formula the local
        reader applies, so local and served differ only by float-sum
        reordering across shards."""
        empty = {"count": 0, "sum": 0.0, "sum_of_squares": 0.0,
                 "min": None, "max": None, "avg": None,
                 "variance": None, "std_deviation": None}
        partials = self._stats_partials(terms, col, attrs)
        if partials is None:
            return empty
        cnt = sum(p[0] for p in partials)
        if cnt == 0:
            return empty
        tot, sum_sq = 0.0, 0.0
        for p in partials:
            tot += p[1]
            sum_sq += p[4]
        mins = [p[2] for p in partials if p[2] is not None]
        maxes = [p[3] for p in partials if p[3] is not None]
        mean = tot / cnt
        var = max(sum_sq / cnt - mean * mean, 0.0)
        return {
            "count": int(cnt),
            "sum": float(tot),
            "sum_of_squares": float(sum_sq),
            "min": float(min(mins)),
            "max": float(max(maxes)),
            "avg": float(mean),
            "variance": float(var),
            "std_deviation": float(np.sqrt(var)),
        }

    def grouped_stats(
        self, terms: list[str], by_col: str, val_col: str, k: int = 10,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[dict]:
        """Distributed terms+stats sub-aggregation (==
        ``IndexReader.grouped_stats``): shards return {by-value: (n_match,
        n_contrib, sum, min, max)} partials bounded by the by-column's
        dictionary size; the coordinator merges per value in fixed shard
        order (deterministic float sums), then applies the SAME bucket
        order and top-k cut as the local reader (match count desc, value
        asc) — exact, every doc lives in exactly one shard."""
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        partials = ray.get([
            s.grouped_stats.remote(twt, by_col, val_col, attrs)
            for s in self.servers
        ])
        merged: dict[str, tuple[int, int, float, float | None, float | None]] = {}
        for p in partials:
            for v, (nm, nc, tot, mn, mx) in p.items():
                pnm, pnc, ptot, pmn, pmx = merged.get(
                    v, (0, 0, 0.0, None, None))
                merged[v] = (
                    pnm + nm, pnc + nc, ptot + tot,
                    mn if pmn is None else pmn if mn is None
                    else min(pmn, mn),
                    mx if pmx is None else pmx if mx is None
                    else max(pmx, mx),
                )
        top = sorted(merged.items(), key=lambda it: (-it[1][0], it[0]))[:k]
        out = []
        for v, (nm, nc, tot, mn, mx) in top:
            bucket = {"value": v, "n_docs": int(nm), "count": int(nc)}
            if nc == 0:
                bucket.update(sum=0.0, min=None, max=None, avg=None)
            else:
                bucket.update(sum=float(tot), min=float(mn), max=float(mx),
                              avg=float(tot / nc))
            out.append(bucket)
        return out

    def cardinality(
        self, terms: list[str], col: str,
        attrs: list[tuple[str, str]] | None = None,
    ) -> int:
        """Distributed exact cardinality aggregation (==
        ``IndexReader.cardinality``): shards return their DISTINCT stored
        values of ``col`` over their own OR-matched alive docs (bounded by
        the column's dictionary size), the coordinator counts the union —
        exact, a value seen in two shards is one value."""
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return 0
        partials = ray.get([
            s.distinct_values.remote(twt, col, attrs)
            for s in self.servers
        ])
        return len({v for p in partials for v in p})

    def percentiles(
        self, terms: list[str], col: str,
        percents: tuple[float, ...] = (25.0, 50.0, 75.0, 95.0, 99.0),
        attrs: list[tuple[str, str]] | None = None,
    ) -> dict[float, float | None]:
        """Distributed EXACT percentiles (==
        ``IndexReader.percentiles``): shards return {parsed value: count}
        multiset partials bounded by the sidecar dictionary; the
        coordinator merges, sorts, and runs the IDENTICAL
        linear-interpolation kernel as the local reader — bit-for-bit
        equal, where ES itself settles for t-digest."""
        from wikirec_ray.pipelines.query import _weighted_percentiles

        for p in percents:
            if not (0.0 <= float(p) <= 100.0):
                raise ValueError(
                    f"percentiles: percent {p} not in [0, 100]")
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return {float(p): None for p in percents}
        partials = ray.get([
            s.numeric_value_counts.remote(twt, col, attrs)
            for s in self.servers
        ])
        merged: dict[float, int] = {}
        for p in partials:
            for v, c in p.items():
                merged[v] = merged.get(v, 0) + c
        if not merged:
            return {float(p): None for p in percents}
        keys = np.array(sorted(merged), np.float64)
        counts = np.array([merged[float(k)] for k in keys], np.int64)
        return _weighted_percentiles(keys, counts, percents)

    def histogram(
        self, terms: list[str], col: str, interval: float,
        attrs: list[tuple[str, str]] | None = None,
    ) -> list[tuple[float, int]]:
        """Distributed histogram aggregation (==
        ``IndexReader.histogram``): shards return {bucket_index: count}
        dicts over their own matches (indices are integer-valued float64,
        exact across shards), the coordinator sums and converts to
        ascending (index × interval, count) pairs once — exact, every doc
        lives in exactly one shard."""
        interval = float(interval)
        if not np.isfinite(interval) or interval <= 0:
            raise ValueError("histogram: interval must be finite and > 0")
        resolved = self._resolve_idfs(terms)
        twt = [
            (t, resolved[t][0])
            for t in sorted(set(terms)) if resolved[t][1] != 0.0
        ]
        if not twt:
            return []
        partials = ray.get([
            s.histogram.remote(twt, col, interval, attrs)
            for s in self.servers
        ])
        merged: dict[float, int] = {}
        for p in partials:
            for i, c in p.items():
                merged[i] = merged.get(i, 0) + c
        return [(float(i * interval), int(merged[i]))
                for i in sorted(merged)]

    def filtered_topk(
        self, terms: list[str], k: int, col: str, value: str
    ) -> list[tuple[int, float]]:
        """Distributed metadata-filtered top-k (==
        ``IndexReader.filtered_topk``): the attribute predicate is shard-
        local (each shard holds its ranges' sidecar), scoring is the plain
        ``topk`` contract.  Shorthand for
        ``topk(terms, k, attrs=[(col, value)])``."""
        return self.topk(terms, k, attrs=[(col, value)])

    def collapsed_topk(
        self, terms: list[str], k: int, col: str,
        attrs: list[tuple[str, str]] | None = None,
        after: tuple[int, float] | None = None,
        weights: list[float] | None = None,
    ) -> list[tuple[int, float, str]]:
        """Distributed field-collapsed top-k (==
        ``IndexReader.collapsed_topk``): each shard returns its best doc
        per distinct ``col`` value (k winners), the coordinator walks the
        merged partials best-first keeping the first doc per value.
        Exact: a doc lives in exactly one shard, and a key whose winner
        fell off a shard's k-list is beaten by k keys in that shard alone
        (see ``RangeServer.collapsed_topk``).  ``weights`` = optional
        per-occurrence boosts, applied to the unique-term idfs here on
        the coordinator (the same weighted normal form as ``topk``)."""
        from wikirec_ray.pipelines.query import aggregate_weights

        agg = aggregate_weights(terms, weights)
        resolved = self._resolve_idfs(terms)
        twi = [
            (t, resolved[t][0], resolved[t][1] * w)
            for t, w in agg.items() if resolved[t][1] != 0.0
        ]
        if not twi:
            return []
        partials = ray.get([
            s.collapsed_topk.remote(twi, k, col, attrs, after)
            for s in self.servers
        ])
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        seen: set[str] = set()
        kept: list[tuple[int, float, str]] = []
        for d, s, v in merged:
            if v not in seen:
                seen.add(v)
                kept.append((d, s, v))
                if len(kept) == k:
                    break
        return kept

    def phrase_topk(self, terms: list[str], k: int,
                    attrs: list[tuple[str, str]] | None = None,
                    after: tuple[int, float] | None = None,
                    ) -> list[tuple[int, float]]:
        """Distributed exact-phrase top-k (positional index required) —
        must equal ``IndexReader.phrase_topk``.  Same two phases as ``topk``;
        shards check adjacency locally because every doc lives wholly inside
        one doc range."""
        if not terms:
            return []
        resolved = self._resolve_idfs(terms)
        if any(resolved[t][1] == 0.0 for t in terms):
            return []  # a term absent from the corpus → no phrase anywhere
        twi = [(t, *resolved[t]) for t in terms]  # PHRASE order
        if len(terms) == 2:
            comp = f"{terms[0]} {terms[1]}"
            if comp in self.bigrams:
                comp_tpart = zlib.crc32(comp.encode("utf-8")) % self.n_tparts
                partials = ray.get([
                    s.precomputed_phrase_topk.remote(
                        comp, comp_tpart, twi, k, attrs, after
                    )
                    for s in self.servers
                ])
                merged = [hit for p in partials for hit in p]
                merged.sort(key=lambda x: (-x[1], x[0]))
                return merged[:k]
        # 3+-term phrases: precomputed consecutive sub-pairs prune shard
        # candidates before the positional chain (pairing rule owned by
        # query.precomputed_subpairs — shared with the local reader)
        from wikirec_ray.pipelines.query import precomputed_subpairs

        sub_comps = []
        if len(terms) > 2 and self.bigrams:
            sub_comps = [
                (comp, zlib.crc32(comp.encode("utf-8")) % self.n_tparts)
                for comp in precomputed_subpairs(terms, self.bigrams)
            ]
        partials = ray.get(
            [s.phrase_topk.remote(twi, k, sub_comps, attrs, after)
             for s in self.servers]
        )
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def sloppy_phrase_topk(self, terms: list[str], k: int, slop: int = 0,
                           attrs: list[tuple[str, str]] | None = None,
                           after: tuple[int, float] | None = None,
                           ) -> list[tuple[int, float]]:
        """Distributed sloppy phrase (in-order span, slack <= slop) —
        must equal ``IndexReader.sloppy_phrase_topk``.  slop=0 routes to
        the exact-phrase path (and its precomputed-bigram fast path);
        otherwise the span predicate is per-doc, so shards match locally
        with the shared kernel."""
        if not terms or slop < 0:
            return []
        if slop > NEAR_WINDOW_MAX:
            raise ValueError(
                "sloppy_phrase_topk: slop must be <= 2^31 - 1"
            )
        if slop == 0:
            return self.phrase_topk(terms, k, attrs=attrs, after=after)
        resolved = self._resolve_idfs(terms)
        if any(resolved[t][1] == 0.0 for t in terms):
            return []  # a term absent from the corpus → no match
        twi = [(t, *resolved[t]) for t in terms]  # PHRASE order
        partials = ray.get(
            [s.sloppy_phrase_topk.remote(twi, slop, k, attrs, after)
             for s in self.servers]
        )
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def near_topk(self, terms: list[str], k: int, window: int = 8,
                  attrs: list[tuple[str, str]] | None = None,
                  after: tuple[int, float] | None = None,
                  ) -> list[tuple[int, float]]:
        """Distributed proximity (NEAR) top-k — must equal
        ``IndexReader.near_topk``.  The coordinator fixes the anchor from
        GLOBAL dfs: idf is strictly decreasing in df, so max idf (ties →
        lexicographically smallest term) IS the local reader's
        (df, term)-min anchor rule; proximity is then per-doc, so each
        range shard resolves its own matches with the shared kernel."""
        if not terms or window < 0:
            return []
        if window > NEAR_WINDOW_MAX:
            raise ValueError("near_topk: window must be <= 2^31 - 1")
        resolved = self._resolve_idfs(terms)
        if any(resolved[t][1] == 0.0 for t in terms):
            return []  # a term absent from the corpus → no NEAR match
        anchor = min(sorted(set(terms)),
                     key=lambda t: (-resolved[t][1], t))
        twi = [(t, *resolved[t]) for t in terms]  # query order, dups kept
        partials = ray.get(
            [s.near_topk.remote(twi, anchor, window, k, attrs, after)
             for s in self.servers]
        )
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    # ---- vocabulary lexicon, served.  Each DfResolver ranks only its own
    # tparts' vocabulary and every term lives in exactly ONE tpart, so the
    # per-shard results are disjoint and the coordinator merge is a plain
    # (df desc, term asc) re-sort + cut — never a re-aggregation; state
    # stays O(vocab/P) per resolver, O(k) on the coordinator.

    def suggest(self, prefix: str, k: int = 10) -> list[tuple[str, int]]:
        """Distributed autocomplete — must equal ``IndexReader.suggest``."""
        if k <= 0:
            return []
        parts = ray.get([r.suggest.remote(prefix, k) for r in self.resolvers])
        merged = [tn for p in parts for tn in p]
        merged.sort(key=lambda tn: (-tn[1], tn[0]))
        return merged[:k]

    def suggest_suffix(self, suffix: str, k: int = 10) -> list[tuple[str, int]]:
        """Distributed leading-wildcard completion — must equal
        ``IndexReader.suggest_suffix`` (per-tpart shards are disjoint and
        every shard uses the same (df desc, term asc) cut, so per-shard
        top-k + re-sort is the global top-k)."""
        if k <= 0:
            return []
        parts = ray.get(
            [r.suggest_suffix.remote(suffix, k) for r in self.resolvers]
        )
        merged = [tn for p in parts for tn in p]
        merged.sort(key=lambda tn: (-tn[1], tn[0]))
        return merged[:k]

    def regex_terms(self, pattern: str, k: int = 10) -> list[tuple[str, int]]:
        """Distributed whole-term regex expansion — must equal
        ``IndexReader.regex_terms`` (same disjoint-shard concat-merge as
        ``suggest``; an invalid pattern raises from every shard — Ray
        surfaces it as a ``ValueError`` subclass, matching local)."""
        if k <= 0:
            return []
        parts = ray.get(
            [r.regex_terms.remote(pattern, k) for r in self.resolvers]
        )
        merged = [tn for p in parts for tn in p]
        merged.sort(key=lambda tn: (-tn[1], tn[0]))
        return merged[:k]

    def _expand(
        self, items: list, cap: int | None = None
    ) -> list[list[tuple[str, int]]]:
        """One batched round trip: per input term or (term, d) pair, the
        merged (df desc, term asc) levenshtein<=d neighborhood across all
        resolvers.  With ``cap``, each resolver ships at most cap rows
        per occurrence and the merge is cut to cap — identical to the
        local reader's capped expansion (shards are disjoint and share
        the total order), but the d=2 ~10³-term neighborhoods never
        cross the wire."""
        parts = ray.get(
            [r.expand_terms.remote(items, cap) for r in self.resolvers]
        )
        out = []
        for i in range(len(items)):
            exp = [tn for p in parts for tn in p[i]]
            exp.sort(key=lambda tn: (-tn[1], tn[0]))
            out.append(exp if cap is None else exp[:cap])
        return out

    def fuzzy_expand(self, term: str, d: int = 1) -> list[tuple[str, int]]:
        """Must equal ``IndexReader.fuzzy_expand``."""
        return self._expand([(term, d)])[0]

    def fuzzy_expand_many(
        self, items: list, cap: int | None = None
    ) -> list[list[tuple[str, int]]]:
        """Batched expansion — the ``search()`` ~ surface resolves all of
        a query's typo terms (plain, or (term, d) pairs) through this in
        ONE resolver round trip, capped per occurrence for retrieval
        callers."""
        return self._expand(items, cap)

    def fuzzy_topk(self, terms: list[str], k: int,
                   attrs: list[tuple[str, str]] | None = None,
                   d: int = 1,
                   after: tuple[int, float] | None = None,
                   ) -> list[tuple[int, float]]:
        """Typo-tolerant BM25 top-k — must equal ``IndexReader.fuzzy_topk``:
        each occurrence expands to its neighborhood, then the plain
        distributed scorer runs over the multiset (one expand round trip
        to the resolvers, then topk's own idf phase — two phase-1 trips,
        the price of reusing the duplicate-occurrence scoring path)."""
        expanded = [
            v for exp in self._expand([(t, d) for t in terms],
                                      cap=FUZZY_EXPANSION_MAX)
            for v, _ in exp
        ]
        if not expanded:
            return []
        return self.topk(expanded, k, attrs=attrs, after=after)

    def shutdown(self):
        if self._owns_pool:
            for s in self.servers + self.resolvers:
                ray.kill(s)
        self.servers = []
        self.resolvers = []


class MultiFieldShardedEngine:
    """Coordinator over a ``MultiFieldRangeShard`` pool — the served twin
    of ``pipelines/multifield.MultiFieldReader`` (Lucene/ES ``multi_match
    most_fields``): per-field idf resolves at per-FIELD ``DfResolver``
    pools (each field has its own vocabulary and df — one batched round
    trip covering every field), then the query fans out to doc-range
    shards that sum ``field_weight × field BM25`` range-locally.  Each doc
    lives in exactly one shard, so the global top-k is the merge of
    per-shard partials, unchanged from the single-field coordinator; the
    coordinator holds only stats-scale state.  pytest pins served ==
    ``MultiFieldReader`` (``tests/test_multifield.py``)."""

    def __init__(self, fields: list[tuple], pool_size: int = 4,
                 resolver_pool_size: int = 2, mode: str = "most_fields",
                 tie_breaker: float = 0.0):
        from wikirec_ray.state.segments import load_stats

        if not fields:
            raise ValueError(
                "MultiFieldShardedEngine needs at least one field"
            )
        if mode not in ("most_fields", "best_fields"):
            raise ValueError(
                f"mode must be 'most_fields' or 'best_fields', got {mode!r}"
            )
        tie_breaker = float(tie_breaker)
        if not (0.0 <= tie_breaker <= 1.0) or not math.isfinite(tie_breaker):
            raise ValueError("tie_breaker must be in [0, 1]")
        self.mode = mode
        self.tie_breaker = tie_breaker
        self.field_dirs: list[str] = []
        self.field_weights: list[float] = []
        for d, w in fields:
            w = float(w)
            if not math.isfinite(w) or w <= 0.0:
                raise ValueError(
                    f"field weights must be finite and > 0, got {w!r}"
                )
            self.field_dirs.append(d)
            self.field_weights.append(w)
        field_stats = [load_stats(d) for d in self.field_dirs]
        self.field_ntparts = [
            int(s.get("n_term_partitions", N_TERM_PARTITIONS))
            for s in field_stats
        ]
        self._meta_cols_cache: list[str] | None = None
        # both the range LAYOUT and the doc COUNT must agree — a shorter
        # field corpus can share every range file name while missing
        # trailing docs inside the last range, the case the local
        # MultiFieldReader rejects by norms length (review r5)
        n = {int(s["n_docs"]) for s in field_stats}
        range_ids = _range_ids(self.field_dirs[0])
        if len(n) != 1 or any(
            _range_ids(d) != range_ids for d in self.field_dirs[1:]
        ):
            raise ValueError(
                f"field indexes disagree on the doc-id space (n_docs "
                f"{sorted(n)}) — every field must be built over the same "
                f"corpus rows"
            )
        self.n_ranges = len(range_ids)
        self.shards = [
            MultiFieldRangeShard.remote(self.field_dirs, rs)
            for rs in _round_robin(range_ids, pool_size)
        ]
        # one resolver pool per field: vocabulary state is per-field by
        # design (a term rare in titles but common in bodies must resolve
        # to DIFFERENT idfs)
        self.resolvers: list[list] = []
        self.resolver_of: list[dict[int, int]] = []
        for d, nt in zip(self.field_dirs, self.field_ntparts):
            r_assign = _round_robin(list(range(nt)), resolver_pool_size)
            self.resolvers.append([DfResolver.remote(d, ts) for ts in r_assign])
            self.resolver_of.append({t: t % len(r_assign) for t in range(nt)})

    def meta_cols(self) -> list[str]:
        """Attribute columns of the PRIMARY field's sidecar (fields share
        doc ids; pinning one keeps filter semantics deterministic, same as
        the local ``MultiFieldReader``)."""
        if self._meta_cols_cache is None:
            self._meta_cols_cache = _sidecar_cols(self.field_dirs[0])
        return list(self._meta_cols_cache)

    def topk(self, terms: list[str], k: int,
             attrs: list[tuple[str, str]] | None = None,
             after: tuple[int, float] | None = None,
             weights: list[float] | None = None,
             ) -> list[tuple[int, float]]:
        from wikirec_ray.pipelines.query import aggregate_weights

        agg = aggregate_weights(terms, weights)
        uniq = sorted(agg)
        if not uniq:
            return []
        # phase 1: resolve every field's idfs in ONE batched round trip —
        # all resolver futures launched before any get; each term's tpart
        # is hashed once per field and reused for the twi build
        tparts: list[dict[str, int]] = [
            {t: zlib.crc32(t.encode("utf-8")) % nt for t in uniq}
            for nt in self.field_ntparts
        ]
        futures: list[tuple[int, int, list[str]]] = []
        handles = []
        for fi in range(len(self.field_dirs)):
            by_r: dict[int, list[str]] = {}
            for t in uniq:
                by_r.setdefault(
                    self.resolver_of[fi][tparts[fi][t]], []
                ).append(t)
            for rid, ts in by_r.items():
                futures.append((fi, rid, ts))
                handles.append(self.resolvers[fi][rid].resolve_idf.remote(ts))
        results = ray.get(handles)
        resolved: list[dict[str, float]] = [{} for _ in self.field_dirs]
        for (fi, _rid, ts), vals in zip(futures, results):
            for t, v in zip(ts, vals):
                resolved[fi][t] = v
        per_field_twi: list[list[tuple[str, int, float]]] = [
            [
                (t, tparts[fi][t], resolved[fi][t] * w)
                for t, w in agg.items() if resolved[fi][t] != 0.0
            ]
            for fi in range(len(self.field_dirs))
        ]
        if not any(per_field_twi):
            return []
        # phase 2: fan out; each shard returns its combined-field top-k
        # (most_fields sum or best_fields DisMax, per the engine's mode)
        partials = ray.get([
            s.topk.remote(per_field_twi, self.field_weights, k, attrs,
                          after, self.mode, self.tie_breaker)
            for s in self.shards
        ])
        merged = [hit for p in partials for hit in p]
        merged.sort(key=lambda x: (-x[1], x[0]))
        return merged[:k]

    def shutdown(self):
        for s in self.shards:
            ray.kill(s)
        for pool in self.resolvers:
            for a in pool:
                ray.kill(a)
        self.shards = []
        self.resolvers = []


@ray.remote
class SearchCoordinator:
    """A coordinator replica as an ACTOR: an attached
    ``RangeShardedQueryEngine`` (O(1) state — stats + the O(K) bigram set)
    over a shared shard/resolver pool, exposing the ``search()``
    query-string surface.  Replicating the coordinator is the serving
    scale path: the single-process coordinator tops out ~150 QPS on the
    driver's Python merge + ``ray.get`` round-trips (BASELINE.md), while
    the shards underneath are idle-capable, so QPS scales with coordinator
    count until the shard pool saturates."""

    def __init__(self, index_dir: str, handles: dict):
        from wikirec_ray.pipelines.query import search as _search

        self._search = _search
        self.eng = RangeShardedQueryEngine(index_dir, handles=handles)

    def search(self, query: str, k: int = 10,
               after: tuple[int, float] | None = None,
               min_should_match: int = 0
               ) -> list[tuple[int, float]]:
        return self._search(self.eng, query, k, after=after,
                            min_should_match=min_should_match)

    def topk(self, terms: list[str], k: int) -> list[tuple[int, float]]:
        return self.eng.topk(terms, k)


class ReplicatedSearchTier:
    """N ``SearchCoordinator`` replicas over ``n_pools`` shard/resolver
    pool REPLICAS (coordinator i attaches to pool i % n_pools).

    ``search()`` routes a query string to a replica (round-robin by
    ``client_id``) and blocks for the result; ``submit()`` returns the
    ``ObjectRef`` for callers overlapping their own requests.  The tier
    owns both the replicas and the pools: ``shutdown()`` kills everything.

    The two replication knobs are the serving scale path, in order: extra
    COORDINATORS parallelize the per-query resolve + fan-out + merge past
    the ~150 QPS single-process ceiling, until the shard pool itself
    saturates; extra POOLS then multiply shard capacity — a range-sharded
    query fans out to every shard of its pool, so adding shards to one
    pool divides per-query work without raising aggregate throughput,
    whereas independent pool replicas (each a full copy of the serving
    segments, like replica groups in any production search tier) scale
    QPS linearly until the machine's CPUs are the limit.  Memory cost is
    n_pools × the loaded segment state; the index files themselves are
    immutable and shared."""

    def __init__(self, index_dir: str, n_coordinators: int = 4,
                 pool_size: int = 4, resolver_pool_size: int = 2,
                 n_pools: int = 1):
        n_coordinators = max(1, n_coordinators)
        # a pool beyond the coordinator count would never receive a query
        # — clamp instead of silently paying its actors + segment memory
        n_pools = min(max(1, n_pools), n_coordinators)
        self.pools = [
            RangeShardedQueryEngine(
                index_dir, pool_size=pool_size,
                resolver_pool_size=resolver_pool_size,
            )
            for _ in range(n_pools)
        ]
        self.base = self.pools[0]
        self.coordinators = [
            SearchCoordinator.remote(
                index_dir, self.pools[i % len(self.pools)].handles())
            for i in range(n_coordinators)
        ]

    def submit(self, query: str, k: int = 10, client_id: int = 0,
               after: tuple[int, float] | None = None,
               min_should_match: int = 0):
        c = self.coordinators[client_id % len(self.coordinators)]
        return c.search.remote(query, k, after, min_should_match)

    def search(self, query: str, k: int = 10, client_id: int = 0,
               after: tuple[int, float] | None = None,
               min_should_match: int = 0
               ) -> list[tuple[int, float]]:
        return ray.get(self.submit(query, k, client_id, after=after,
                                   min_should_match=min_should_match))

    def shutdown(self):
        for c in self.coordinators:
            ray.kill(c)
        self.coordinators = []
        for p in self.pools:
            p.shutdown()
        self.pools = []
