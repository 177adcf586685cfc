"""Multi-field retrieval: one index per document FIELD (body text, page
``<title>``, …), ranked together as a field-weighted BM25 sum.

This is Lucene/Elasticsearch ``multi_match`` in ``most_fields`` mode — the
production idiom for web pages, where a title hit is worth more than a body
hit (``fields: ["title^2", "body"]``): each field keeps its OWN corpus
statistics (df, idf, avgdl — a term rare in titles but common in bodies is
selective exactly where it should be) and a document's score is

    score(d) = Σ_f  field_weight_f × BM25_f(query, d)

The reference has no field notion at all (its TF-IDF runs over one
concatenated token string per article,
``/root/reference/src/wikirec/model.py:52-76``); this surface exists because
the input is Common-Crawl-style pages whose ``<title>`` is a first-class
relevance signal.

Ray-Data-first shape
--------------------
Each field is an ORDINARY index built by the existing single-shuffle
``build_index`` over the same corpus Dataset (``text_col="title"`` /
``"text"``) — no new build path, no joint shuffle: the fields share the
dense doc-id space, so combining them is a vectorized sum of per-field
dense score arrays, never a join.  A title index is a small fraction of the
body build (titles are ~10 tokens), so the marginal cost of the second
field is the marginal cost of its tokens through the same combiner.  At
cluster scale the same composition holds shard-wise: per-field indexes
share the doc-RANGE partitioning (doc_id is the partitioner for norms /
export / meta already), so a range shard can sum its fields' local dense
arrays before the coordinator merge — the coordinator protocol is unchanged
because the sum happens below it.

Deletes compose by union: a doc tombstoned in ANY field's index is dead
(deleting a document from the corpus should never require remembering how
many field indexes exist).
"""

from __future__ import annotations

import math

import numpy as np

from wikirec_ray.pipelines.query import ROUND_DP, IndexReader, topk_from_dense


def _combine_fields(
    per: list[np.ndarray], mode: str, tie_breaker: float
) -> np.ndarray:
    """Combine weighted per-field dense score arrays — the ONE formula
    shared by the local reader and the served range shards (which apply
    it per range): ``most_fields`` sums; ``best_fields`` is Lucene's
    DisjunctionMax ``max + tie_breaker × (sum − max)``.

    IN-PLACE over ``per[0]`` (every caller passes freshly-allocated
    ``weight × score`` arrays): most_fields allocates nothing, best_fields
    exactly one max-tracking array — fresh full-corpus allocations are
    real money on this hot path (the ~1.5 s/65 MB first-touch lesson)."""
    out = per[0]
    if len(per) == 1:
        return out
    if mode == "most_fields":
        for s in per[1:]:
            out += s
        return out
    mx = per[0].copy()
    for s in per[1:]:
        np.maximum(mx, s, out=mx)
        out += s
    # out = max + tb × (sum − max), reusing the sum buffer
    out -= mx
    out *= tie_breaker
    out += mx
    return out


class MultiFieldReader:
    """Field-weighted BM25 over per-field ``IndexReader``s sharing one
    doc-id space.

    ``fields`` = [(index_dir_or_reader, field_weight)], best-signal field
    first; the FIRST entry is the primary field and owns the metadata
    sidecar used for ``attrs=`` filters and the doc-length reported by
    ``explain`` (fields share doc ids, so any sidecar would do — pinning
    one keeps filter semantics deterministic).  Field weights must be
    finite and > 0, like query boosts (a zero-weight field is a field the
    caller should drop).
    """

    def __init__(self, fields: list[tuple], mode: str = "most_fields",
                 tie_breaker: float = 0.0):
        if not fields:
            raise ValueError("MultiFieldReader needs at least one field")
        if mode not in ("most_fields", "best_fields"):
            raise ValueError(
                f"mode must be 'most_fields' or 'best_fields', got {mode!r}"
            )
        tie_breaker = float(tie_breaker)
        if not (0.0 <= tie_breaker <= 1.0) or not math.isfinite(tie_breaker):
            raise ValueError("tie_breaker must be in [0, 1]")
        # Lucene/ES ``best_fields`` (DisjunctionMaxQuery): score = the BEST
        # field's weighted BM25 + tie_breaker × the rest — the right mode
        # when a match concentrated in ONE field beats matches smeared
        # across fields ("to be or not to be" in the title).  tie_breaker
        # 0 = pure dis_max, 1 = identical to most_fields' sum.
        self.mode = mode
        self.tie_breaker = tie_breaker
        self.readers: list[IndexReader] = []
        self.field_weights: list[float] = []
        for src, w in fields:
            w = float(w)
            if not math.isfinite(w) or w <= 0.0:
                raise ValueError(
                    f"field weights must be finite and > 0, got {w!r}"
                )
            self.readers.append(
                src if isinstance(src, IndexReader) else IndexReader(src)
            )
            self.field_weights.append(w)
        n = {len(r.norms) for r in self.readers}
        if len(n) != 1:
            raise ValueError(
                f"field indexes disagree on the doc-id space (norms lengths "
                f"{sorted(n)}) — every field must be built over the same "
                f"corpus rows"
            )
        # union tombstones once: score_exact re-zeroes them after the sum
        # so a doc deleted in one field can't leak back in via another
        self._dead = np.unique(
            np.concatenate([r.tombstones for r in self.readers])
        ).astype(np.int64) if any(
            len(r.tombstones) for r in self.readers
        ) else np.empty(0, np.int64)

    @property
    def primary(self) -> IndexReader:
        return self.readers[0]

    def meta_cols(self) -> list[str]:
        return self.primary.meta_cols()

    def score_exact(
        self, terms: list[str], weights: list[float] | None = None
    ) -> np.ndarray:
        """Dense per-doc multi-field score: Σ_f field_weight × field BM25.

        ``weights`` = per-OCCURRENCE query boosts, applied inside every
        field (a boosted term is boosted wherever it matches) — the same
        contract as ``IndexReader.score_exact``.  Summation order is field
        order, matching ``explain``'s recomposition exactly.  In
        ``best_fields`` mode the combine is
        ``max_f + tie_breaker × (Σ_f − max_f)`` over the SAME weighted
        per-field arrays (the Lucene DisMax formula; an absent field
        scores 0, exactly like the sum treats it)."""
        per = [
            fw * rd.score_exact(terms, weights=weights)
            for fw, rd in zip(self.field_weights, self.readers)
        ]
        out = _combine_fields(per, self.mode, self.tie_breaker)
        if len(self._dead):
            out[self._dead] = 0.0
        return out

    def topk(
        self, terms: list[str], k: int,
        attrs: list[tuple[str, str]] | None = None,
        after: tuple[int, float] | None = None,
        weights: list[float] | None = None,
    ) -> list[tuple[int, float]]:
        """[(doc_id, score)] best-first, ties → doc_id ascending — the same
        ranking contract (``round(score, 9)`` desc, id asc), ``attrs``
        filters (primary field's sidecar), and ``search_after`` paging as
        every single-field route."""
        scores = self.score_exact(terms, weights=weights)
        if attrs:
            scores = self.primary._apply_attrs_dense(scores, attrs)
        return topk_from_dense(scores, k, after=after)

    def explain(
        self, terms: list[str], doc_id: int,
        weights: list[float] | None = None,
    ) -> dict:
        """Per-FIELD Lucene Explanation whose total recomposes ``topk``'s
        ranked score exactly: each field's sub-explanation is the plain
        ``IndexReader.explain`` (per-term df/idf/tf/contribution against
        THAT field's statistics) plus its ``field_weight`` and
        ``field_score`` (weight × unrounded field total, the addend the
        sum actually used)."""
        field_ex = []
        total = 0.0
        best = None
        for fw, rd in zip(self.field_weights, self.readers):
            ex = rd.explain(terms, doc_id, weights=weights)
            # recompose from the unrounded per-term contributions in the
            # same order score_exact summed them (ex["score"] is rounded
            # and zeroed on that field's tombstones — not the addend)
            ftotal = 0.0
            for t in ex["terms"]:
                ftotal += t["contribution"]
            ex["field_weight"] = fw
            ex["field_score"] = fw * ftotal
            field_ex.append(ex)
            total += fw * ftotal
            best = ex["field_score"] if best is None else max(
                best, ex["field_score"])
        if self.mode == "best_fields":
            # the DisMax recomposition, same arithmetic as score_exact
            total = best + self.tie_breaker * (total - best)
        deleted = any(ex["deleted"] for ex in field_ex)
        return {
            "doc_id": int(doc_id),
            "score": 0.0 if deleted else float(np.round(total, ROUND_DP)),
            "deleted": deleted,
            "mode": self.mode,
            "fields": field_ex,
        }
