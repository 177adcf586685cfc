"""Stored-fields store: the fetch phase of query-then-fetch retrieval.

The index answers "WHICH docs match" as (doc_id, score); a search RESULT
needs the documents themselves.  Production tiers split this into a query
phase (shards rank ids) and a fetch phase (k point lookups hydrate the
winners) — Elasticsearch's query_then_fetch — because shipping full
documents through the ranking path would move corpus bytes per query.

The export sink's layout (``pipelines/export.py``: one doc-id-sorted
``part-<range>.parquet`` per ``doc_id // range_size`` range, recorded in a
manifest) already IS a stored-fields store: it shares the index's doc-range
partitioning, so hydrating k hits touches at most k range files, each read
column-pruned.  ``DocStore`` wraps that layout with a bounded range cache.

Scale shape: fetch cost is O(hits × range-file read), independent of corpus
size; the cache holds whole ranges because at crawl scale hit locality is
range locality (a site's pages share id ranges).  Reference analog: the
reference keeps every article title/text in driver RAM and indexes into it
(``/root/reference/src/wikirec/model.py:294-383``) — this store reads only
the ranges the current top-k lives in.
"""

from __future__ import annotations

import os
import re
from collections import OrderedDict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from wikirec_ray.pipelines.export import EXPORT_MANIFEST_VERSION
from wikirec_ray.state.segments import load_manifest

_PART_RE = re.compile(r"^part-(\d+)\.parquet$")


class DocStore:
    """Point-lookup reader over an ``export_clean_corpus`` directory.

    ``fetch(doc_ids)`` returns ``{doc_id: {col: value}}`` for every id the
    store holds (ids deduplicated away or quality-filtered at export time
    are simply absent — the caller decides whether that is an error).
    Partitions come from the MANIFEST, never a directory glob (stale files
    from an older layout are never read — the ``read_exported`` contract).
    """

    def __init__(
        self,
        export_dir: str,
        text_col: str = "text",
        cache_ranges: int = 8,
    ):
        manifest = load_manifest(export_dir)
        if manifest is None:
            raise FileNotFoundError(
                f"DocStore: no manifest.json under {export_dir} — "
                "run export_clean_corpus first"
            )
        if manifest.get("version") != EXPORT_MANIFEST_VERSION:
            raise ValueError(
                f"DocStore: manifest version {manifest.get('version')!r} "
                f"!= supported {EXPORT_MANIFEST_VERSION}"
            )
        self.dir = export_dir
        self.text_col = text_col
        self.range_size = int(manifest["range_size"])
        self._paths: dict[int, str] = {}
        for key in manifest["partitions"]:
            m = _PART_RE.match(key)
            if m:
                self._paths[int(m.group(1))] = os.path.join(export_dir, key)
        # bounded LRU of loaded ranges — a worker serving many queries must
        # not accumulate the corpus (the unbounded-memo review lesson)
        self._cache: OrderedDict[tuple, tuple] = OrderedDict()
        self._cache_ranges = max(1, int(cache_ranges))

    def __len__(self) -> int:
        return len(self._paths)

    def _load_range(self, range_id: int, read_cols: tuple[str, ...]):
        """(sorted doc_id array, column table) for one range, LRU-cached
        per (range, columns) so alternating column sets can't thrash.
        ``read_cols`` must already include ``doc_id`` exactly once."""
        key = (range_id, read_cols)
        hit = self._cache.get(key)
        if hit is not None:
            self._cache.move_to_end(key)
            return hit
        path = self._paths.get(range_id)
        if path is None:
            return None
        tbl = pq.read_table(path, columns=list(read_cols))
        ids = tbl["doc_id"].to_numpy()
        val = (ids, tbl)
        self._cache[key] = val
        while len(self._cache) > self._cache_ranges:
            self._cache.popitem(last=False)
        return val

    def fetch(
        self, doc_ids, columns: list[str] | None = None
    ) -> dict[int, dict]:
        """Hydrate ``doc_ids`` (any iterable of ints) -> {doc_id: {col:
        value}}.  Reads only the touched ranges; within a range the
        doc-id-sorted rows make each lookup a ``searchsorted`` probe."""
        cols = tuple(columns) if columns is not None else (self.text_col,)
        # doc_id is always read for the probe; dedup it so a caller that
        # asks to hydrate the id alongside other fields doesn't produce a
        # duplicate-column parquet read
        read_cols = ("doc_id", *(c for c in cols if c != "doc_id"))
        id_list = [int(d) for d in doc_ids]
        out: dict[int, dict] = {}
        if not id_list:
            return out
        ids = np.unique(np.asarray(id_list, np.int64))
        for rid in np.unique(ids // self.range_size).tolist():
            loaded = self._load_range(int(rid), read_cols)
            if loaded is None:
                continue
            stored, tbl = loaded
            want = ids[ids // self.range_size == rid]
            pos = np.searchsorted(stored, want)
            ok = pos < len(stored)
            ok[ok] &= stored[pos[ok]] == want[ok]
            for d, p in zip(want[ok].tolist(), pos[ok].tolist()):
                out[d] = {c: tbl[c][p].as_py() for c in cols}
        return out


def hydrate_hits(
    store: DocStore,
    hits: list[tuple[int, float]],
    highlight: list[str],
    phrase: list[str] | None = None,
    snippet_window: int = 5,
) -> list[dict]:
    """The fetch phase: hydrate already-ranked ``hits`` from ``store`` and
    attach a KWIC snippet showing WHY each doc matched — the user-facing
    search-result row.  ``highlight``/``phrase`` are the resolved positive
    terms from ``pipelines.query.search_with_terms`` (phrase queries
    highlight the first phrase occurrence via the ``phrase_snippets``
    shifted-equality kernel; otherwise the first occurrence of any
    highlight term).  A hit absent from the store (deduplicated or
    quality-filtered at export) keeps its rank with ``snippet=None`` —
    retrieval ran over the index's corpus, not the export's.

    Returns ``[{"rank", "doc_id", "score", "snippet"}]`` in rank order.
    """
    from wikirec_ray.pipelines.snippets import (
        keyword_snippets_batch,
        phrase_snippets_batch,
    )

    # user-facing knob: a negative window must not crash deep in the
    # kernel (the parse_query don't-crash-on-user-input convention)
    snippet_window = max(0, int(snippet_window))
    if not hits:
        return []
    docs = store.fetch([d for d, _ in hits])

    found = [d for d, _ in hits if d in docs]
    snippet_by_doc: dict[int, str] = {}
    if found:
        batch = pa.table({
            "doc_id": pa.array(found, pa.int64()),
            store.text_col: pa.array(
                [docs[d][store.text_col] for d in found], pa.string()
            ),
        })
        snips = (
            phrase_snippets_batch(
                batch, phrase, snippet_window, "doc_id", store.text_col
            )
            if phrase
            else keyword_snippets_batch(
                batch, highlight, snippet_window, "doc_id", store.text_col
            )
        )
        # first occurrence per doc: kernel rows are emitted in flat token
        # order, so the first row seen for a doc is its earliest hit
        for d, s in zip(
            snips["doc_id"].to_pylist(), snips["snippet"].to_pylist()
        ):
            snippet_by_doc.setdefault(d, s)

    return [
        {
            "rank": rank,
            "doc_id": doc,
            "score": score,
            "snippet": snippet_by_doc.get(doc),
        }
        for rank, (doc, score) in enumerate(hits, 1)
    ]


def search_results(
    engine,
    store: DocStore,
    query: str,
    k: int = 10,
    snippet_window: int = 5,
    after: tuple[int, float] | None = None,
) -> list[dict]:
    """Query-then-fetch in one call: route ``query`` through
    ``pipelines.query.search_with_terms`` on ``engine`` (an ``IndexReader``
    or the range-sharded coordinator) — parse and lexicon expansion run
    ONCE, shared between retrieval and highlighting — then hydrate the
    top-k via ``hydrate_hits``.  ``after`` = search_after cursor (the
    previous page's last ``(doc_id, score)`` hit): pages fetch only THEIR
    k documents — deep paging never re-hydrates earlier pages."""
    from wikirec_ray.pipelines.query import search_with_terms

    hits, highlight, phrase = search_with_terms(engine, query, k,
                                                after=after)
    return hydrate_hits(store, hits, highlight, phrase, snippet_window)
